package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** ANN operating-point frontier sweep — the measured backing for
  * GraphDegree=4 / 1-hop being a CHOSEN point rather than an
  * accident: for each (degree, hops) the graph-expanded search runs
  * on the full harness (same shared IVF candidates, same bounded
  * heaps), and the row records recall@1 against the brute-force
  * truth, the pre-rerank candidate volume, and the wall. The IVF-only
  * baseline (q_sim_ann's candidates) prints first for reference.
  * Results recorded in BENCH_SCALING.md ("Round-10 ANN frontier").
  *
  * The shared_ivf_cand materialization is paid once (Scratch) — the
  * FIRST row's wall includes it; a `shared` row pins that cost
  * separately so per-config walls are comparable.
  */
object AnnFrontier {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // pay the shared IVF candidate materialization once, pinned
    val (_, sharedSec) = timed {
      Similarity.queries("q_sim_ann")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"""{"config":"shared+ivf_warm","sec":$sharedSec%.3f}""")

    val ivfRecall = Similarity.queries("q_ann_recall")(spark, sfDir)
      .collect().head.getDouble(2)
    println(s"""{"config":"ivf_baseline","recall_at_1":$ivfRecall}""")

    // pre = 0 is the exact-everything form; pre = R is the round-11
    // PATH-SCORE pre-rank (top-R per query by max parent-path cosine
    // sum before the exact re-rank; the PQ/SDC forms were measured
    // out — BENCH_SCALING "Round-11 pre-rank sweep") — swept so
    // GraphPreRankR is a CHOSEN point
    for ((degree, hops, pre) <- Seq((4, 1, 0), (8, 1, 0), (4, 2, 0),
        (8, 2, 0), (8, 2, 64), (8, 2, 32), (8, 2, 16))) {
      val (_, searchSec) = timed {
        Similarity.annGraphSearch(spark, sfDir, degree, hops, pre)
          .write.format("noop").mode("overwrite").save()
      }
      val nCand = Similarity
        .annGraphCandidates(spark, sfDir, degree, hops, pre).count()
      val recall = Similarity
        .annRecallOf(spark, sfDir,
          Similarity.annGraphSearch(spark, sfDir, degree, hops, pre))
        .collect().head.getDouble(2)
      println(f"""{"config":"G=$degree,hops=$hops,pre=$pre","recall_at_1":$recall,"n_cand":$nCand,"search_sec":$searchSec%.3f}""")
    }
    spark.stop()
  }
}
