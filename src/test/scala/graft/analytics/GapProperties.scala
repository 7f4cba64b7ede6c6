package graft.analytics

import java.nio.file.Files
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q_sequence_gaps vs a local reference model on ARBITRARY sparse
  * keysets — the bucket-boundary stitch (gap spanning one or many
  * empty buckets, single-key buckets, gaps ending exactly on a bucket
  * edge) is where a two-level islands implementation breaks, and
  * random keysets hit those cases far more often than the fixed
  * testdata. Keys are drawn around the 4000-wide bucket edges on
  * purpose.
  */
object GapProperties extends Properties("analytics.sequencegaps") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each sample runs Spark jobs

  // cluster keys near bucket boundaries (B = 4000 in the query) and
  // sprinkle the rest uniformly; 7/11-knockout survivors only, since
  // the query applies that filter to synthesize sparsity
  private val genKeys: Gen[Seq[Long]] = for {
    nearEdges <- Gen.listOf(for {
      edge <- Gen.oneOf(4000L, 8000L, 12000L)
      off <- Gen.chooseNum(-3L, 3L)
    } yield edge + off)
    uniform <- Gen.listOf(Gen.chooseNum(1L, 16000L))
  } yield (nearEdges ++ uniform).distinct.filter(k =>
    k >= 1 && k % 7 != 0 && k % 11 != 0)

  private def write(keys: Seq[Long]): String = {
    val dir = Files.createTempDirectory("gapprop").toString
    keys.toDF("o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  property("bucketed stitch == global islands on arbitrary keysets") =
    forAll(genKeys.suchThat(_.size >= 2)) { keys =>
      val dir = write(keys)
      val got = Relational.queries("q_sequence_gaps")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val sorted = keys.sorted
      val expected = sorted.zip(sorted.tail).collect {
        case (a, b) if b > a + 1 => (a + 1, b - 1, b - a - 1)
      }
      got == expected
    }
}
