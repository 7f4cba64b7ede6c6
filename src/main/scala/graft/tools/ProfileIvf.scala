package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary profiler: IVF fine-bucket size distribution per SF — sizes
// the saturation cap.
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.CosineSim.register(spark)
    import graft.ops.Similarity
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val n = graft.Tables(spark, dir, "embeddings").count()
      val m = math.max(4, math.ceil(math.sqrt(n.toDouble)).toLong)
      val (c, fb) = Similarity.ivfQuantizer(spark, dir)
      val probed = Similarity.ivfAssign(Similarity.embeddings(spark, dir), c, fb)
      val sizes = probed.groupBy("anchor_id").agg(count(lit(1)).as("c"))
      val st = sizes.agg(min("c"), max("c"), avg("c"),
        expr("percentile(c, 0.99)")).head()
      println(s"IVFPROF dir=$dir n=$n m=$m expected=${2.0 * n / m} " +
        s"min=${st.getLong(0)} max=${st.getLong(1)} avg=${st.getDouble(2)} p99=${st.get(3)}")
    }
    spark.stop()
  }
}
