// Fresh-session timing of the bench outliers.
import org.apache.spark.sql.functions._
import graft.SparkEntry

val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
}
// warm up parquet + codegen paths
time("warmup")(SparkEntry.queries("q_count_total")(spark, dir).write.format("noop").mode("overwrite").save())
for (q <- Seq("q_dedup_minhash", "q_dedup_components", "q_topk_other", "q_fingerprint", "q_token_count", "q_ngram_jaccard", "q_topk", "q_typed_agg")) {
  time(q)(SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save())
}
System.exit(0)
