import graft.ops.Dedup
import graft.SparkEntry
val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
}
time("warmup")(SparkEntry.queries("q_count_total")(spark, dir).write.format("noop").mode("overwrite").save())
spark.catalog.clearCache()
time("cc full query")(Dedup.queries("q_dedup_components")(spark, dir).write.format("noop").mode("overwrite").save())
spark.catalog.clearCache()
time("cc again")(Dedup.queries("q_dedup_components")(spark, dir).write.format("noop").mode("overwrite").save())
System.exit(0)
