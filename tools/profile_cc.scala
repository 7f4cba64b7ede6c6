import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup

val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
}
time("warmup")(Tables(spark, dir, "orders").count())
val docs = Tables(spark, dir, "documents")
val pairs = time("jaccardPairs")(Dedup.jaccardPairs(docs, 0.6).cache())
println("pairs = " + pairs.count())
val edges = pairs.select(col("doc1").as("a"), col("doc2").as("b"))
  .unionByName(pairs.select(col("doc2").as("a"), col("doc1").as("b"))).cache()
var labels = edges.select(col("a").as("v")).distinct()
  .select(col("v"), col("v").as("label"))
println("verts = " + time("verts")(labels.count()))
var changed = 1L
var round = 0
while (changed > 0) {
  round += 1
  val neighborMin = edges.join(labels, col("b") === col("v"))
    .groupBy(col("a")).agg(min(col("label")).as("nmin"))
  val updated = labels.join(neighborMin, col("v") === col("a"), "left")
    .select(col("v"), col("label"),
      least(col("label"), coalesce(col("nmin"), col("label"))).as("newlabel"))
    .cache()
  changed = time(s"round $round")(updated.filter(col("newlabel") < col("label")).count())
  println(s"  changed=$changed")
  labels = updated.select(col("v"), col("newlabel").as("label"))
}
val out = docs.select(col("doc_id"))
  .join(labels.select(col("v").as("doc_id"), col("label")), Seq("doc_id"), "left")
  .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("component"))
time("final join")(out.write.format("noop").mode("overwrite").save())
System.exit(0)
