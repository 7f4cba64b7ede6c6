// Profiling scratch for q_dedup_minhash - run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/classes -i tools/profile_minhash.scala
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TextFns._
import graft.ops.Dedup

val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
}

val docs = Tables(spark, dir, "documents")
time("warmup count")(docs.count())

val sh = time("shingles explode+h60") {
  docs.select(col("doc_id"), explode(array_distinct(shingles(tokens(col("text")), 3))).as("s"))
    .select(col("doc_id"), (h60(col("s")) % lit(P)).as("hm"))
    .write.format("noop").mode("overwrite").save()
}

val hm = docs.select(col("doc_id"), explode(array_distinct(shingles(tokens(col("text")), 3))).as("s"))
  .select(col("doc_id"), (h60(col("s")) % lit(P)).as("hm"))
val K = Dedup.K
val mhAggs = (0 until K).map(i => min((lit(aCoef(i)) * col("hm") + lit(bCoef(i))) % lit(P)).as(s"mh_$i"))
val vec = hm.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)
  .select(col("doc_id"), array((0 until K).map(i => col(s"mh_$i")): _*).as("v"))

time("signature table")(vec.write.format("noop").mode("overwrite").save())
time("signature table again")(vec.write.format("noop").mode("overwrite").save())

val vecC = vec.cache()
time("cache populate")(vecC.count())

val Bands = Dedup.Bands
val bandStructs = (0 until Bands).map(b =>
  struct(lit(b).as("band"),
    concat_ws(",", (0 until K / Bands).map(r => element_at(col("v"), b * (K / Bands) + r + 1)): _*).as("sig")))
val bands = vecC.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
  .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
val cand = bands.select(col("band"), col("sig"), col("doc_id").as("doc1"))
  .join(bands.select(col("band"), col("sig"), col("doc_id").as("doc2")), Seq("band", "sig"))
  .where(col("doc1") < col("doc2"))
  .select("doc1", "doc2").distinct()
time("candidates")(println("cand rows = " + cand.count()))

val est = cand
  .join(vecC.select(col("doc_id").as("doc1"), col("v").as("v1")), Seq("doc1"))
  .join(vecC.select(col("doc_id").as("doc2"), col("v").as("v2")), Seq("doc2"))
  .select(col("doc1"), col("doc2"),
    (aggregate(zip_with(col("v1"), col("v2"), (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x) / lit(K.toDouble)).as("est_sim"))
  .orderBy(col("doc1"), col("doc2"))
time("estimate join")(est.write.format("noop").mode("overwrite").save())

time("full query fresh") {
  Dedup.queries("q_dedup_minhash")(spark, dir).write.format("noop").mode("overwrite").save()
}
System.exit(0)
