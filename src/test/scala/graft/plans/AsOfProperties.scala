package graft.plans

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BroadcastAsOfJoinExec equivalence under random data: for arbitrary
  * probe/build tables — duplicate keys, duplicate times, keys missing
  * from either side, null keys and times — the native operator returns
  * exactly the composed join+window form's rows.
  */
object AsOfProperties extends Properties("plans.asofNative") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each sample runs Spark jobs

  private val genLeft = for {
    k <- Gen.option(Gen.chooseNum(0L, 6L))
    t <- Gen.option(Gen.chooseNum(0L, 100L))
  } yield (k, t)
  private val genRight = for {
    k <- Gen.option(Gen.chooseNum(0L, 8L)) // superset: some keys unmatched
    t <- Gen.option(Gen.chooseNum(-10L, 110L))
    p <- Gen.chooseNum(0L, 999L)
  } yield (k, t, p)

  private def jl(x: Option[Long]) = x.map(java.lang.Long.valueOf).orNull

  property("native == composed window form on random tables") =
    forAll(Gen.listOf(genLeft).map(_.take(30)),
           Gen.listOf(genRight).map(_.take(30))) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), id) => (id.toLong, jl(k), jl(t)) }
        .toDF("id", "k", "t")
      val right = rs.map { case (k, t, p) => (jl(k), jl(t), p) }
        .toDF("rk", "rt", "payload")

      val native = AsOfJoin.broadcastAsOf(left, right,
          Seq("k"), Seq("rk"), "t", "rt", Seq("payload"))
        .select(col("id"), col("rt"), col("payload"))
        .collect().map(_.toSeq.toList).sortBy(_.toString).toList

      val w = Window.partitionBy(col("id"))
        .orderBy(col("rt").desc, col("payload").desc)
      val composed = left.join(right,
          col("k") === col("rk") && col("rt") <= col("t"), "left")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("id"), col("rt"), col("payload"))
        .collect().map(_.toSeq.toList).sortBy(_.toString).toList

      native == composed
    }
}
