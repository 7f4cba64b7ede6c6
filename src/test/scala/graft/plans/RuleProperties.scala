package graft.plans

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** RewriteTop1PerGroup equivalence under random data: for arbitrary
  * (group, key1, key2, payload) tables — duplicates, null-able asc
  * keys, single-row groups — the rewritten aggregate returns exactly
  * the window idiom's rows. Tie-breaks are made unique (row_number and
  * min_by are both free to pick among true ties), which is the same
  * determinism contract any production top-1 query needs.
  */
object RuleProperties extends Properties("plans.rewriteTop1") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each sample runs Spark jobs

  private val genRow = for {
    g <- Gen.chooseNum(0, 5)
    k1 <- Gen.option(Gen.chooseNum(-3, 3))
    payload <- Gen.alphaStr.map(_.take(4))
  } yield (g, k1, payload)
  // uid appended per-row makes the full ordering unique
  private val genRows = Gen.nonEmptyListOf(genRow).map(_.take(40).zipWithIndex
    .map { case ((g, k1, p), uid) => (g, k1.map(Integer.valueOf).orNull, p, uid) })

  property("rewrite == window execution on random tables") =
    forAll(genRows) { rows =>
      val df = rows.toDF("g", "k1", "p", "uid")
      val w = Window.partitionBy(col("g")).orderBy(col("k1"), col("uid"))
      def run() = df.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("g"), col("k1"), col("p"), col("uid"))
        .collect().map(r => r.toSeq.toList).sortBy(_.toString)
      val rewritten = run()
      spark.conf.set("spark.graft.rewriteTop1PerGroup", "false")
      val expected = try run()
      finally spark.conf.set("spark.graft.rewriteTop1PerGroup", "true")
      rewritten.sameElements(expected)
    }
}
