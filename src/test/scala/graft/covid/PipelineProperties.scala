package graft.covid

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SURVEY.md §5.3 ScalaCheck properties:
  *  (a) resume-equivalence — interrupt-at-any-batch + resume equals an
  *      uncapped run;
  *  (b) transform totals invariant under partitioning;
  *  (c) idempotent re-run via dedup (at-least-once → effectively-once).
  */
object PipelineProperties extends Properties("covid.pipeline") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each sample runs Spark jobs

  private val genDate = Gen.chooseNum(1, 12).map(d => f"2022-03-$d%02d")
  private val genState = Gen.oneOf("arkansas", " TEXAS ", "o'hio")
  private val genCount = Gen.frequency(
    8 -> Gen.chooseNum(0, 99).map(_.toString),
    1 -> Gen.const(null.asInstanceOf[String]), // missing -> 0
    1 -> Gen.oneOf("", "abc"))                 // unparseable -> drop
  private val genRow = for {
    d <- genDate; s <- genState; c <- Gen.oneOf("bradley", "kent")
    n1 <- genCount; n2 <- genCount
  } yield (d, s, c, n1, n2)
  private val genRows = Gen.listOfN(60, genRow)

  private def asRaw(rows: List[(String, String, String, String, String)]) =
    rows.toDF("REPORT_DATE", "PROVINCE_STATE_NAME", "COUNTY_NAME",
      "PEOPLE_POSITIVE_NEW_CASES_COUNT", "PEOPLE_DEATH_NEW_COUNT")

  property("(b) transform totals invariant under partitioning") =
    forAll(genRows) { rows =>
      val df = asRaw(rows)
      val totals = Seq(1, 3, 7).map { k =>
        Transform(df.repartition(k))
          .agg(count(lit(1)), sum("new_cases"), sum("new_deaths"))
          .head().toSeq
      }
      totals.distinct.size == 1
    }

  property("(a) resume equivalence for any batch cap") =
    forAll(genRows, Gen.chooseNum(5, 25)) { (rows, cap) =>
      val base = java.nio.file.Files.createTempDirectory("prop").toString
      asRaw(rows).select(CovidSchema.csvSchema.fieldNames.map(n =>
        if (asRaw(rows).columns.contains(n)) col(n) else lit("x").as(n)): _*)
        .write.parquet(s"$base/staging")
      CovidPipeline.runToCompletion(spark, s"$base/staging", s"$base/whA", s"$base/stA",
        limit = Some(cap))
      CovidPipeline.runToCompletion(spark, s"$base/staging", s"$base/whB", s"$base/stB",
        limit = None)
      def snap(wh: String) =
        try spark.read.parquet(wh).groupBy("state")
          .agg(count(lit(1)), sum("new_cases")).orderBy("state").collect().toSeq
        catch { case _: Exception => Seq.empty } // no rows survived -> no dir
      snap(s"$base/whA") == snap(s"$base/whB")
    }

  property("(c) duplicate batch append + dedup == single batch") =
    forAll(genRows) { rows =>
      val once = Transform(asRaw(rows))
      val twice = once.unionByName(once) // at-least-once replay
      twice.dropDuplicates("date", "state", "county", "new_cases", "new_deaths")
        .count() == once.distinct().count()
    }
}
