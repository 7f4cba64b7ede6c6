package graft.analytics

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The gaps-and-islands sessionization must equal Spark's
  * session_window on ARBITRARY timestamps — including gaps exactly at
  * the 30-minute boundary, which real event data rarely hits. Probed
  * empirically: session_window MERGES an event at exactly prev+gap
  * (the window end extends per event), so a new session starts only
  * at gap STRICTLY > 30 min. This property caught the opposite
  * convention in an earlier oracle.
  */
object BehavioralProperties extends Properties("analytics.sessionize") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each sample runs Spark jobs

  private val GapMin = 30L
  // minute-granularity offsets make exact-boundary gaps (30 min) common
  private val genRow = for {
    u <- Gen.chooseNum(0L, 3L)
    minute <- Gen.chooseNum(0L, 300L)
  } yield (u, minute)

  property("gaps-and-islands == session_window, boundary gaps included") =
    forAll(Gen.nonEmptyListOf(genRow).map(_.take(60).distinct)) { rows =>
      val df = rows.toDF("u", "m")
        .select(col("u"), timestamp_seconds(col("m") * 60).as("ts"))

      val sw = df.groupBy(session_window(col("ts"), s"$GapMin minutes"), col("u"))
        .agg(count(lit(1)).as("n"))
        .select(col("u"), col("session_window.start").as("start"), col("n"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet

      // the PRODUCTION sessionizer (same column tree as q_sessionize),
      // so a convention regression there fails this property
      val gi = Behavioral.sessionize(df, "u", "ts", Nil, GapMin * 60000000L)
        .select(col("u"), col("start_ts"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet

      gi == sw
    }
}
