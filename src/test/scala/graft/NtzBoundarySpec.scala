package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.TimestampType

/** Round-3 regression guard: the driver's regenerated events parquet
  * stored `ts` as TIMESTAMP(MICROS, isAdjustedToUTC=false), Spark 4
  * inferred TIMESTAMP_NTZ, and eight temporal/streaming operators
  * crashed out of the correctness inventory. The fix is normalization
  * at the [[Tables]] read seam; this spec pins that the normalization
  * holds under BOTH values of the NTZ inference flag, so correctness
  * never again depends on which session conf a runner happened to pick.
  */
class NtzBoundarySpec extends AnyFunSuite with SparkSpec {

  private val Flag = "spark.sql.parquet.inferTimestampNTZ.enabled"
  private val Dir = "/root/testdata/sf0.001"

  private def underFlag[T](v: Boolean)(body: => T): T = {
    val prev = spark.conf.get(Flag)
    spark.conf.set(Flag, v.toString)
    try body finally spark.conf.set(Flag, prev)
  }

  for (ntz <- Seq(true, false)) {
    test(s"events.ts normalizes to TIMESTAMP with inferTimestampNTZ=$ntz") {
      underFlag(ntz) {
        assert(Tables(spark, Dir, "events").schema("ts").dataType == TimestampType)
        // orders/lineitem carry the same unadjusted-micros parquet type
        // — the generic normalization must cover them too
        assert(Tables(spark, Dir, "orders")
          .schema("o_orderdate").dataType == TimestampType)
        assert(Tables(spark, Dir, "lineitem")
          .schema("l_shipdate").dataType == TimestampType)
      }
    }

    test(s"unix_micros-based temporal ops run with inferTimestampNTZ=$ntz") {
      underFlag(ntz) {
        // q_range_join + q_sessionize cover the two round-3 failure
        // shapes: unix_micros analysis error and window-over-timestamp.
        assert(SparkEntry.queries("q_range_join")(spark, Dir).count() > 0)
        assert(SparkEntry.queries("q_sessionize")(spark, Dir).count() > 0)
      }
    }
  }

  test("watermarked streaming runs with inferTimestampNTZ=true (worst case)") {
    underFlag(true) {
      // round 3's EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE shape: a
      // watermark + window agg over the normalized stream.
      val out = graft.streaming.Streams
        .tumblingToTable(spark, Dir, "ntz_probe_sink")
      assert(out.count() > 0)
    }
  }
}
