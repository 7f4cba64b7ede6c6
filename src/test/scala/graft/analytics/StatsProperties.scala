package graft.analytics

import java.nio.file.Files
import scala.math.BigDecimal.RoundingMode
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** The rank-statistics queries vs local reference models on ARBITRARY
  * data — the bucket-stitched rank assembly (values clustered at the
  * $10k bucket edges, ties straddling a bucket boundary, single-value
  * buckets, a group entirely inside one bucket) is exactly what random
  * cent values exercise and the fixed testdata barely does. Every
  * model replays the query's declared arithmetic (integer/decimal
  * sums, one double division at the end), so equality is exact, not
  * approximate.
  */
object StatsProperties extends Properties("analytics.stats") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each sample runs Spark jobs

  private val BucketCents = 1000000L // must match Stats.GiniBucketCents

  // integer cents clustered around bucket edges + uniform filler;
  // ≥ 1 so gini denominators stay nonzero
  private val genCents: Gen[Long] = Gen.frequency(
    3 -> (for {
      edge <- Gen.oneOf(BucketCents, 2 * BucketCents)
      off <- Gen.chooseNum(-3L, 3L)
    } yield (edge + off).max(1L)),
    5 -> Gen.chooseNum(1L, 3 * BucketCents),
    2 -> Gen.chooseNum(1L, 50L)) // heavy ties in a tiny range

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, RoundingMode.HALF_UP).toDouble

  private def writeOrders(rows: Seq[(String, Long)]): String = {
    val dir = Files.createTempDirectory("statprop").toString
    rows.map { case (p, c) => (p, c / 100.0) }
      .toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  property("gini: bucket-stitched ranks == single-sort formula") = {
    val gen = Gen.nonEmptyListOf(for {
      p <- Gen.oneOf("A", "B", "C")
      c <- genCents
    } yield (p, c))
    forAll(gen) { rows =>
      val dir = writeOrders(rows)
      val got = Stats.queries("q_gini")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, g) =>
        val xs = g.map(_._2).sorted
        val n = xs.size.toLong
        val num = xs.zipWithIndex.map { case (x, i0) =>
          (2L * (i0 + 1) - n - 1) * x
        }.sum
        (p, n, round6(num.toDouble / (n.toDouble * xs.sum.toDouble)))
      }
      got == expected
    }
  }

  property("mann-whitney: stitched midranks == brute-force rank sums") = {
    val gen = Gen.nonEmptyListOf(for {
      p <- Gen.oneOf("1-URGENT", "2-HIGH", "3-MEDIUM") // query keeps first two
      c <- genCents
    } yield (p, c))
    forAll(gen.suchThat(_.exists(_._1 != "3-MEDIUM"))) { rows =>
      val dir = writeOrders(rows)
      val got = Stats.queries("q_mannwhitney")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq
      val kept = rows.filter(r => r._1 == "1-URGENT" || r._1 == "2-HIGH")
      val all = kept.map(_._2)
      val expected = kept.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, g) =>
        val doubled = g.map(_._2).map { x =>
          val off = all.count(_ < x).toLong
          val c = all.count(_ == x).toLong
          2L * off + c + 1L
        }.sum
        val n = g.size.toLong
        val rankSum = doubled.toDouble / 2.0
        (p, n, rankSum, rankSum - n.toDouble * (n.toDouble + 1.0) / 2.0)
      }
      got == expected
    }
  }

  property("weighted median: stitched cumweights == single-sort scan") = {
    val gen = Gen.nonEmptyListOf(for {
      f <- Gen.oneOf("A", "R")
      c <- genCents
      w <- Gen.chooseNum(1L, 40L)
    } yield (f, c, w))
    forAll(gen) { rows =>
      val dir = Files.createTempDirectory("statprop").toString
      rows.map { case (f, c, w) => (f, c / 100.0, w.toDouble) }
        .toDF("l_returnflag", "l_extendedprice", "l_quantity")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val got = Stats.queries("q_weighted_median")(spark, dir)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, g) =>
        val tot = g.map(_._3).sum
        val byVal = g.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (x, rs) => (x, rs.map(_._3).sum) }
        var cum = 0L
        val mx = byVal.collectFirst {
          case (x, vw) if { cum += vw; 2 * cum >= tot } => x
        }.get
        (f, mx.toDouble / 100.0, tot)
      }
      got == expected
    }
  }
}
