package graft.ops

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** Invariants of the co-occurrence df-cap derivation, checked against
  * a local replay of the cumulative-Σdf² rule on arbitrary degree
  * multisets (Zipf-ish generator: a heavy head plus a flat tail) —
  * the properties that make a data-derived cap safe to trust:
  * budget-respecting, floor-bounded, and monotone in the budget.
  */
object BasketsProperties extends Properties("ops.baskets") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each sample runs Spark jobs


  /** Local replay of cooccurCapPlan's rule over raw degrees. */
  private def referenceCap(degrees: Seq[Long], budget: Long, floor: Long): Long = {
    val byVal = degrees.groupBy(identity).view
      .mapValues(ds => ds.map(d => d * d).sum).toSeq.sortBy(_._1)
    val cum = byVal.scanLeft(0L) { case (acc, (_, w)) => acc + w }.tail
    val derived = byVal.zip(cum).filter(_._2 <= budget).map(_._1._1)
      .lastOption.getOrElse(floor)
    math.max(derived, floor)
  }

  private val genDegrees: Gen[Seq[Long]] = for {
    tail <- Gen.listOfN(40, Gen.chooseNum(1L, 50L))
    headN <- Gen.chooseNum(0, 3)
    head <- Gen.listOfN(headN, Gen.chooseNum(1000L, 20000L))
  } yield tail ++ head

  private val genBudget: Gen[Long] = Gen.chooseNum(1000L, 10000000L)

  property("cap == local replay of the cumulative rule") =
    forAll(genDegrees, genBudget) { (degs, budget) =>
      val deg = degs.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("pk", "n")
      val cap = Baskets.cooccurDfCap(deg)
      cap == referenceCap(degs, Baskets.PairBudget, Baskets.DfCapFloor)
    }

  property("kept items' Σdf² fits the budget unless the floor binds") =
    forAll(genDegrees) { degs =>
      val deg = degs.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("pk", "n")
      val cap = Baskets.cooccurDfCap(deg)
      val keptWork = degs.filter(_ <= cap).map(d => d * d).sum
      keptWork <= Baskets.PairBudget || cap == Baskets.DfCapFloor
    }

  property("raising the budget never lowers the cap (local rule)") =
    forAll(genDegrees, genBudget, genBudget) { (degs, b1, b2) =>
      val (lo, hi) = (math.min(b1, b2), math.max(b1, b2))
      referenceCap(degs, lo, Baskets.DfCapFloor) <=
        referenceCap(degs, hi, Baskets.DfCapFloor)
    }
}
