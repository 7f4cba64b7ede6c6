package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class WelfordSpec extends AnyFunSuite {

  private def run(xs: Seq[Double]): MeanVar =
    WelfordVar.finish(xs.foldLeft(WelfordVar.zero)(WelfordVar.reduce))

  test("matches closed-form mean/variance") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val out = run(xs)
    assert(math.abs(out.mean - 5.0) < 1e-12)
    assert(math.abs(out.var_samp - 32.0 / 7) < 1e-12)
  }

  test("merge is equivalent to a single pass, any split point") {
    val xs = (1 to 100).map(i => math.sin(i) * 1000)
    val whole = run(xs)
    for (split <- Seq(1, 13, 50, 99)) {
      val (l, r) = xs.splitAt(split)
      val merged = WelfordVar.finish(WelfordVar.merge(
        l.foldLeft(WelfordVar.zero)(WelfordVar.reduce),
        r.foldLeft(WelfordVar.zero)(WelfordVar.reduce)))
      assert(math.abs(merged.mean - whole.mean) < 1e-9)
      assert(math.abs(merged.var_samp - whole.var_samp) < 1e-6)
    }
  }

  test("numerically stable where naive sum-of-squares collapses") {
    // variance 1 around a huge mean: naive E[x^2]-E[x]^2 in double
    // loses all significant digits (1e18 ulp ~ 256)
    val xs = Seq(1e9, 1e9 + 1, 1e9 + 2)
    val out = run(xs)
    assert(math.abs(out.var_samp - 1.0) < 1e-9)
    val naive = {
      val n = xs.size
      val s = xs.sum; val s2 = xs.map(x => x * x).sum
      (s2 - s * s / n) / (n - 1)
    }
    assert(math.abs(naive - 1.0) > 1e-3) // the instability Welford avoids
  }

  test("empty and single-element buffers") {
    assert(run(Nil).mean.isNaN)
    assert(run(Seq(42.0)).var_samp.isNaN)
    assert(run(Seq(42.0)).mean == 42.0)
  }
}
