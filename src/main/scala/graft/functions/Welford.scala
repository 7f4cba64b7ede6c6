package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class WelfordBuf(n: Long, mean: Double, m2: Double)
case class MeanVar(mean: Double, var_samp: Double)

/** Numerically-stable mean/variance via Welford's online algorithm
  * with Chan's parallel merge — the typed `Aggregator[IN,BUF,OUT]`
  * showcase (SURVEY.md §2.9c). Naive sum-of-squares cancels
  * catastrophically when mean² ≫ variance; Welford keeps the running
  * second moment centered, and the merge step makes it partition-
  * parallel (map-side partial aggregation works as usual).
  */
object WelfordVar extends Aggregator[Double, WelfordBuf, MeanVar] {
  def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

  def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    WelfordBuf(n, mean, b.m2 + d * (x - mean))
  }

  def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      WelfordBuf(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n)
    }
  }

  def finish(b: WelfordBuf): MeanVar =
    MeanVar(if (b.n == 0) Double.NaN else b.mean,
      if (b.n < 2) Double.NaN else b.m2 / (b.n - 1))

  def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  def outputEncoder: Encoder[MeanVar] = Encoders.product[MeanVar]
}
