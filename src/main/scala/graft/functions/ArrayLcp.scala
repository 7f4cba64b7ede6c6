package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen LCP (longest common prefix, in elements) of two
  * `array<string>` token arrays starting at the given 0-based offsets:
  * counts leading pairwise-equal tokens and STOPS at the first
  * mismatch or at either array's end (past-one-end is a mismatch, so
  * the count at exhaustion is the true LCP — the suffix-array
  * convention [[graft.ops.SpanExact]] needs).
  *
  * The composed form — `aggregate(zip_with(slice(a1,..), slice(a2,..),
  * ..), struct(n, ok), ..)` — allocates two slice copies plus a flag
  * array and folds a struct per element with NO early exit, so every
  * adjacent-group compare costs the full horizon even when the
  * suffixes differ at token one (they usually do: most adjacent rank
  * groups share a short prefix). This expression is a single fused
  * early-exit loop inside whole-stage codegen; interpreted eval
  * matches it token for token.
  */
case class ArrayLcpFrom(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "array_lcp_from"

  override def nullSafeEval(a1: Any, p1: Any, a2: Any, p2: Any): Any = {
    val x = a1.asInstanceOf[ArrayData]
    val y = a2.asInstanceOf[ArrayData]
    val o1 = p1.asInstanceOf[Long].toInt
    val o2 = p2.asInstanceOf[Long].toInt
    val n = math.min(x.numElements() - o1, y.numElements() - o2)
    var i = 0
    var go = true
    while (go && i < n) {
      if (x.isNullAt(o1 + i) || y.isNullAt(o2 + i) ||
        !x.getUTF8String(o1 + i).equals(y.getUTF8String(o2 + i))) go = false
      else i += 1
    }
    i.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a1, p1, a2, p2) => {
      val o1 = ctx.freshName("o1"); val o2 = ctx.freshName("o2")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      s"""
         |int $o1 = (int) $p1; int $o2 = (int) $p2;
         |int $n = java.lang.Math.min(
         |  $a1.numElements() - $o1, $a2.numElements() - $o2);
         |int $i = 0;
         |while ($i < $n) {
         |  if ($a1.isNullAt($o1 + $i) || $a2.isNullAt($o2 + $i) ||
         |      !$a1.getUTF8String($o1 + $i)
         |        .equals($a2.getUTF8String($o2 + $i))) break;
         |  $i++;
         |}
         |${ev.value} = (long) $i;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}
