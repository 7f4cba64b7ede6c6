package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen cosine similarity over two `array<double>` columns.
  *
  * The composed form — `aggregate(zip_with(a,b,(x,y)->x*y),...)` —
  * allocates an intermediate array and evaluates interpreted lambdas
  * per element; profiled 20× slower on the ANN candidate join (40s →
  * 2s at sf0.1). This expression emits a single fused loop inside
  * whole-stage codegen. Accumulation order is the same sequential
  * left-to-right fold as both the HOF form and DuckDB's list_sum, so
  * oracle results are bit-identical.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val u = x.getDouble(i); val v = y.getDouble(i)
      dot += u * v; na += u * u; nb += v * v; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $u = $a.getDouble($i);
         |  double $v = $b.getDouble($i);
         |  $dot += $u * $v; $na += $u * $u; $nb += $v * $v;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  val info = new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim")

  /** Per-session SQL registration (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
}

/** `SparkSessionExtensions` hook so library users get the native
  * functions in SQL via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((new FunctionIdentifier("cosine_sim"), CosineSim.info,
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    e.injectFunction((new FunctionIdentifier("h60"),
      new ExpressionInfo(classOf[H60].getName, "h60"),
      (exprs: Seq[Expression]) => H60(exprs.head)))
    e.injectFunction((new FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[MisraGries].getName, "mg_topk"),
      (exprs: Seq[Expression]) =>
        MisraGries(exprs(0), exprs(1)).toAggregateExpression()))
    e.injectOptimizerRule(_ => graft.plans.RewriteTop1PerGroup)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
