package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two double arrays.
  *
  * The composable alternative — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (acc,x) -> acc+x)` — evaluates interpreted lambda closures per
  * element (~100ns each), which dominates brute-force similarity scans.
  * This expression is a tight codegen'd loop over the unsafe array data
  * (left-to-right accumulation, bit-identical to the sequential fold it
  * replaces). Null if either side is null; arrays shorter side bounds
  * the loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers pass array<double> (built via an explicit CAST); no
  // ExpectsInputTypes because AbstractDataType is private[sql] in 4.x.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Registration for graft's native SQL functions. */
object VectorFunctions {
  val dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")

  /** Register on an existing session (idempotent). After this,
    * `expr("graft_dot(a, b)")` / SQL `graft_dot(a, b)` resolve. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sample", exprs => BottomKByHash(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
  }
}

/** SparkSessionExtensions entry point:
  * `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * native functions at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      VectorFunctions.dotInfo,
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
  }
}
