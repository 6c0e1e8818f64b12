package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a long-hash column — the
  * semi-join-reduction primitive: prune a huge probe side BEFORE its
  * join shuffle using a compact sketch of the build side. No false
  * negatives, so `probe.filter(graft_bloom_contains(gh, bloom))` then
  * an exact join is EXACTLY equal to the unpruned join — the filter
  * only cuts shuffle volume (by 1-fpp of the non-matching rows).
  *
  * The serialized filter rides the plan as a binary literal (the same
  * transport Spark's own runtime-filter rewrite uses for its bloom
  * subquery result) and is deserialized lazily once per deserialized
  * expression instance, not per row. The probe itself is a codegen'd
  * bit test.
  */
case class BloomContains(child: Expression, bloomBytes: Seq[Byte])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  // Seq[Byte], not Array[Byte]: case-class equality on an Array field is
  // reference-based, which would defeat semanticEquals-driven plan reuse
  // (common-subexpression elimination, exchange reuse) for identical
  // probes

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT probe column, got ${child.dataType.sql}")

  @transient lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes.toArray))

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the expression instance itself: the generated code calls
    // filter(), whose lazy init deserializes the sketch once per task
    val self = ctx.addReferenceObj("graftBloomExpr", this, classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.filter().mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
