package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-memory per-group top-k by (score DESC, id ASC) — the
  * native replacement for the `row_number() OVER (PARTITION BY g ORDER
  * BY score DESC, id) <= k` pattern. The window form SORTS every
  * group's full candidate set after shuffling ALL of it; this
  * aggregate keeps at most k entries per buffer at every stage, so
  * map-side partial aggregation collapses each partition's candidates
  * to k before the exchange — the shuffle moves O(k · partitions) rows
  * per group instead of the group's whole candidate set. At 100 TB
  * (brute-force ANN: |queries| groups × |corpus| candidates) that is
  * the difference between exchanging the corpus per query and
  * exchanging k rows per query per map task.
  *
  * Output: array<struct<score double, id bigint>> sorted by
  * (score DESC, id ASC) — `posexplode` restores rank = idx + 1.
  * Set semantics on (score, id): an exact duplicate pair contributes
  * once (ids are unique in every graft call site). Null scores/ids are
  * skipped. Result is independent of the aggregation tree: the
  * ordering is total, so any merge order keeps the identical k.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (DOUBLE score, BIGINT id), got " +
        s"(${score.dataType.sql}, ${id.dataType.sql})")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // SQL sorts normalize -0.0 to 0.0 (NormalizeFloatingNumbers), so
      // the window formulation treats them as ties broken by id; match
      // that here or a -0.0 score could order differently
      val d = s.asInstanceOf[Double]
      buf.add(if (d == 0.0d) 0.0d else d, i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.elems.foreach { case (s, i) => buf.add(s, i) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): Any
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val elems = buf.elems.toArray
    out.writeInt(elems.length)
    elems.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k)
    val n = in.readInt()
    (1 to n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

/** Bounded buffer: at most k (score, id) pairs under the total order
  * (score DESC, id ASC). */
final class TopKBuffer(k: Int) {
  private val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
  private val heap = scala.collection.mutable.TreeSet.empty[(Double, Long)](ord)

  def add(s: Double, i: Long): Unit = {
    heap.add((s, i))
    if (heap.size > k) heap.remove(heap.last): Unit
  }

  def elems: Iterator[(Double, Long)] = heap.iterator
  def sorted: Array[(Double, Long)] = heap.iterator.toArray
}
