package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic bounded-memory per-group sample: keeps the k elements
  * with the smallest md5 digests (bottom-k by hash — order-independent,
  * so any partial-aggregation tree yields the identical sample, unlike
  * reservoir sampling). The state is at most k elements per group at
  * every stage, which is what makes it safe where
  * `slice(sort_array(collect_list(x)), 1, k)` accumulates the whole
  * group before truncating.
  *
  * Oracle twin: DuckDB `list_slice(list(x ORDER BY md5(x), x), 1, k)`.
  */
case class BottomKByHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "graft_sample"

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    other.elems.foreach { case (h, v) => buf.addHashed(h, v) }
    buf
  }

  override def eval(buf: BottomKBuffer): Any =
    new GenericArrayData(buf.sortedValues.map(s => UTF8String.fromString(s): Any))

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.elems.size)
    buf.elems.foreach { case (h, v) => out.writeUTF(h); out.writeUTF(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BottomKBuffer(k)
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val h = in.readUTF(); val v = in.readUTF()
      buf.addHashed(h, v)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKByHash =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Bounded buffer: at most k (md5Hex, value) pairs, ordered by
  * (hash, value) so ties are deterministic. */
final class BottomKBuffer(k: Int) {
  // sorted map keyed by (hash, value); size capped at k
  private val heap = scala.collection.mutable.TreeSet.empty[(String, String)]

  def add(v: String): Unit = addHashed(BottomKBuffer.md5Hex(v), v)

  def addHashed(h: String, v: String): Unit = {
    heap.add((h, v))
    if (heap.size > k) heap.remove(heap.last): Unit
  }

  def elems: Iterator[(String, String)] = heap.iterator
  def sortedValues: Array[String] = heap.iterator.map(_._2).toArray
}

object BottomKBuffer {
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}
