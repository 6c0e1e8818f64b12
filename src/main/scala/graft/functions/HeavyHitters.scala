package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter candidate sketch (Misra & Gries 1982;
  * mergeable form per Agarwal et al., "Mergeable Summaries", PODS'12):
  * bounded state of at most `capacity` (key, count) counters per
  * aggregation buffer, whatever the key cardinality of the input.
  *
  * Guarantee: every key with true frequency > N/(capacity+1) is present
  * in the final candidate set; counter error is at most N/(capacity+1).
  * The candidate SET for keys below that bound can vary with the
  * partial-aggregation tree, so this sketch is a CANDIDATE GENERATOR:
  * follow it with an exact recount of the candidates (see
  * `TextAnalysis.heavyHitterTerms`) to get a deterministic, exact
  * top-k. Used directly, treat the output as a superset of the true
  * heavy hitters, not as exact counts.
  *
  * This is the bounded-memory alternative to a full `groupBy(key)` when
  * the key cardinality itself is the problem (URLs, n-grams at 100 TB):
  * pass 1 is a narrow scan producing one `capacity`-sized summary per
  * partition, merged on the driver side of the aggregation tree — no
  * key-space shuffle at all.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  require(capacity > 0, "graft_heavyhits capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "graft_heavyhits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING key column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    other.entries.foreach { case (k, c) => buf.add(k, c) }
    buf
  }

  /** Candidate keys, sorted (count desc, key asc) for a stable listing. */
  override def eval(buf: MGBuffer): Any =
    new GenericArrayData(
      buf.entries.toArray.sortBy { case (k, c) => (-c, k) }
        .map { case (k, _) => UTF8String.fromString(k): Any })

  // length-prefixed raw UTF-8, not writeUTF: a pathological key (long
  // base64 blob, minified-JS line) over 64 KiB would make writeUTF
  // throw mid-shuffle
  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buf.entries.toArray
    out.writeInt(es.length)
    es.foreach { case (k, c) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGBuffer(capacity)
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.add(new String(kb, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Bounded counter map: at most `capacity` counters. Inserting past
  * capacity subtracts the minimum surviving counter from everything and
  * drops the zeros (the batched form of MG's decrement-all step; with
  * weighted inserts this is exactly the PODS'12 merge rule). */
final class MGBuffer(capacity: Int) {
  private val counts = scala.collection.mutable.HashMap.empty[String, Long]

  def add(key: String, c: Long): Unit = {
    counts.updateWith(key) {
      case Some(n) => Some(n + c)
      case None => Some(c)
    }
    if (counts.size > capacity) {
      // evict: subtract the (capacity+1)-th largest count (here: the
      // minimum over capacity+1 entries) and drop non-positive counters
      val dec = counts.valuesIterator.min
      counts.filterInPlace((_, n) => n > dec)
      counts.mapValuesInPlace((_, n) => n - dec)
    }
  }

  def entries: Iterator[(String, Long)] = counts.iterator
}
