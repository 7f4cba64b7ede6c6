package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k-by-hash sketch as a `TypedImperativeAggregate` (the raw
  * imperative-buffer aggregate API — the layer below `Aggregator`,
  * used by Spark's own HLL/percentile sketches).
  *
  * Keeps the k (hash, id) pairs with the smallest hashes in a bounded
  * max-heap; partial buffers merge by re-inserting, so the sketch is
  * associative/commutative — map-side combine works and the result is
  * independent of partitioning. With a uniform hash (h60) this is a
  * deterministic uniform sample: "ORDER BY hash LIMIT k" computed in
  * one pass with O(k) state per group instead of a sort — the only
  * way to sample-per-group at 100 TB without shuffling whole groups.
  * Returns the ids ordered by hash.
  */
case class BottomKIds(hashExpr: Expression, idExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)] // max-heap on (hash, id)

  private def insert(buf: mutable.PriorityQueue[(Long, Long)], t: (Long, Long)): Unit =
    if (buf.size < k) buf += t
    else if (Ordering[(Long, Long)].lt(t, buf.head)) { buf.dequeue(); buf += t }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val h = hashExpr.eval(input)
    val id = idExpr.eval(input)
    if (h != null && id != null)
      insert(buf, (h.asInstanceOf[Long], id.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Long, Long)],
      b2: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted.map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, id) => out.writeLong(h); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf += ((in.readLong(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashExpr, idExpr, kExpr)
  override def prettyName: String = "bottom_k_ids"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
