package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate`:
  * at most k counters; an unseen item beyond capacity decrements ALL
  * counters (dropping zeros) instead of entering. Guarantee: any item
  * with true frequency > n/k is in the sketch, and each kept estimate
  * undercounts by at most n/k. Partial buffers merge by summing
  * counts then subtracting the (k+1)-th largest count from every
  * counter (Agarwal et al., "Mergeable Summaries") — the guarantee
  * survives map-side combine, so the sketch is one O(k)-state pass at
  * any parallelism. The production use is 2-pass exact heavy hitters
  * (q_heavy_hitters): sketch → ≤k candidates → exact recount of the
  * candidate set — the only way to find hot keys in 100 TB without a
  * full groupBy of the tail.
  *
  * Returns (item, est) structs ordered by decreasing estimate (item
  * breaks ties) — estimates are lower bounds, not exact counts.
  */
case class MisraGries(valueExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = valueExpr.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      if (buf.contains(s)) buf(s) += 1L
      else if (buf.size < k) buf(s) = 1L
      else {
        // decrement-all: amortized O(1) per input over the whole pass
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { key =>
          val c = buf(key) - 1L
          if (c == 0L) dead += key else buf(key) = c
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (s, c) => b1(s) = b1.getOrElse(s, 0L) + c }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything, drop ≤0
      val cut = b1.values.toArray.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.keysIterator.foreach { key =>
        val c = b1(key) - cut
        if (c <= 0L) dead += key else b1(key) = c
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toArray.sortBy { case (s, c) => (-c, s) }
      .map { case (s, c) => InternalRow(UTF8String.fromString(s), c) })

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, kExpr)
  override def prettyName: String = "mg_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), kExpr = newChildren(1))
}
