package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k by score as a `TypedImperativeAggregate`: keeps the k
  * (score, id) pairs with the highest scores (ties → smaller id) in a
  * bounded heap. This is "rank() <= k per group" computed in one pass
  * with O(k) state per group and map-side partial aggregation — no
  * per-group sort, no whole-group shuffle. The window-function idiom
  * (`row_number().over(partitionBy(g).orderBy(score.desc))` + filter)
  * sorts every row of every group; at 100 TB that is a full shuffle +
  * sort of the corpus to keep k rows per group, while this aggregate
  * shuffles only the O(groups × k) partial heaps. Merge re-inserts,
  * so the result is associative/commutative/partitioning-independent.
  * Returns an array of (id, score) structs ordered best-first.
  */
case class TopKByScore(scoreExpr: Expression, idExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  /** True when a outranks b: higher score, tie → smaller id. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  // max-heap on "badness": head is the worst element kept
  private val worstFirst: Ordering[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) =>
      if (better(a, b)) -1 else if (better(b, a)) 1 else 0

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def insert(buf: mutable.PriorityQueue[(Double, Long)],
      t: (Double, Long)): Unit =
    if (buf.size < k) buf += t
    else if (better(t, buf.head)) { buf.dequeue(); buf += t }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val sc = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (sc != null && id != null)
      insert(buf, (sc.asInstanceOf[Number].doubleValue(), id.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(buf.toArray.sortWith(better).map { case (sc, id) =>
      new GenericInternalRow(Array[Any](id, sc))
    })

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (sc, id) => out.writeDouble(sc); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf += ((in.readDouble(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def prettyName: String = "top_k_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
