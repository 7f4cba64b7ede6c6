package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values / bottom-k theta) sketch as a
  * `TypedImperativeAggregate`: the k smallest DISTINCT hash values of
  * the group (Bar-Yossef et al., "Counting distinct elements in a
  * data stream", RANDOM'02; the DataSketches theta family is the
  * production form). Differs from [[BottomKIds]] exactly where a
  * cardinality sketch must: inserts dedup (a set, not a multiset), so
  * the k-th minimum estimates DISTINCT density — `(k−1)·2^60 / h_k`
  * for a uniform 60-bit hash — and set operations (union = merge,
  * intersect = shared values below the common theta) stay meaningful.
  *
  * The buffer is a bounded TreeSet: insert dedups and evicts the
  * current maximum once k values are held; partial buffers merge by
  * re-insertion, so the aggregate is associative/commutative —
  * map-side combine works, the result is independent of partitioning
  * and batch order (what lets the streaming twin share the batch
  * oracle). With the deterministic h60 both engines compute the SAME
  * sketch: the oracle replays it as `row_number() OVER (ORDER BY h)
  * <= k` over distinct hashes. Returns the values ascending.
  */
case class KmvMinK(hashExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) { buf += v; () }
    else if (v < buf.last && !buf.contains(v)) { buf -= buf.last; buf += v; () }

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) insert(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.TreeSet[Long],
      b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashExpr, kExpr)
  override def prettyName: String = "kmv_min_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMinK =
    copy(hashExpr = newChildren(0), kExpr = newChildren(1))
}
