package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * `graft_topk(entry, k)` — a native Catalyst aggregate keeping the k
 * smallest `(negSim, neighbor_id, sim)` entries per group in a BOUNDED
 * k-element heap.
 *
 * This is the memory-safe top-k the ANN operators want: the
 * `collect_list + array_sort + slice` formulation accumulates EVERY
 * scored row of a group in one aggregation buffer before truncating
 * (per-group state is partition-sized, not k-sized — a skewed
 * partition can OOM an executor), while this aggregate's buffer never
 * holds more than k entries at ANY level — Spark runs it through
 * ObjectHashAggregate with map-side partial aggregation, so both the
 * partial (per input partition) and final (per group) states are
 * k-bounded by construction.
 *
 * Entry type is `struct<negSim: double, neighbor_id: bigint,
 * sim: double>` ordered lexicographically by (negSim, neighbor_id) —
 * the deterministic "similarity desc, id asc" ranking every Similarity
 * operator and its DuckDB oracle use. Registered via
 * [[GraftExtensions]]; [[graft.operators.Similarity]] falls back to
 * the portable two-level formulation when the extension is absent,
 * value-identically.
 */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long, Double)]] {

  require(k >= 1, s"graft_topk k=$k must be >= 1")

  // heap head = LARGEST (negSim, neighbor_id) = current worst of the
  // kept k, so eviction after insertion is a single dequeue
  private val worstFirst: Ordering[(Double, Long, Double)] =
    Ordering.by((e: (Double, Long, Double)) => (e._1, e._2))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if st.fields.length == 3 &&
        st.fields(0).dataType == DoubleType &&
        st.fields(1).dataType == LongType &&
        st.fields(2).dataType == DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_topk needs struct<double, bigint, double>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long, Double)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buffer: mutable.PriorityQueue[(Double, Long, Double)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long, Double)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      insert(buffer, (row.getDouble(0), row.getLong(1), row.getDouble(2)))
    }
    buffer
  }

  override def merge(
      buffer: mutable.PriorityQueue[(Double, Long, Double)],
      other: mutable.PriorityQueue[(Double, Long, Double)]): mutable.PriorityQueue[(Double, Long, Double)] = {
    other.foreach(insert(buffer, _))
    buffer
  }

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long, Double)],
      e: (Double, Long, Double)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long, Double)]): Any = {
    // dequeueAll drains worst-first; reverse for best-first output
    val sorted = buffer.clone().dequeueAll.reverse
    new GenericArrayData(sorted.map(e => InternalRow(e._1, e._2, e._3)).toArray[Any])
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long, Double)]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(baos)
    out.writeInt(buffer.size)
    buffer.foreach { e => out.writeDouble(e._1); out.writeLong(e._2); out.writeDouble(e._3) }
    out.flush()
    baos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long, Double)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readDouble(), in.readLong(), in.readDouble()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}
