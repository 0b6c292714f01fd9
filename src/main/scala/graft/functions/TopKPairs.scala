package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap exact top-k aggregate: collects the k best (score, id)
  * pairs per group, ordered score DESC with id ASC as the deterministic
  * tie-break. Returns `array<struct<score double, id bigint>>` sorted
  * best-first.
  *
  * This is the custom-aggregate answer to "top-k per group". Spark 4's
  * `WindowGroupLimit` rewrite already bounds the ranking-window
  * formulation's shuffle to k rows per (group, partition) — what this
  * aggregate additionally removes is the per-partition SORT the window
  * limit still performs (heap admission is O(n log k) with no sort
  * buffer) and the window-function machinery itself (one hash aggregate
  * instead of sort + group-limit + window + filter stages).
  *
  * The buffer is a min-heap keyed by the INVERSE order (worst of the
  * kept k at the root) so admission is O(log k); serialization between
  * partial and final aggregation is a plain (count, pairs) byte image.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKPairs.Pair]] {

  require(k >= 1, "k must be >= 1")

  import TopKPairs.Pair

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.PriorityQueue[Pair] =
    new java.util.PriorityQueue[Pair](k + 1, TopKPairs.worstFirst)

  /** better(a, b): a ranks above b in the final top-k order. */
  private def admit(buf: java.util.PriorityQueue[Pair], s: Double, i: Long): Unit = {
    if (buf.size < k) buf.add(Pair(s, i))
    else {
      val worst = buf.peek()
      if (s > worst.score || (s == worst.score && i < worst.id)) {
        buf.poll(); buf.add(Pair(s, i))
      }
    }
  }

  override def update(buf: java.util.PriorityQueue[Pair], input: InternalRow): java.util.PriorityQueue[Pair] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      admit(buf, sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[Pair],
      other: java.util.PriorityQueue[Pair]): java.util.PriorityQueue[Pair] = {
    val it = other.iterator()
    while (it.hasNext) { val p = it.next(); admit(buf, p.score, p.id) }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[Pair]): Any = {
    val arr = new Array[Pair](buf.size)
    buf.toArray(arr)
    java.util.Arrays.sort(arr, TopKPairs.bestFirst)
    new GenericArrayData(arr.map(p => InternalRow(p.score, p.id)): Array[Any])
  }

  override def serialize(buf: java.util.PriorityQueue[Pair]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); out.writeDouble(p.score); out.writeLong(p.id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Pair] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(Pair(in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_pairs"
}

object TopKPairs {
  final case class Pair(score: Double, id: Long)

  /** Final presentation order: score DESC, id ASC. */
  val bestFirst: java.util.Comparator[Pair] = (a: Pair, b: Pair) => {
    val c = java.lang.Double.compare(b.score, a.score)
    if (c != 0) c else java.lang.Long.compare(a.id, b.id)
  }

  /** Heap order: the element that should be EVICTED first at the root. */
  val worstFirst: java.util.Comparator[Pair] = bestFirst.reversed()
}
