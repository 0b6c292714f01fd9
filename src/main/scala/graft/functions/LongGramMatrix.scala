package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass exact Gram/covariance statistics over `array<long>` vectors:
  * accumulates the d first-moment sums Σxᵢ and the d(d+1)/2 upper-triangle
  * product sums Σxᵢxⱼ in a single flat long buffer, plus the row count.
  * Returns `struct<n bigint, s array<long>, g array<long>>` (g in row-major
  * upper-triangle order: (i,j) with i ≤ j, 0-based, at index
  * i·d − i·(i−1)/2 + (j−i)).
  *
  * This is the scale-right covariance/whitening-prep shape: ONE narrow
  * pass over the corpus with map-side combine of a fixed ~d²/2-long
  * buffer — versus the explode + self-join formulation (the DuckDB
  * oracle replays that one), which multiplies the corpus by d and then
  * joins it against itself. All sums are exact integers over micro-unit
  * vectors, so every engine recomputing them agrees digit-for-digit
  * regardless of partitioning or merge order (the covariance itself is
  * then one identical IEEE expression at the boundary).
  *
  * Overflow contract: |element| ≤ ~1e6 micro-units and corpus rows ≤
  * ~9e6·d keep Σxᵢxⱼ within long range (9.2e18); at larger corpora,
  * shard the aggregation and combine in DECIMAL.
  */
case class LongGramMatrix(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1, "dimension must be >= 1")

  private val tri = d * (d + 1) / 2
  // buffer layout: [0] = n, [1..d] = sums, [d+1 .. d+tri] = products
  private val bufLen = 1 + d + tri

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("g", ArrayType(LongType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vec.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      require(a.numElements() == d,
        s"long_gram_matrix: expected $d dims, got ${a.numElements()}")
      buf(0) += 1L
      var i = 0
      var p = 1 + d
      while (i < d) {
        val xi = a.getLong(i)
        buf(1 + i) += xi
        var j = i
        while (j < d) {
          buf(p) += xi * a.getLong(j)
          p += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val s = new Array[Any](d)
    var i = 0
    while (i < d) { s(i) = buf(1 + i); i += 1 }
    val g = new Array[Any](tri)
    i = 0
    while (i < tri) { g(i) = buf(1 + d + i); i += 1 }
    InternalRow(buf(0), new GenericArrayData(s), new GenericArrayData(g))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongGramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongGramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LongGramMatrix =
    copy(vec = newChildren(0))

  override def prettyName: String = "long_gram_matrix"
}
