package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Bloom-filter aggregate — `graft_bloom(h, mBits, k)` folds a long
  * hash column into an mBits-wide Bloom filter (k probes per item, double
  * hashing) and returns the filter as an `array<long>` of mBits/64 words.
  *
  * Fourth member of the custom-AGGREGATE tier (KMV, top-k, and this): the
  * buffer is a fixed-size bit array, so Catalyst runs it as a partial
  * aggregate — each map task folds its slice locally and only
  * filter-sized buffers (mBits/8 bytes, ≤ 16 MB) cross the shuffle; the
  * input relation is never shuffled (callers may still scan it again for
  * an exact verify — see TextOps.dedupAgainstHistory). The
  * alternative spellings either collect every distinct fingerprint to the
  * driver (DataFrameStatFunctions.bloomFilter — two extra jobs, no
  * composition with groupBy) or shuffle the full item stream.
  *
  * Bit positions use double hashing — pos_i = (h + i·h2) mod mBits with
  * h2 = (h >>> 32) | 1 (odd, so the probe sequence never collapses when
  * mBits is a power of two). [[BloomProbe.mightContain]] is the matching
  * pure-Column probe: no UDF, no driver round-trip — the one-row filter
  * frame broadcasts and the bit tests codegen. No false negatives by
  * construction; callers re-verify positives exactly (the q139 shape), so
  * false-positive rate only affects the PRUNED volume, never the answer. */
case class BloomFilterAgg(child: Expression, mBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits >= 64 && mBits <= (1 << 27) && Integer.bitCount(mBits) == 1,
    "mBits must be a power of two in [64, 2^27]")
  require(k >= 1 && k <= 16, "k in [1, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits / 64)

  private def set(buf: Array[Long], h: Long): Unit = {
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < k) {
      // mBits is a power of two: mask instead of mod (and stays nonnegative)
      val pos = ((h + i * h2) & (mBits - 1)).toInt
      buf(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) set(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

object BloomFilterAgg {
  val name = "graft_bloom"

  private[graft] def build(children: Seq[Expression]): BloomFilterAgg = {
    require(children.size == 3, s"$name(hash, mBits, k)")
    def intLit(e: Expression, what: String): Int = {
      require(e.foldable, s"$name: $what must be a literal")
      e.eval() match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"$name: $what must be an integer literal, got $other")
      }
    }
    BloomFilterAgg(children.head, intLit(children(1), "mBits"),
      intLit(children(2), "k"))
  }

  /** Idempotently register in the session function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[BloomFilterAgg].getName, name),
        (children: Seq[Expression]) => build(children))
    }
  }
}

/** Pure-Column Bloom probe matching [[BloomFilterAgg]]'s bit layout. */
object BloomProbe {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** True when `h` may be in the filter held by `words` (an `array<long>`
    * column from `graft_bloom` with the SAME mBits and k). All Column
    * arithmetic (codegen'd, map-side); element_at is 1-based. */
  def mightContain(words: Column, h: Column, mBits: Int, k: Int): Column = {
    require(Integer.bitCount(mBits) == 1, "mBits must be a power of two")
    val h2 = shiftrightunsigned(h, 32).bitwiseOR(lit(1L))
    (0 until k).map { i =>
      val pos = (h + lit(i.toLong) * h2).bitwiseAND(lit((mBits - 1).toLong))
      // word index: pos >>> 6 (element_at is 1-based); bit test via a
      // column-amount shiftright (the Scala helper only takes Int amounts)
      val word = element_at(words,
        (shiftrightunsigned(pos, 6) + lit(1L)).cast(IntegerType))
      call_function("shiftright", word, (pos % 64).cast(IntegerType))
        .bitwiseAND(lit(1L)) =!= lit(0L)
    }.reduce(_ && _)
  }
}
