package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native k-minimum-values sketch aggregate — `graft_kmv_sketch(h, k)`
  * keeps the k smallest DISTINCT values of a long column per group and
  * returns them as a sorted array. Feeding it 60-bit uniform hashes makes
  * it the KMV distinct-count sketch (estimate (k−1)·2⁶⁰/max(kept)); the
  * hashing stays OUTSIDE the aggregate so the same md5 spelling the
  * DuckDB oracle uses (q62) drives it bit-for-bit.
  *
  * Why a custom TypedImperativeAggregate (the custom-AGGREGATE tier of
  * the extension ladder, alongside the scalar graft_dot/graft_nfc/
  * graft_lev): the windowed spelling — rank per group, keep rn ≤ k —
  * shuffles EVERY row to its group's reducer and sorts there; the sketch
  * is a mergeable bounded buffer, so Catalyst runs it as a partial
  * aggregate: each map task reduces its slice to ≤ k longs, and only
  * sketch buffers cross the wire. Per-group network cost drops from
  * |group| rows to k·|partitions carrying the group| longs — the
  * difference between shuffling a 100 TB token stream and shipping
  * kilobyte sketches.
  *
  * Buffer: a TreeSet (distinct by construction — duplicate hashes must
  * not occupy two of the k slots, or the estimate biases low). Serialized
  * as length-prefixed big-endian longs. */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1 && k <= (1 << 20), "k in [1, 2^20]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow)
    : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
    : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

object KmvSketchAgg {
  val name = "graft_kmv_sketch"

  private[graft] def build(children: Seq[Expression]): KmvSketchAgg = {
    require(children.size == 2, s"$name(value, k)")
    val kv = children(1)
    require(kv.foldable, s"$name: k must be a literal")
    val k = kv.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: k must be an integer literal, got $other")
    }
    KmvSketchAgg(children.head, k)
  }

  /** Idempotently register in the session function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[KmvSketchAgg].getName, name),
        (children: Seq[Expression]) => build(children))
    }
  }
}
