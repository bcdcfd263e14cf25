package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate — `graft_topk(score, id, k)` keeps the
  * k best (score, id) pairs per group (score DESC, id ASC tie-break) and
  * returns the ids in rank order.
  *
  * The third member of the custom-AGGREGATE tier (with
  * [[KmvSketchAgg]]): "top k per group" spelled as a window —
  * row_number over (PARTITION BY g ORDER BY score) — shuffles EVERY row
  * to its group's reducer and sorts there (the catalog's two-phase
  * salted-window spelling caps the reducer at 64·k rows but still
  * shuffles the corpus once). As a mergeable bounded buffer it runs as a
  * partial aggregate: each map task reduces its slice to ≤ k pairs and
  * only k-sized buffers cross the wire — per-group network cost
  * k·|partitions carrying the group|, independent of group size.
  *
  * Determinism: the buffer's order (score DESC, id ASC) is total, so the
  * kept set and its order are independent of partitioning and merge
  * order — the result reproduces on any engine (oracle: a rank window).
  * SET semantics over (score, id) pairs: two identical rows occupy one
  * slot (ids are normally unique per group, where this is invisible). */
case class TopKAgg(scoreChild: Expression, idChild: Expression, k: Int,
    emitScores: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  require(k >= 1 && k <= (1 << 20), "k in [1, 2^20]")

  // score DESC, id ASC: "first" in the TreeSet = best. Explicit
  // comparator — negating the score (`-s`) would map Long.MinValue to
  // itself (two's complement), ranking the worst possible score as best
  // and breaking the total order the reproducibility claim rests on.
  private val ord: Ordering[(Long, Long)] =
    new Ordering[(Long, Long)] {
      def compare(x: (Long, Long), y: (Long, Long)): Int = {
        val s = java.lang.Long.compare(y._1, x._1) // score DESC
        if (s != 0) s else java.lang.Long.compare(x._2, y._2) // id ASC
      }
    }

  override def children: Seq[Expression] = Seq(scoreChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  private def offer(buf: java.util.TreeSet[(Long, Long)], s: Long, i: Long): Unit = {
    if (buf.size < k) buf.add((s, i))
    else if (ord.lt((s, i), buf.last())) { buf.add((s, i)); if (buf.size > k) buf.pollLast() }
  }

  override def update(buf: java.util.TreeSet[(Long, Long)],
      input: org.apache.spark.sql.catalyst.InternalRow)
    : java.util.TreeSet[(Long, Long)] = {
    val s = scoreChild.eval(input)
    val i = idChild.eval(input)
    if (s != null && i != null)
      offer(buf, s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)])
    : java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, i) = it.next(); offer(buf, s, i) }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    // emitScores: interleaved [s1, i1, s2, i2, …] in rank order — callers
    // that pack a composite rank key into the score (q97) recover it
    // without a second corpus join back to the scored rows
    val stride = if (emitScores) 2 else 1
    val out = new Array[Long](buf.size * stride)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      if (emitScores) { out(i) = s; out(i + 1) = id } else out(i) = id
      i += stride
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[(Long, Long)](ord)
    var i = 0
    while (i < n) { out.add((bb.getLong, bb.getLong)); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreChild = newChildren(0), idChild = newChildren(1))
}

object TopKAgg {
  val name = "graft_topk"

  private[graft] def build(children: Seq[Expression]): TopKAgg = {
    require(children.size == 3 || children.size == 4,
      s"$name(score, id, k[, emitScores])")
    val kv = children(2)
    require(kv.foldable, s"$name: k must be a literal")
    val k = kv.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: k must be an integer literal, got $other")
    }
    val emit = children.size == 4 && {
      require(children(3).foldable, s"$name: emitScores must be a literal")
      children(3).eval() == true
    }
    TopKAgg(children(0), children(1), k, emit)
  }

  /** Idempotently register in the session function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[TopKAgg].getName, name),
        (children: Seq[Expression]) => build(children))
    }
  }
}
