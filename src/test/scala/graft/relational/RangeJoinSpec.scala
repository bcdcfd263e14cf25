package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000L)

  test("bucketed range join equals the naive inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = (0 until 300).map(i =>
      (i % 4L, ts(100000L + rnd.nextInt(50000)), i.toLong))
      .toDF("k", "ts", "pid")
    val intervals = (0 until 80).map { i =>
      val s = 100000L + rnd.nextInt(50000)
      (i % 4L, ts(s), ts(s + 600 + rnd.nextInt(3000)), 1000L + i)
    }.toDF("k", "w_start", "w_end", "iid")
    val got = RangeJoin.pointsInIntervals(points, intervals, Seq("k"),
        "ts", "w_start", "w_end", bucketSeconds = 1800L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") &&
          col("p.ts") >= col("i.w_start") && col("p.ts") < col("i.w_end"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp)
    assert(exp.nonEmpty, "fixture must produce matches for the test to mean anything")
    // boundary semantics: closed-open — a point AT w_end is excluded,
    // a point AT w_start included
    val p2 = Seq((1L, ts(1000), 1L), (1L, ts(2000), 2L)).toDF("k", "ts", "pid")
    val i2 = Seq((1L, ts(1000), ts(2000), 10L)).toDF("k", "w_start", "w_end", "iid")
    val edges = RangeJoin.pointsInIntervals(p2, i2, Seq("k"),
        "ts", "w_start", "w_end", 600L)
      .select("pid").collect().map(_.getLong(0)).toSeq
    assert(edges == Seq(1L))
  }

  test("interval overlap join equals naive, emits once, half-open bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def mk(n: Int, span: Int) = (0 until n).map { i =>
      val s = 100000L + rnd.nextInt(50000)
      (i % 4L, ts(s), ts(s + 1 + rnd.nextInt(span)), i.toLong)
    }
    val L = mk(200, 4000).toDF("k", "ls", "le", "lid")
    val R = mk(150, 9000).toDF("k", "rs", "re", "rid")
    val got = RangeJoin.intervalOverlapPairs(L, R, Seq("k"),
        "ls", "le", "rs", "re", bucketSeconds = 1800L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = L.join(R, Seq("k"))
      .filter(col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == naive.sorted.toSeq)
    assert(got.length == got.distinct.length, "pair emitted more than once")
    assert(got.nonEmpty)

    // half-open: touching intervals ([0,10) and [10,20)) do NOT overlap,
    // and an interval ending exactly on a bucket boundary must not leak
    // into the next bucket
    val l2 = Seq((1L, ts(1800), ts(3600), 1L)).toDF("k", "ls", "le", "lid")
    val r2 = Seq((1L, ts(3600), ts(5400), 1L),
      (1L, ts(3599), ts(5400), 2L)).toDF("k", "rs", "re", "rid")
    val touch = RangeJoin.intervalOverlapPairs(l2, r2, Seq("k"),
        "ls", "le", "rs", "re", bucketSeconds = 1800L)
      .select("rid").collect().map(_.getLong(0)).toSeq
    assert(touch == Seq(2L))
  }

  test("degenerate windows: empty ([s,s)) and inverted (e < s) match nothing") {
    import spark.implicits._
    // inverted window on one side would make sequence() DESCEND and
    // explode spurious bucket rows; empty windows could pass the pair
    // filter `ls < re && rs < le` despite an empty intersection
    val L = Seq(
      (1L, ts(1000), ts(1000), 1L),   // empty
      (1L, ts(5000), ts(2000), 2L),   // inverted
      (1L, ts(1000), ts(4000), 3L)    // real
    ).toDF("k", "ls", "le", "lid")
    val R = Seq(
      (1L, ts(500), ts(8000), 10L),   // covers everything real
      (1L, ts(3000), ts(3000), 11L),  // empty
      (1L, ts(9000), ts(100), 12L)    // inverted
    ).toDF("k", "rs", "re", "rid")
    val pairs = RangeJoin.intervalOverlapPairs(L, R, Seq("k"),
        "ls", "le", "rs", "re", bucketSeconds = 1800L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 10L)))

    // pointsInIntervals: same guard — no phantom containment, no
    // descending-sequence blowup
    val p = Seq((1L, ts(1000), 1L), (1L, ts(3000), 2L)).toDF("k", "ts", "pid")
    val iv = Seq(
      (1L, ts(1000), ts(1000), 20L),  // empty: contains nothing
      (1L, ts(7000), ts(100), 21L),   // inverted
      (1L, ts(500), ts(2000), 22L)    // contains pid=1 only
    ).toDF("k", "w_start", "w_end", "iid")
    val hits = RangeJoin.pointsInIntervals(p, iv, Seq("k"),
        "ts", "w_start", "w_end", 600L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((1L, 22L)))
  }

  test("range join plans as an equi-join, never a cross product") {
    import spark.implicits._
    val points = (0 until 100).map(i => (1L, ts(100000L + i * 17), i.toLong))
      .toDF("k", "ts", "pid")
    val intervals = (0 until 50).map(i =>
      (1L, ts(100000L + i * 29), ts(100000L + i * 29 + 500), i.toLong))
      .toDF("k", "w_start", "w_end", "iid")
    val plan = RangeJoin.pointsInIntervals(points, intervals, Seq("k"),
        "ts", "w_start", "w_end", 600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
