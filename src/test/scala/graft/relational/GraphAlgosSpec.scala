package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphAlgosSpec extends SparkTestBase {

  test("triangleCounts equals brute force on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 60
    val edges = (for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.12
    } yield (a, b)).toSet
    val got = GraphAlgos.triangleCounts(edges.toSeq.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: all a<b<c with all three edges present
    val tri = for {
      a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
      if edges((a, b)) && edges((b, c)) && edges((a, c))
    } yield (a, b, c)
    val exp = tri.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    assert(got == exp)
    assert(tri.nonEmpty, "fixture must actually contain triangles")
  }

  test("derivedBroadcastNodesBelow: linear in heap, anchored at the " +
      "probe's 56 GiB / 2.1M tie boundary, clamped both ways") {
    val g = 1L << 30
    // the r12 probe anchor: 56 GiB heap -> ~2.1M nodes (tie boundary)
    assert(GraphAlgos.derivedBroadcastNodesBelow(56 * g) == 56 * g / 28672)
    assert(GraphAlgos.derivedBroadcastNodesBelow(56 * g) >= 2000000L &&
      GraphAlgos.derivedBroadcastNodesBelow(56 * g) < 4200000L,
      "derived value at the probe heap must land inside the measured " +
        "tie..cliff interval")
    // floor: tiny test JVMs stay on the broadcast path for catalog graphs
    assert(GraphAlgos.derivedBroadcastNodesBelow(1 * g) == 262144L)
    // ceiling: far below Spark's 8 GB broadcast-table limit
    assert(GraphAlgos.derivedBroadcastNodesBelow(1L << 50) == 16000000L)
  }

  test("pageRankFixedPoint matches a driver-side integer reference") {
    import spark.implicits._
    // directed edges, both directions of a small undirected graph
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val dir = und ++ und.map(_.swap)
    val got = GraphAlgos.pageRankFixedPoint(dir.toDF("s", "d"),
        iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val scale = 1000000000000L
    val nodes = dir.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val outdeg = dir.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = (scale * 3 / 20) / n
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 4) {
      val contrib = dir.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => r(e._1) * 17 / 20 / outdeg(e._1)).sum
      }
      r = nodes.map(v => v -> (base + contrib.getOrElse(v, 0L))).toMap
    }
    assert(got == r)
    // ranks differ by centrality: degree-3 node 3 outranks leaf 5
    assert(got(3L) > got(5L))

    // the shuffled-join fallback (node count above the broadcast
    // threshold) is bit-identical to the broadcast path
    val shuffled = GraphAlgos.pageRankFixedPoint(dir.toDF("s", "d"),
        iterations = 4, broadcastNodesBelow = 0L)
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    assert(shuffled == r)
  }

  test("shuffled-fallback PageRank never re-shuffles the edge table: " +
      "each round exchanges only the node-sized rank side") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct.toDF("s", "d")
    // disable broadcast joins so the test-sized graph plans the same
    // sort-merge shape a web-scale edge table would
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    GraphAlgos.roundPlanProbe = Some((_, p) => plans += p)
    try {
      // checkpointEvery = 1 severs rounds, so each probed plan holds
      // exactly ONE round's join over the previous round's checkpoint
      GraphAlgos.pageRankFixedPoint(edges, iterations = 3,
        checkpointEvery = 1, broadcastNodesBelow = 0L).collect()
    } finally {
      GraphAlgos.roundPlanProbe = None
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    assert(plans.size == 3)
    // drop the cached edge relation's INTERNAL plan (everything printed
    // deeper than an InMemoryRelation line — its one-time layout build,
    // including AQE's "Final/Initial Plan" sections) so only the round's
    // own operators are counted
    def outerPlan(plan: String): String = {
      def namePos(l: String): Int =
        l.indexWhere(c => !" :+-".contains(c))
      var skipDeeper = -1
      plan.split("\n").filter { l =>
        val p = namePos(l)
        if (skipDeeper >= 0 && p > skipDeeper) false
        else {
          skipDeeper = if (l.contains("InMemoryRelation")) p else -1
          true
        }
      }.mkString("\n")
    }
    for ((full, i) <- plans.zipWithIndex) {
      val plan = outerPlan(full)
      // the edge layout was fixed ONCE (inside the cached relation), so
      // the round's join may induce exactly one planner exchange on s:
      // the node-sized rank side. A second ENSURE_REQUIREMENTS exchange
      // on s = the edge table re-shuffling every round, the pre-fix bug.
      val induced = plan.split("\n").count(l =>
        l.contains("Exchange hashpartitioning(s#") &&
          l.contains("ENSURE_REQUIREMENTS"))
      assert(induced == 1,
        s"round ${i + 1}: expected only the rank-side exchange, " +
          s"got $induced:\n$full")
      // and the edge side scans the cache bare: no exchange directly
      // above the InMemoryTableScan
      val lines = plan.split("\n")
      lines.zipWithIndex.filter(_._1.contains("InMemoryTableScan"))
        .foreach { case (_, ix) =>
          val above = lines.slice(math.max(0, ix - 2), ix).mkString("\n")
          assert(!above.contains("Exchange"),
            s"round ${i + 1}: edge-side cache scan re-shuffled:\n$full")
        }
      assert(!plan.contains("CartesianProduct"))
    }
    // the cached edge layout is released before the call returns
    assert(spark.sharedState.cacheManager.isEmpty,
      "pageRank left its edge layout pinned in the cache manager")
  }

  test("kCore matches an independent driver-side peel, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a < b }.distinct
    def model(k: Int, rounds: Int): Map[Long, Long] = {
      var e = edges.toSet
      var r = 0
      var done = false
      while (!done && r < rounds) {
        val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val e2 = e.filter(p => keep(p._1) && keep(p._2))
        done = e2.size == e.size; e = e2; r += 1
      }
      e.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (v, vs) => v -> vs.size.toLong }
    }
    for ((k, rounds) <- Seq((3, 2), (4, 10)); parts <- Seq(1, 7)) {
      val got = GraphAlgos.kCore(
          edges.toDF("a", "b").repartition(parts), k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model(k, rounds), s"k=$k rounds=$rounds parts=$parts")
    }
    // converged peel is stable: more rounds change nothing (the property
    // that makes a fixed-round oracle match an early-exiting engine)
    val a = GraphAlgos.kCore(edges.toDF("a", "b"), 3, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphAlgos.kCore(edges.toDF("a", "b"), 3, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("pageRank plans stay equi-join only (no cartesian)") {
    import spark.implicits._
    val dir = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("s", "d")
    val out = GraphAlgos.pageRankFixedPoint(dir, iterations = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
