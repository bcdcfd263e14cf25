package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native bounded top-k aggregate: exact rank order under any
  * partitioning (update + merge paths), tie-break by id, partial-agg
  * plan shape. */
class TopKAggSpec extends SparkTestBase {

  test("keeps the k best (score desc, id asc) under any partitioning") {
    import spark.implicits._
    TopKAgg.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = (0 until 4000).map(i =>
      ("g" + rnd.nextInt(5), rnd.nextInt(300).toLong, i.toLong))
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3)).sortBy { case (s, i) => (-s, i) }
        .take(7).map(_._2).toList).toMap
    for (parts <- Seq(1, 17)) {
      val got = rows.toDF("g", "score", "id").repartition(parts)
        .groupBy("g").agg(expr("graft_topk(score, id, 7)").as("ids"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList)
        .toMap
      assert(got == want, s"mismatch at $parts partitions")
    }
  }

  test("Long.MinValue scores rank worst, not best (negation-overflow guard)") {
    import spark.implicits._
    TopKAgg.register(spark)
    // -Long.MinValue == Long.MinValue in two's complement, so an ordering
    // keyed on -score would rank MinValue as the BEST score; the explicit
    // comparator must rank it strictly worst
    val got = Seq(
      ("g", Long.MinValue, 1L), ("g", 0L, 2L),
      ("g", Long.MaxValue, 3L), ("g", -5L, 4L))
      .toDF("g", "score", "id").repartition(3)
      .groupBy("g").agg(expr("graft_topk(score, id, 3)").as("ids"))
      .collect().head.getSeq[Long](1).toList
    assert(got == List(3L, 2L, 4L), s"MinValue leaked into top-3: $got")
  }

  test("runs as a partial aggregate: only k-sized buffers cross the shuffle") {
    import spark.implicits._
    TopKAgg.register(spark)
    val df = (0 until 1000).map(i => ("g" + (i % 3), i.toLong, i.toLong))
      .toDF("g", "score", "id").repartition(8)
      .groupBy("g").agg(expr("graft_topk(score, id, 5)"))
    val plan = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate appears twice: partial before the exchange,
    // final after — the map-side combine that makes the op k-bounded
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final aggregate:\n$plan")
  }
}
