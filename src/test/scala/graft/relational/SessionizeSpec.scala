package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-range-salted sessionization: bit-identical to the plain per-user
  * window (the q64 oracle shape) while bounding window partitions under
  * hot keys. */
class SessionizeSpec extends SparkTestBase {

  private val gapUs = 1800L * 1000000 // 30 min
  private val saltUs = 6L * 3600 * 1000000 // 6 h

  /** The unsalted reference: the exact q64 oracle spelling. */
  private def reference(e: DataFrame): Map[(Long, Long), (Long, Long, Long)] = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs ||
          lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(run))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n"), min("us").as("a"), max("us").as("b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
  }

  private def salted(e: DataFrame): Map[(Long, Long), (Long, Long, Long)] =
    Sessionize.assign(e, "user_id", "us", "event_id", gapUs, saltUs)
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n"), min("us").as("a"), max("us").as("b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("sessions spanning salt boundaries stitch into one id, chains included") {
    import spark.implicits._
    val h = 3600L * 1000000
    // user 1: continuous activity every 20 min across 4 salt ranges — ONE
    // session spanning 3 boundary merges (the chain case); user 2: two
    // bursts with a >30min hole exactly on a boundary; user 3: single event
    val u1 = (0 until 72).map(i => (1L, i * 20L * 60 * 1000000, 100L + i))
    val u2 = Seq((2L, 5L * h, 200L), (2L, 5L * h + gapUs, 201L),
      (2L, 6L * h + gapUs + 1, 202L)) // 6h boundary, gap just over 30 min
    val u3 = Seq((3L, 50L * h, 300L))
    val e = (u1 ++ u2 ++ u3).toDF("user_id", "us", "event_id")
    val got = salted(e)
    assert(got == reference(e))
    // the chain really is one session
    assert(got.keys.count(_._1 == 1L) == 1)
    // the boundary hole really splits: merge rule is <= gap, this is gap+1
    assert(got.keys.count(_._1 == 2L) == 2)
  }

  test("gap exactly at the threshold merges across a boundary (<= rule)") {
    import spark.implicits._
    val b = saltUs // first event of range 1 lands exactly on the boundary
    val e = Seq((1L, b - 1, 10L), (1L, b - 1 + gapUs, 11L))
      .toDF("user_id", "us", "event_id")
    // us diff == gapUs: the window rule `diff > gap` does NOT break, so the
    // two events are one session; the stitch must agree
    val got = salted(e)
    assert(got == reference(e))
    assert(got.size == 1)
  }

  test("random corpus with a 50% hot key: bit-identical numbering, bounded partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 4000).map { i =>
      val user = if (i % 2 == 0) 1L else 2L + rnd.nextInt(20)
      // 10 days of microsecond timestamps, bursty
      (user, rnd.nextLong(10L * 24 * 3600 * 1000000), i.toLong)
    }
    val e = rows.toDF("user_id", "us", "event_id")
    assert(salted(e) == reference(e))
    // the skew cure itself: the biggest (user, salt) window partition is
    // a fraction of the hot user's history (2000 events over 40 ranges)
    val biggest = e.withColumn("salt", floor(col("us") / saltUs))
      .groupBy("user_id", "salt").count()
      .agg(max("count")).head.getLong(0)
    assert(biggest < 2000 / 4,
      s"salting did not bound the hot user's partition: $biggest")
  }
}
