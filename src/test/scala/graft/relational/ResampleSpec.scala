package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkTestBase {

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000) // micros → ms

  private val step = 10L * 1000000 // 10-second grid, micros

  test("interior grid points interpolate linearly; exact hits return the observation") {
    import spark.implicits._
    // key "a": observations at 5s→10.0 and 25s→50.0; grid at 10s and 20s.
    // 10s: 10 + (50-10) * (10-5)/(25-5) = 20.0; 20s: 10 + 40*(15/20) = 40.0
    // key "b": observation exactly ON the 40s grid point.
    val df = Seq(
      ("a", 5L, 10.0), ("a", 25L, 50.0),
      ("b", 40L, 7.5), ("b", 41L, 100.0))
      .map { case (k, sec, v) => (k, ts(sec * 1000000), v) }
      .toDF("k", "ts", "v")
    val out = Resample.interpolate(df, Seq("k"), "ts", "v", step)
      .orderBy("k", "gus").collect()
      .map(r => (r.getString(0), r.getLong(1) / 1000000, r.getDouble(2)))
    assert(out.toSeq == Seq(("a", 10L, 20.0), ("a", 20L, 40.0), ("b", 40L, 7.5)))
  }

  test("span shorter than one step yields an empty grid, not a descending sequence") {
    import spark.implicits._
    // both observations inside (40s, 50s): ceil-div start 5 > floor-div end 4
    val df = Seq(("a", 41L, 1.0), ("a", 43L, 2.0))
      .map { case (k, sec, v) => (k, ts(sec * 1000000), v) }
      .toDF("k", "ts", "v")
    assert(Resample.interpolate(df, Seq("k"), "ts", "v", step).isEmpty)
  }

  test("duplicate observations at one timestamp collapse to their minimum") {
    import spark.implicits._
    val df = Seq(("a", 10L, 9.0), ("a", 10L, 3.0), ("a", 30L, 3.0))
      .map { case (k, sec, v) => (k, ts(sec * 1000000), v) }
      .toDF("k", "ts", "v")
    val out = Resample.interpolate(df, Seq("k"), "ts", "v", step)
      .orderBy("gus").collect().map(r => (r.getLong(1) / 1000000, r.getDouble(2)))
    // 10s: exact hit → min(9,3) = 3; 20s: flat series stays 3; 30s: 3
    assert(out.toSeq == Seq((10L, 3.0), (20L, 3.0), (30L, 3.0)))
  }

  test("locf carries the last observation; nearest picks the closer neighbor") {
    import spark.implicits._
    // observations at 5s→10.0 and 25s→50.0; grid at 10s and 20s
    val df = Seq(("a", 5L, 10.0), ("a", 25L, 50.0))
      .map { case (k, sec, v) => (k, ts(sec * 1000000), v) }
      .toDF("k", "ts", "v")
    def run(mode: String) =
      Resample.interpolate(df, Seq("k"), "ts", "v", step, mode)
        .orderBy("gus").collect().map(r => (r.getLong(1) / 1000000, r.getDouble(2)))
        .toSeq
    assert(run("locf") == Seq((10L, 10.0), (20L, 10.0)))
    // 10s is 5s from prev, 15s from next → prev; 20s is 15s vs 5s → next
    assert(run("nearest") == Seq((10L, 10.0), (20L, 50.0)))
    // exact tie: obs at 10s and 30s, grid at 20s → the earlier one
    val tie = Seq(("a", 10L, 1.0), ("a", 30L, 2.0))
      .map { case (k, sec, v) => (k, ts(sec * 1000000), v) }
      .toDF("k", "ts", "v")
    val near = Resample.interpolate(tie, Seq("k"), "ts", "v", step, "nearest")
      .orderBy("gus").collect().map(r => (r.getLong(1) / 1000000, r.getDouble(2)))
    assert(near.toSeq == Seq((10L, 1.0), (20L, 1.0), (30L, 2.0)))
    // locf plans a single Window node (no descending pass at all)
    val locfPlan = Resample.interpolate(df, Seq("k"), "ts", "v", step, "locf")
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(locfPlan).size == 1, locfPlan)
  }

  test("matches a reference model on a randomized irregular series") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val obs = (0 until 400).map { i =>
      (i % 3L, (1000 + rnd.nextInt(100000)).toLong, rnd.nextDouble() * 100)
    }.distinct
    val df = obs.map { case (k, sec, v) => (k, ts(sec * 1000000), v) }
      .toDF("k", "ts", "v")
    val got = Resample.interpolate(df, Seq("k"), "ts", "v", step)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // reference: per key, dedup-to-min per second, then interpolate per grid pt
    val byK = obs.groupBy(_._1).map { case (k, rows) =>
      k -> rows.groupBy(_._2).map { case (s, vs) => (s * 1000000, vs.map(_._3).min) }
        .toSeq.sortBy(_._1)
    }
    var n = 0
    byK.foreach { case (k, series) =>
      val lo = series.head._1; val hi = series.last._1
      var b = (lo + step - 1) / step
      while (b * step <= hi) {
        val g = b * step
        val (pus, pv) = series.filter(_._1 <= g).last
        val (nus, nv) = series.find(_._1 >= g).get
        val exp = if (nus == pus) pv
          else pv + (nv - pv) * ((g - pus).toDouble / (nus - pus).toDouble)
        assert(got((k, g)) == exp, s"key $k grid $g")
        n += 1; b += 1
      }
    }
    assert(got.size == n) // no extra grid points beyond the reference's
    assert(n > 100) // the series actually exercised interpolation
  }

  test("long spans produce the full grid through chunked generation") {
    import spark.implicits._
    // 10k-bucket span (> the 4096 grid chunk): two observations 10^5 s
    // apart on a 10 s grid → 10_001 grid points, values strictly linear
    val df = Seq(("a", 0L, 0.0), ("a", 100000L, 100000.0))
      .map { case (k, sec, v) => (k, ts(sec * 1000000), v) }
      .toDF("k", "ts", "v")
    val out = Resample.interpolate(df, Seq("k"), "ts", "v", step)
    assert(out.count() == 10001L)
    val probe = out.filter(col("gus").isin(0L, 50000L * 1000000, 100000L * 1000000))
      .orderBy("gus").collect().map(r => r.getDouble(2))
    assert(probe.toSeq == Seq(0.0, 50000.0, 100000.0))
  }

  test("plan: no cartesian product; both neighbor windows share one partitioning") {
    import spark.implicits._
    val df = (0 until 50).map(i => ("k" + i % 3, ts(i * 7L * 1000000), i * 1.0))
      .toDF("k", "ts", "v")
    val out = Resample.interpolate(df, Seq("k"), "ts", "v", step)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the descending (next-neighbor) window must ride the ascending
    // window's partitioning: in the printed tree the outer Window's section
    // runs until the inner Window appears, and that span must re-SORT but
    // not re-shuffle — an Exchange there would mean each direction pays its
    // own shuffle
    val w1 = plan.indexOf("Window")
    val w2 = plan.indexOf("Window", w1 + 1)
    assert(w1 >= 0 && w2 > w1, s"expected two Window nodes:\n$plan")
    val between = plan.substring(w1, w2)
    assert(between.contains("Sort"), plan)
    assert(!between.contains("Exchange"), s"window pair re-shuffled:\n$plan")
  }
}
