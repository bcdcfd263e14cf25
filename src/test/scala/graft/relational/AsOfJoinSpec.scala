package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of: latest at-or-before match per key, nulls when none") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3")) // key 2 has no right rows
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 1.0),
      (1L, ts("2024-01-01 10:00:00"), 2.0), // equal ts: inclusive match for l1
      (1L, ts("2024-01-01 11:59:59"), 3.0))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts")
      .select("lv", "r_rv").collect().map(r => (r.getString(0), r.get(1))).toMap
    assert(out("l1") == 2.0) // equal-ts right row matches (>= semantics)
    assert(out("l2") == 3.0) // latest of several
    assert(out("l3") == null) // no right rows for key 2
  }

  test("tolerance nulls out matches older than the window") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "ts", "lv")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 7.0)).toDF("k", "ts", "rv")
    val loose = AsOfJoin.backward(left, right, Seq("k"), "ts",
      tolerance = Some("INTERVAL 4 HOURS")).select("r_rv").head.get(0)
    assert(loose == 7.0)
    val tight = AsOfJoin.backward(left, right, Seq("k"), "ts",
      tolerance = Some("INTERVAL 1 HOUR")).select("r_rv").head.get(0)
    assert(tight == null)
  }

  test("null right payload values never stitch columns from different rows") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "ts", "lv")
    // the LATEST right row has a null payload: the match must still be that
    // row (null rv, its own tag), not the older row's rv with the newer tag
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5.0), "old"),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Double], "new"))
      .toDF("k", "ts", "rv", "tag")
    val row = AsOfJoin.backward(left, right, Seq("k"), "ts")
      .select("r_rv", "r_tag").head
    assert(row.isNullAt(0) && row.getString(1) == "new")
  }

  test("duplicate right rows at the same (key, ts) match deterministically") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "ts", "lv")
    // three right rows share the match timestamp with distinct payloads:
    // the documented rule is payload-wise greatest (struct order), no
    // matter how the union is partitioned or shuffled
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 2.0, "b"),
      (1L, ts("2024-01-01 11:00:00"), 9.0, "z"),
      (1L, ts("2024-01-01 11:00:00"), 2.0, "a"))
      .toDF("k", "ts", "rv", "tag")
    (1 to 4).foreach { n =>
      val row = AsOfJoin.backward(left, right.repartition(n), Seq("k"), "ts")
        .select("r_rv", "r_tag").head
      assert(row.getDouble(0) == 9.0 && row.getString(1) == "z",
        s"tie-break must be payload-wise max (repartition $n)")
      val fwd = AsOfJoin.forward(left.withColumn("ts", lit(ts("2024-01-01 10:00:00"))),
          right.repartition(n), Seq("k"), "ts")
        .select("r_rv", "r_tag").head
      assert(fwd.getDouble(0) == 9.0 && fwd.getString(1) == "z",
        s"forward tie-break must match the same rule (repartition $n)")
    }
  }

  test("forward as-of: earliest at-or-after match per key, tolerance ahead") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3")) // key 2 has no right rows
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0), // equal ts: inclusive for l1
      (1L, ts("2024-01-01 11:00:00"), 2.0),
      (1L, ts("2024-01-01 13:30:00"), 3.0))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.forward(left, right, Seq("k"), "ts")
      .select("lv", "r_rv").collect().map(r => (r.getString(0), r.get(1))).toMap
    assert(out("l1") == 1.0) // equal-ts right row matches (<= semantics)
    assert(out("l2") == 3.0) // earliest of those after
    assert(out("l3") == null)
    val tight = AsOfJoin.forward(left, right, Seq("k"), "ts",
      tolerance = Some("INTERVAL 1 HOUR"))
      .select("lv", "r_rv").collect().map(r => (r.getString(0), r.get(1))).toMap
    assert(tight("l1") == 1.0) // within the hour
    assert(tight("l2") == null) // 13:30 is 90 min ahead of 12:00
  }

  test("forward matches a reference model on a generated series") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val lrows = (0 until 200).map(i => (i % 5L, 1000L + rnd.nextInt(10000)))
    val rrows = (0 until 300).map(i => (i % 5L, 1000L + rnd.nextInt(10000)))
      .distinct // unique (k, ts) so the expected match is well-defined
    val base = ts("2024-01-01 00:00:00").getTime
    val left = lrows.map { case (k, t) =>
      (k, new java.sql.Timestamp(base + t * 1000), t)
    }.toDF("k", "ts", "lt")
    val right = rrows.map { case (k, t) =>
      (k, new java.sql.Timestamp(base + t * 1000), t)
    }.toDF("k", "ts", "rt")
    val got = AsOfJoin.forward(left, right, Seq("k"), "ts")
      .select("k", "lt", "r_rt").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSeq.sorted
    val byK = rrows.groupBy(_._1)
    val exp = lrows.map { case (k, t) =>
      val cands = byK.getOrElse(k, Nil).map(_._2).filter(_ >= t)
      ((k, t), if (cands.isEmpty) -1L else cands.min)
    }.sorted
    assert(got == exp)
  }

  test("matches DuckDB-style semantics on a generated series") {
    import spark.implicits._
    // driver-side reference: for each left (k, t), max right t' <= t per k
    val rnd = new scala.util.Random(7)
    val lrows = (0 until 200).map(i => (i % 5L, 1000L + rnd.nextInt(10000)))
    val rrows = (0 until 300).map(i => (i % 5L, 1000L + rnd.nextInt(10000)))
      .distinct // unique (k, ts) so the expected match is well-defined
    val left = lrows.map { case (k, t) => (k, ts("2024-01-01 00:00:00"), t) }
      .map { case (k, b, t) => (k, new java.sql.Timestamp(b.getTime + t * 1000), t) }
      .toDF("k", "ts", "lt")
    val right = rrows.map { case (k, t) =>
      (k, new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime + t * 1000), t)
    }.toDF("k", "ts", "rt")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts")
      .select("k", "lt", "r_rt").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSeq.sorted
    val byK = rrows.groupBy(_._1)
    val exp = lrows.map { case (k, t) =>
      val cands = byK.getOrElse(k, Nil).map(_._2).filter(_ <= t)
      ((k, t), if (cands.isEmpty) -1L else cands.max)
    }.sorted
    assert(got == exp)
  }
}
