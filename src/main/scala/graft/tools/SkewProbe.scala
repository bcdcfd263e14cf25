package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-stress probe (diagnostic, not part of the catalog): times the
  * temporal-join family against an events table where HALF of all rows
  * carry one hot user_id — the "one celebrity key" shape that turns a
  * naive per-key join quadratic. Reports wall time uniform vs skewed and
  * whether AQE's skew-join mitigation fired. Findings land in STATUS.md;
  * run with `runMain graft.tools.SkewProbe <sfDir>`. */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.T.events(spark, dir).localCheckpoint()
    // 50% of rows collapse onto user 1 — deterministic via event_id parity
    val skewed = ev.withColumn("user_id",
      when(pmod(col("event_id"), lit(2)) === 0, lit(1L))
        .otherwise(col("user_id"))).localCheckpoint()

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    def rangeJoin(e: DataFrame): Long = {
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("vid"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("ws"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("we"),
          col("event_id").as("erid"))
      graft.relational.RangeJoin.pointsInIntervals(views, errors,
        Seq("user_id"), "ts", "ws", "we", 1800L).count()
    }
    def overlapJoin(e: DataFrame): Long = {
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("ls"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("le"),
          col("event_id").as("lid"))
      val r = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("rs"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("re"),
          col("event_id").as("rid"))
      graft.relational.RangeJoin.intervalOverlapPairs(v, r, Seq("user_id"),
        "ls", "le", "rs", "re", 1800L).count()
    }
    def sessionize(e: DataFrame): Long = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      e.withColumn("gap",
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
        .withColumn("newS",
          (col("gap").isNull || col("gap") > 1800L * 1000000L).cast("long"))
        .withColumn("sid", sum("newS").over(
          Window.partitionBy("user_id").orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid").agg(count(lit(1)))
        .count()
    }
    def sessionizeSalted(e: DataFrame): Long =
      graft.relational.Sessionize.assign(
          e.select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id")),
          "user_id", "us", "event_id",
          gapUs = 1800L * 1000000, saltRangeUs = 6L * 3600 * 1000000)
        .groupBy("user_id", "sess").agg(count(lit(1)))
        .count()
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      time("range join, uniform")(rangeJoin(ev))
      time("range join, 50% hot key")(rangeJoin(skewed))
      time("overlap join, uniform")(overlapJoin(ev))
      time("overlap join, 50% hot key")(overlapJoin(skewed))
      time("sessionize window, uniform")(sessionize(ev))
      time("sessionize window, 50% hot key")(sessionize(skewed))
      time("sessionize salted, uniform")(sessionizeSalted(ev))
      time("sessionize salted, 50% hot key")(sessionizeSalted(skewed))
    }
    // the cure's partition bound: biggest per-(user, salt) slice vs the
    // hot user's whole history
    val hot = skewed.filter(col("user_id") === 1L).count()
    val biggest = skewed
      .withColumn("salt", floor(unix_micros(col("ts")) / (6L * 3600 * 1000000)))
      .groupBy("user_id", "salt").count().agg(max("count")).head.getLong(0)
    println(s"hot-user history=$hot  biggest (user,salt) partition=$biggest")
    spark.stop()
  }
}
