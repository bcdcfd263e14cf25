package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Resampling — irregular time series projected onto a regular grid with
  * linear interpolation between the surrounding observations. The classic
  * downsample/align primitive of a time-series engine (the reference only
  * aggregates into coarse buckets via its windowed-agg pushdown,
  * hybrid/src/timeseries_database/opcua_history_read.rs:205-247; it cannot
  * produce values BETWEEN observations), and the precursor to
  * exact-timestamp joins across series that tick at different rates.
  *
  * Spelling: per key, the grid points (one per `stepMicros` inside the
  * observed span) UNION with the observations into one frame; two windows
  * over the SAME partitioning — ascending for the previous observation,
  * descending for the next — carry (ts, value) to every grid row, and the
  * value interpolates linearly. Catalyst plans both windows over one
  * exchange (same partition keys), so the whole operator costs ONE shuffle
  * of |observations| + |grid| rows; no join, no per-key collect. Grid rows
  * are generated from a per-key span aggregate (`sequence` + `explode`) —
  * output-sized, never a cross join against a calendar table.
  */
object Resample {

  /** Max grid points generated per exploded array (see the two-level
    * explode in [[interpolate]]). */
  private val gridChunk = 4096L

  /** Resampled values of `valCol` at every multiple of `stepMicros` inside
    * each key's observed time span.
    *
    * Output: the key columns, `gus` (grid timestamp, epoch micros), `v`
    * (resampled value, double). Duplicate observations at one (key,
    * timestamp) collapse to their minimum value first (order-insensitive,
    * so results are deterministic). A grid point that lands exactly on an
    * observation returns that observation's value. Interior points depend
    * on `mode`, for surrounding observations (pus, pv) and (nus, nv):
    *  - `"linear"`  — `pv + (nv - pv) * (gus - pus) / (nus - pus)`;
    *  - `"locf"`    — `pv` (last observation carried forward; skips the
    *    descending window entirely, so it's the cheapest mode);
    *  - `"nearest"` — whichever observation is closer in time, the earlier
    *    one on an exact tie.
    * Keys whose span contains no grid point produce no rows.
    */
  def interpolate(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, stepMicros: Long, mode: String = "linear"): DataFrame = {
    require(keys.nonEmpty, "resample needs at least one series key")
    require(stepMicros > 0, "stepMicros must be positive")
    require(Seq("linear", "locf", "nearest").contains(mode),
      s"unknown resample mode '$mode' (linear | locf | nearest)")
    val kCols = keys.map(col)
    val obs = df
      .select(kCols :+ unix_micros(col(tsCol)).as("us") :+ col(valCol).as("v"): _*)
      .groupBy((kCols :+ col("us")): _*).agg(min(col("v")).as("v"))
    // ceil-div for the first bucket, floor-div for the last: every grid
    // point sits INSIDE [min(us), max(us)], so both neighbors always exist.
    // b0 > b1 (span shorter than one step) must yield an EMPTY grid —
    // unguarded, sequence(b0, b1) would count DOWNWARD.
    val span = obs.groupBy(kCols: _*)
      .agg(expr(s"(min(us) + ${stepMicros - 1}) DIV $stepMicros").as("b0"),
        expr(s"max(us) DIV $stepMicros").as("b1"))
      .filter(col("b0") <= col("b1"))
    // two-level explode: chunk starts first, then at most `gridChunk`
    // buckets per chunk. A fine grid over a long span (a year at 1 s is
    // ~31M points) must never materialize one array of every bucket per
    // key — sequence() builds the whole array in memory before exploding.
    val chunks = span
      .select(kCols ++ Seq(col("b0"), col("b1"),
        explode(sequence(lit(0L),
          expr(s"(b1 - b0) DIV $gridChunk"))).as("ci")): _*)
    val lo = col("b0") + col("ci") * gridChunk
    val hi = least(col("b0") + (col("ci") + 1) * gridChunk - 1, col("b1"))
    val grid = chunks
      .select(kCols :+ explode(sequence(lo, hi)).as("b"): _*)
      .select(kCols :+ (col("b") * stepMicros).as("us"): _*)
    val side = "__rs_side" // 0 = observation, 1 = grid point
    val u = obs.select(kCols ++ Seq(col("us"), lit(0).as(side),
        col("us").as("ous"), col("v")): _*)
      .unionByName(grid.select(kCols ++ Seq(col("us"), lit(1).as(side),
        lit(null).cast("long").as("ous"), lit(null).cast(DoubleType).as("v")): _*))
    // same partitioning for both windows → Catalyst reuses one exchange.
    // Observations sort before grid rows at an equal timestamp in BOTH
    // directions (side ascending), so an exact hit is its own neighbor.
    val wPrev = Window.partitionBy(kCols: _*)
      .orderBy(col("us").asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(kCols: _*)
      .orderBy(col("us").desc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ous and v are null/non-null together (both come from the same
    // observation row), so per-column last(ignoreNulls) cannot stitch
    // values from different observations
    val prev = u
      .withColumn("pus", last(col("ous"), ignoreNulls = true).over(wPrev))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
    val carried =
      if (mode == "locf") prev
      else prev
        .withColumn("nus", last(col("ous"), ignoreNulls = true).over(wNext))
        .withColumn("nv", last(col("v"), ignoreNulls = true).over(wNext))
    val value = mode match {
      case "locf" => col("pv")
      case "nearest" =>
        when(col("us") - col("pus") <= col("nus") - col("us"), col("pv"))
          .otherwise(col("nv"))
      case _ =>
        val ratio = (col("us") - col("pus")).cast(DoubleType) /
          (col("nus") - col("pus")).cast(DoubleType)
        when(col("nus") === col("pus"), col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) * ratio)
    }
    carried.filter(col(side) === 1)
      .select(kCols ++ Seq(col("us").as("gus"), value.as("v")): _*)
  }
}
