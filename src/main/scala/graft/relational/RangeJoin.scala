package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — points matched to the intervals containing them
  * (`start <= ts < end`, per key). Alongside [[AsOfJoin]], the second
  * time-series operator the brief names that Spark lacks natively.
  *
  * Spelling: BUCKETIZE time. Each interval explodes into the coarse
  * buckets it covers, each point maps to its one bucket, and the match is
  * an equi-join on (keys…, bucket) followed by the exact range filter —
  * candidates are bounded by per-bucket occupancy, never the |points| ×
  * |intervals| cross product a raw inequality join degenerates to (Spark
  * plans `a.key = b.key AND a.ts BETWEEN …` as a join with the range as a
  * post-condition on the KEY join only — fine per key, but with hot keys
  * or no keys it explodes; bucketing bounds it by time locality instead).
  *
  * `bucketSeconds` trades explode factor against bucket occupancy: ~the
  * typical interval length is right (each interval lands in ≤ 2 buckets).
  * Both inputs shuffle once, on (keys…, bucket).
  */
object RangeJoin {

  /** Inner join of `points` to every containing interval. Output: all
    * point columns plus all interval columns (column names must not
    * collide apart from `keys`; interval keys are dropped). Containment is
    * closed-open: `startCol <= tsCol < endCol`. */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bUs = bucketSeconds * 1000000L
    val pb = "__range_pb"
    val p = points.withColumn(pb, floor(unix_micros(col(tsCol)) / bUs))
    // degenerate guard: an empty/inverted window ([s,s) or end < start)
    // matches nothing under half-open containment — and Spark's
    // sequence(start, stop) silently generates a DESCENDING range for
    // stop < start, so an inverted interval would explode spurious bucket
    // rows instead of zero. Filter before exploding.
    val iv = intervals.filter(col(startCol) < col(endCol))
      .withColumn(pb, explode(sequence(
        floor(unix_micros(col(startCol)) / bUs),
        floor(unix_micros(col(endCol)) / bUs))))
    // a point meets each covering interval in exactly ONE bucket (its own),
    // so the equi-join emits no duplicates to dedup
    p.join(iv, keys :+ pb)
      .filter(col(startCol) <= col(tsCol) && col(tsCol) < col(endCol))
      .drop(pb)
  }

  /** Interval×interval OVERLAP join: pairs whose half-open windows
    * intersect (`ls < re && rs < le`), per key — the third temporal-join
    * shape (sessions × outage windows, exposure × campaign flights).
    *
    * Same bucketized discipline: both sides explode into the coarse
    * buckets they cover and match on (keys…, bucket). An overlapping pair
    * shares EVERY bucket its intersection covers, so each pair is emitted
    * exactly once via the standard first-common-bucket rule: keep the
    * match only in the bucket containing `greatest(ls, rs)` — the
    * intersection's start — instead of a dedup shuffle over the pair set.
    * Candidates stay bounded by per-bucket occupancy; a raw inequality
    * join is the |L|×|R| cliff on hot keys. */
  def intervalOverlapPairs(left: DataFrame, right: DataFrame,
      keys: Seq[String], lStart: String, lEnd: String,
      rStart: String, rEnd: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bUs = bucketSeconds * 1000000L
    val pb = "__range_pb"
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame =
      // half-open [s, e): the bucket of e is touched only when e is not
      // exactly on the boundary — hence the e−1µs upper bound. The
      // s < e guard makes empty ([s,s)) and inverted (e < s) windows match
      // nothing, consistent with pointsInIntervals — without it the pair
      // filter `ls < re && rs < le` can pass for an empty window, and
      // sequence() silently DESCENDS for e−1µs < s, exploding spurious
      // bucket rows.
      df.filter(col(s) < col(e)).withColumn(pb, explode(sequence(
        floor(unix_micros(col(s)) / bUs),
        floor((unix_micros(col(e)) - 1) / bUs))))
    val l = explodeBuckets(left, lStart, lEnd)
    val r = explodeBuckets(right, rStart, rEnd)
    l.join(r, keys :+ pb)
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col(pb) ===
        floor(greatest(unix_micros(col(lStart)), unix_micros(col(rStart))) / bUs))
      .drop(pb)
  }
}
