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
    val iv = intervals.withColumn(pb, explode(sequence(
      floor(unix_micros(col(startCol)) / bUs),
      floor(unix_micros(col(endCol)) / bUs))))
    // a point meets each covering interval in exactly ONE bucket (its own),
    // so the equi-join emits no duplicates to dedup
    p.join(iv, keys :+ pb)
      .filter(col(startCol) <= col(tsCol) && col(tsCol) < col(endCol))
      .drop(pb)
  }
}
