package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming as-of enrichment — the streaming spelling of
  * [[graft.relational.AsOfJoin.backward]]: every streaming row is joined to
  * the most recent STATIC reference row at or before its timestamp, per
  * key. (The reference engine has no streaming surface at all, and its
  * batch joins sync on exact timestamp equality only —
  * hybrid/src/combiner.rs; both directions of the batch as-of are already
  * beyond-parity, this carries the backward one onto an unbounded stream.)
  *
  * Spelling: the static side compiles ONCE into validity intervals
  * `[ts, next_ts)` with one batch `lead` window; the stream then joins
  * STATELESS per micro-batch on key equality + interval containment. No
  * streaming state, no watermark bookkeeping — the firehose-safe shape: a
  * stream-static join re-plans the dimension side each micro-batch (Spark
  * broadcasts it under the usual threshold) and buffers nothing across
  * batches. A stream-stream as-of would need per-key state bounded by a
  * watermark; when the reference data itself flows, window the stream and
  * use [[StreamingIngest.intervalJoin]] instead.
  *
  * Duplicate reference rows at one (key, ts) collapse to the payload-wise
  * GREATEST row first — the batch operator's documented tie rule, so
  * stream == batch holds even on tied inputs.
  *
  * Doubles as a streaming LOCF resample: stream the grid ticks and pass
  * the observations as `reference` — every tick receives the last
  * observation at or before it (StreamingAsOfSpec pins this against
  * [[graft.relational.Resample.interpolate]] in locf mode).
  *
  * Output: the stream's columns unchanged plus `r_<tsCol>` and `r_<payload>`
  * columns, null when no reference row precedes the event — the same
  * surface as the batch operator.
  */
object StreamingAsOf {

  def asofEnrich(events: DataFrame, reference: DataFrame, keys: Seq[String],
      tsCol: String): DataFrame = {
    require(keys.nonEmpty, "as-of enrichment needs at least one equality key")
    val rightPayload =
      reference.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    // tie collapse to the payload-wise greatest row (AsOfJoin's rule)
    val dedup = reference
      .groupBy((keys :+ tsCol).map(col): _*)
      .agg(max(struct(rightPayload.map(col): _*)).as("__p"))
    // validity intervals: a reference row answers queries in [ts, next_ts)
    // — one batch window on the dimension side, computed once per plan
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val intervals = dedup
      .withColumn("__ts_end", lead(col(tsCol), 1).over(w))
      .select(keys.map(c => col(c).as(s"__k_$c")) ++
        Seq(col(tsCol).as(s"r_$tsCol"), col("__ts_end")) ++
        rightPayload.map(c => col("__p").getField(c).as(s"r_$c")): _*)
    val cond =
      keys.map(c => events(c) === intervals(s"__k_$c")).reduce(_ && _) &&
        events(tsCol) >= intervals(s"r_$tsCol") &&
        (intervals("__ts_end").isNull || events(tsCol) < intervals("__ts_end"))
    events.join(intervals, cond, "left_outer")
      .select(events.columns.map(events(_)) ++
        Seq(intervals(s"r_$tsCol")) ++
        rightPayload.map(c => intervals(s"r_$c")): _*)
  }
}
