package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming sensor ingest (beyond-reference north star — the
  * reference is batch-only, SURVEY §2.8): file-source stream of events
  * → watermark → tumbling-window aggregates. The same transform runs on a
  * live directory (micro-batches as sensors land files) or catch-up style
  * with Trigger.AvailableNow.
  */
object StreamingIngest {

  /** Raw events schema as stored (ts is TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark surfaces as TIMESTAMP_NTZ). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming read of an events directory → typed TS frame (id, ts, value).
    * The NTZ→TZ cast is a numeric identity under the UTC session timezone. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(rawSchema).parquet(dir)
      .select(col("event_type").as("id"),
        col("ts").cast(TimestampType).as("ts"),
        col("value"))

  /** Tumbling-window per-series aggregates with late-data handling: the
    * watermark bounds state so the query runs indefinitely at fleet scale
    * (state is per (window, id), pruned as the watermark advances). */
  def windowedAgg(events: DataFrame, windowDur: String = "1 hour",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur).as("w"), col("id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
      .select(col("w.start").as("window_start"), col("id"), col("n"),
        col("sum_value"), col("lo"), col("hi"))

  /** Gap-based session windows over the stream — the streaming spelling of
    * the batch sessionization entry (q64): sessions close when a series is
    * idle past `gap`, state is merged per (id, session) and pruned by the
    * watermark, so the query runs unbounded. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("id"), col("n"), col("sum_value"))

  /** Stream-static hybrid join: the streaming TS frame enriched against the
    * static graph's sensor metadata (sensor → hasTimeseries → series →
    * hasExternalId → external id, the reference's hybrid vocabulary). The
    * static side is broadcast — a stream-static join keeps NO streaming
    * state, so this scales to an unbounded firehose with the dimension side
    * re-read per micro-batch (metadata updates picked up for free). This is
    * the streaming spelling of the engine's static×TS hybrid join: the
    * output carries the graph entity (`sensor`) next to every point. */
  def enrichWithSensors(events: DataFrame,
      graph: graft.graph.TriplesGraph): DataFrame = {
    val hasTs = graph.slice(graft.rdf.Otit.hasTimeseries).get.df
      .select(col("s").as("sensor"), col("o").as("series"))
    val extId = graph.slice(graft.rdf.Otit.hasExternalId).get.df
      .select(col("s").as("series2"), col("o").cast(StringType).as("id"))
    val meta = hasTs.join(extId, col("series") === col("series2"))
      .select(col("sensor"), col("id"))
    events.join(broadcast(meta), "id")
  }

  /** Stream-stream interval join: two event streams matched per series
    * within a bounded time distance — "pair every reading with the control
    * signal that arrived within `interval` before it". Both sides carry
    * watermarks and the join condition bounds the event-time distance, so
    * Spark can prove when a row can no longer match and DROP its state —
    * the unbounded-firehose-safe shape (an unconstrained stream-stream
    * equi-join would buffer both streams forever). Inner join on the
    * series id + the time interval; output carries both timestamps so the
    * spec can check the pairing against the batch join. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      interval: String = "10 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
      .select(col("id"), col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermarkDelay)
      .select(col("id").as("r_id"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    l.join(r,
      col("id") === col("r_id") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $interval") &&
        col("r_ts") <= col("l_ts"))
      .select(col("id"), col("l_ts"), col("l_value"), col("r_ts"), col("r_value"))
  }

  /** Drain all currently-available input into an in-memory table and return
    * the result (test/backfill entry point). Aggregations use the default
    * "complete" mode; joins need "append" (inner stream-stream joins emit
    * on match, so AvailableNow drains every pair). */
  def runAvailableNow(agg: DataFrame, name: String,
      mode: String = "complete"): DataFrame = {
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    agg.sparkSession.table(name)
  }
}
