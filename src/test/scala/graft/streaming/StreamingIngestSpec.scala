package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class StreamingIngestSpec extends SparkTestBase {

  test("streaming windowed agg over a file source equals the batch computation") {
    val src = java.nio.file.Files.createTempDirectory("graft-stream").toString
    // stage the sf0.001 events as the "landed" sensor files
    val batchRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batchRaw.write.mode("overwrite").parquet(src)

    val streamed = StreamingIngest.runAvailableNow(
      StreamingIngest.windowedAgg(
        StreamingIngest.readEvents(spark, src), "1 hour", "30 minutes"),
      "events_hourly")

    val batch = graft.T.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("id"), col("ts"), col("value"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
      .select(col("w.start").as("window_start"), col("id"), col("n"),
        col("sum_value"), col("lo"), col("hi"))

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().toSeq
        .map(r => Seq(r.get(0), r.get(1), r.get(2),
          f"${r.getDouble(3)}%.6f", r.get(4), r.get(5)).mkString("|"))
        .sorted

    val s = canon(streamed)
    val b = canon(batch)
    assert(s.nonEmpty && s == b,
      s"stream rows=${s.size} batch rows=${b.size}")
  }
}
