package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming admission control == the greedy (batch, seq)-ordered fold,
  * across micro-batch boundaries and mid-batch budget crossings. */
class StreamingMixtureSpec extends SparkTestBase {

  test("stream admits exactly the reference prefix across micro-batches") {
    import spark.implicits._
    // batch 1: web crosses its budget mid-batch; code stays under
    val b1 = Seq((1L, "web", 40L), (2L, "web", 50L), (3L, "web", 30L),
      (4L, "code", 10L), (5L, "news", 99L))
    // batch 2: web already exhausted; code crosses; news has no budget
    val b2 = Seq((6L, "web", 5L), (7L, "code", 25L), (8L, "code", 7L),
      (9L, "news", 1L))
    val budgets = Map("web" -> 80L, "code" -> 30L)

    val tmp = java.nio.file.Files.createTempDirectory("graft-smix")
    val src = tmp.resolve("src")
    b1.toDF("doc_id", "stratum", "n_tok").coalesce(1)
      .write.parquet(src.resolve("f1").toString)
    b2.toDF("doc_id", "stratum", "n_tok").coalesce(1)
      .write.parquet(src.resolve("f2").toString)

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("stratum", StringType), StructField("n_tok", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(src.toString + "/*")
      .withColumn("seq", org.apache.spark.sql.functions.col("doc_id"))
    val admitted = StreamingMixture.admissionControl(stream, budgets)
    val q = admitted.writeStream.format("memory").queryName("smix")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("smix").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val exp = StreamingMixture.referenceFold(Seq(b1, b2), budgets)
      .map(a => (a.doc_id, a.stratum, a.n_tok, a.cum_tok)).toSet
    assert(got == exp)
    // semantic pins: web admits 1, 2 (40, 90 — crossing doc kept), not 3/6
    assert(got.map(_._1).intersect(Set(1L, 2L)) == Set(1L, 2L))
    assert(!got.map(_._1).contains(3L) && !got.map(_._1).contains(6L))
    // code admits 4 (batch 1) and 7 (crossing in batch 2), not 8
    assert(got.map(_._1).intersect(Set(4L, 7L)) == Set(4L, 7L))
    assert(!got.map(_._1).contains(8L))
    // news has no budget: nothing admitted
    assert(!got.exists(_._2 == "news"))
  }
}
