package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted inverted-index BM25 serving (q120): index-served scores must
  * equal the direct from-corpus computation, and the index must survive a
  * reload round-trip. */
class TextIndexSpec extends SparkTestBase {

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("index-served BM25 equals the direct computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("join", "window", "hash", "scan", "sort", "merge",
      "x", "y", "z")
    val docs = (0L until 300L).map { i =>
      (i, (0 until 2 + rnd.nextInt(25))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val terms = Seq("join", "sort", "merge", "scan")
    val path = tmpDir("textidx")
    TextIndex.buildIndex(docs, "doc_id", "text", path, nBuckets = 16)

    // the two paths type tf/dl differently (map-side size() = int vs
    // aggregated count() = long) — normalize before comparing
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("term"), col("rank").cast("long"), col("doc_id"),
        col("tf").cast("long"), col("dl").cast("long"), col("score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val direct = canon(
      TextOps.bm25TermTopK(docs, "doc_id", "text", terms, topK = 5))
    val served = canon(
      TextIndex.bm25FromIndex(spark, path, terms, topK = 5))
    assert(served == direct)
  }

  test("meta round-trip and missing-term serving") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a a b")).toDF("doc_id", "text")
    val path = tmpDir("textidx2")
    TextIndex.buildIndex(docs, "doc_id", "text", path, nBuckets = 4)
    val (nb, nd, tl) = TextIndex.readMeta(spark, path)
    assert(nb == 4 && nd == 2 && tl == 6)
    // a term absent from the corpus contributes no rows (and no failure)
    val out = TextIndex.bm25FromIndex(spark, path, Seq("zz", "a"), topK = 3)
      .collect()
    assert(out.forall(_.getString(0) == "a") && out.length == 2)
  }
}
