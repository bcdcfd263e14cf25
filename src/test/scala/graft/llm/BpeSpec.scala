package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE tokenizer: hand-checkable training fixture, reconstruction and
  * monotonicity properties of the greedy encoder, and determinism. */
class BpeSpec extends SparkTestBase {

  test("train learns the hand-computable merges on a tiny corpus") {
    import spark.implicits._
    // "low lower lowest low low": 'l o' (5) and 'o w' (5) tie on count →
    // lexicographic pick 'l o' first, then 'lo w' (5), then 'low </w>' (3)
    val docs = Seq((1L, "low lower lowest low low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 3)
    assert(merges == Seq("l" -> "o", "lo" -> "w", "low" -> "</w>"))
  }

  test("greedy encode reconstructs the word and respects merge ranks") {
    val ranks = Seq("l" -> "o", "lo" -> "w", "low" -> "</w>", "e" -> "r")
      .zipWithIndex.toMap
    assert(Bpe.encodeWord("low", ranks) == Seq("low</w>"))
    assert(Bpe.encodeWord("lower", ranks) == Seq("low", "er", "</w>"))
    // reconstruction: concatenated tokens spell word + end marker
    for (w <- Seq("lowest", "slow", "zzz", "l")) {
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString == w + Bpe.EndOfWord)
    }
  }

  test("each trained merge weakly shrinks the encoded corpus") {
    val docs = graft.T.documents(spark, "/root/testdata/sf0.001").limit(100)
      .localCheckpoint()
    val merges = Bpe.train(docs, "text", 12)
    assert(merges.length == 12)
    def corpusTokens(n: Int): Long =
      Bpe.encode(docs, "doc_id", "text", merges.take(n))
        .select(sum(size(col("tokens")))).head.getLong(0)
    val counts = (0 to 12 by 4).map(corpusTokens)
    assert(counts == counts.sorted.reverse, s"not weakly decreasing: $counts")
    assert(counts.last < counts.head)
  }

  test("training is deterministic and single-pass count matches a fold") {
    val docs = graft.T.documents(spark, "/root/testdata/sf0.001").limit(60)
      .localCheckpoint()
    val a = Bpe.train(docs, "text", 8)
    val b = Bpe.train(docs.repartition(5), "text", 8)
    assert(a == b)
    // singlePassTokenCount == a plain driver-side replace fold
    val got = Bpe.singlePassTokenCount(docs, "doc_id", "text", a)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = docs.select("doc_id", "text").collect().map { r =>
      var s = Bpe.wrapText(r.getString(1))
      a.foreach { case (x, y) =>
        s = s.replace(Bpe.wrap(x) + Bpe.wrap(y), Bpe.wrap(x + y)) }
      r.getLong(0) -> s.count(_ == '\u0001').toLong
    }.toMap
    assert(got == ref)
  }
}
