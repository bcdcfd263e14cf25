package graft.llm

import graft.SparkTestBase

/** Bigram-LM quality scoring (q117): reference-model equality and the
  * integer-sum determinism contract. */
class LmQualitySpec extends SparkTestBase {

  test("bigram LM scores match a driver-side reference model") {
    import spark.implicits._
    val corpus = Map(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat",
      3L -> "zq zq zq",
      4L -> "one",                 // < 2 tokens: no row
      5L -> "the mat the cat")
    val docs = corpus.toSeq.toDF("doc_id", "text")
    val got = TextOps.bigramLmDocScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

    // reference: plain Scala, same formula, same scaled-long rounding
    val toks = corpus.view.mapValues(_.split(" ").toSeq).toMap
    val uni = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val vsz = uni.size
    val bigrams = toks.view.mapValues(ts => ts.zip(ts.tail)).toMap
    val bc = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    for ((id, bs) <- bigrams if bs.nonEmpty) {
      val terms = bs.map { case (w1, w2) =>
        math.round(math.log((bc((w1, w2)) + 1.0) / (uni(w1) + vsz)) * 1e6)
      }
      val want = BigDecimal(terms.sum.toDouble / (1e6 * terms.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (n, score) = got(id)
      assert(n == bs.size, s"bigram count mismatch for doc $id")
      assert(math.abs(score - want) < 1e-9, s"score mismatch for doc $id")
    }
    assert(!got.contains(4L))
    assert(got.size == 4)
  }

  test("repeated boilerplate scores higher than shuffled word salad") {
    import spark.implicits._
    // 20 identical template docs + 20 unique-word docs: the LM assigns the
    // template's bigrams high counts, so its mean log-prob must exceed the
    // word salad's (the quality-filter signal this op exists to compute)
    val template = (1L to 20L).map(i => (i, "click here to subscribe now"))
    val salad = (21L to 40L).map(i =>
      (i, (0 until 5).map(j => s"w${i}_$j").mkString(" ")))
    val docs = (template ++ salad).toDF("doc_id", "text")
    val scores = TextOps.bigramLmDocScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val tAvg = template.map(t => scores(t._1)).sum / template.size
    val sAvg = salad.map(t => scores(t._1)).sum / salad.size
    assert(tAvg > sAvg,
      s"template docs should outscore word salad ($tAvg vs $sAvg)")
  }

  test("the corpus-sized bigram stream joins exactly ONCE (r16: the " +
      "count tables merge into a per-bigram score table first)") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, "a b c a b")).toDF("doc_id", "text")
    val df = TextOps.bigramLmDocScores(docs, "doc_id", "text")
    // in the optimized plan only the doc-scored stream carries doc_id;
    // a join with doc_id in scope is therefore a stream-sized join. The
    // pre-r16 shape had THREE (stream⋈bc, then ⋈uni, then ⋈V) — two
    // stream-sized shuffles more than necessary at table scale.
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    val streamJoins = joins.count(j =>
      (j.left.output ++ j.right.output).exists(_.name == "doc_id"))
    assert(streamJoins == 1,
      s"expected exactly 1 join touching the bigram stream, got " +
        s"$streamJoins of ${joins.size} joins:\n" +
        df.queryExecution.optimizedPlan)
  }

  test("determinism: identical scores under different partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0L until 200L).map { i =>
      (i, (0 until 3 + rnd.nextInt(20))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df1 = docs.toDF("doc_id", "text").repartition(1)
    val df7 = docs.toDF("doc_id", "text").repartition(7)
    val r1 = TextOps.bigramLmDocScores(df1, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val r7 = TextOps.bigramLmDocScores(df7, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(r1 == r7)
  }
}
