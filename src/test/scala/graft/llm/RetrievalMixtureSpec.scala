package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Specs for the round-8 retrieval / mixture additions: BM25 term top-k,
  * token-budgeted dataset mixture, and exact n-gram containment pairs. */
class RetrievalMixtureSpec extends SparkTestBase {

  // ---------------------------------------------------------------- BM25

  test("bm25: scores match a driver-side reference computation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join join hash scan"),
      (2L, "window window window join"),
      (3L, "scan scan scan scan scan scan scan scan"),
      (4L, "hash"),
      (5L, "nothing relevant here at all")).toDF("doc_id", "text")
    val terms = Seq("join", "window", "hash", "scan")
    val got = TextOps.bm25TermTopK(docs, "doc_id", "text", terms, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getInt(1), r.getInt(3), r.getInt(4), r.getDouble(5))))
      .toMap

    // reference: plain Scala, same formula
    val corpus = Map(1L -> "join join hash scan", 2L -> "window window window join",
      3L -> "scan scan scan scan scan scan scan scan", 4L -> "hash",
      5L -> "nothing relevant here at all").map { case (k, v) => k -> v.split(" ").toSeq }
    val n = corpus.size
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    for (t <- terms) {
      val matches = corpus.filter(_._2.contains(t))
      val dfc = matches.size
      val idf = math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
      for ((id, toks) <- matches) {
        val tf = toks.count(_ == t)
        val dl = toks.size
        val norm = tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
        val score = BigDecimal(idf * (tf * (1.2 + 1.0)) / norm)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (_, gtf, gdl, gscore) = got((t, id))
        assert(gtf == tf && gdl == dl, s"tf/dl mismatch for ($t, $id)")
        assert(math.abs(gscore - score) < 1e-9, s"score mismatch for ($t, $id)")
      }
    }
    // doc 5 matches nothing; every other (term, doc) with tf>0 is present
    assert(!got.keys.exists(_._2 == 5L))
    assert(got.size == 7)
  }

  test("bm25: two-phase top-k equals the naive single-window spelling") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("join", "window", "hash", "scan", "x", "y", "z", "w")
    val docs = (0L until 400L).map { i =>
      val len = 1 + rnd.nextInt(30)
      (i, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val terms = Seq("join", "window", "hash", "scan")
    val got = TextOps.bm25TermTopK(docs, "doc_id", "text", terms, topK = 5)
      .select("term", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

    // naive: same scored frame via an explode spelling, one global window
    val toks = split(trim(col("text")), " ")
    val m = docs.select(col("doc_id"), size(toks).as("dl"),
        explode(toks).as("t"))
      .groupBy("doc_id", "dl", "t").agg(count(lit(1)).as("tf"))
      .filter(col("t").isin(terms: _*))
    val stats = docs.select(size(toks).as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dft = m.groupBy("t").agg(count(lit(1)).as("dfc"))
    val idf = log((col("n_docs") - col("dfc") + lit(0.5)) /
      (col("dfc") + lit(0.5)) + lit(1.0))
    val norm = col("tf") + lit(1.2) *
      (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))
    val w = Window.partitionBy("t").orderBy(col("score").desc, col("doc_id"))
    val exp = m.join(dft, "t").crossJoin(stats)
      .withColumn("score", round(idf * (col("tf") * lit(2.2)) / norm, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("t", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == exp)
  }

  // ------------------------------------------------------------- mixture

  private def mixtureByWindow(df: DataFrame, budgets: Map[String, Long]) = {
    import df.sparkSession.implicits._
    val bdf = budgets.toSeq.toDF("stratum", "budget")
    val w = Window.partitionBy("stratum")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col("doc_id"), col("stratum"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tok"))
      .withColumn("cum_tok", sum("n_tok").over(w))
      .join(bdf, "stratum")
      .filter(col("cum_tok") - col("n_tok") < col("budget"))
      .select("doc_id", "stratum", "n_tok", "cum_tok")
  }

  test("budgetedMixture equals the per-stratum window spelling") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val strata = Vector("web", "code", "books", "wiki")
    val docs = (0L until 600L).map { i =>
      val len = 1 + rnd.nextInt(20)
      (i, strata(rnd.nextInt(strata.size)),
        (0 until len).map(_ => "tok").mkString(" "))
    }.toDF("doc_id", "stratum", "text")
    val budgets = Map("web" -> 200L, "code" -> 35L, "books" -> 1L)
    val got = SampleOps.budgetedMixture(docs, "doc_id", "stratum",
        size(split(trim(col("text")), " ")), budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val exp = mixtureByWindow(docs, budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == exp)
    // wiki has no budget: contributes nothing
    assert(!got.exists(_._2 == "wiki"))
    // books budget 1: exactly the first doc in hash order (greedy prefix
    // keeps the boundary-crossing doc)
    assert(got.count(_._2 == "books") == 1)
  }

  test("budgetedMixture: greedy prefix keeps the crossing doc, stops after") {
    import spark.implicits._
    // one stratum, known hash order: budget lands mid-doc
    val docs = Seq((1L, "s", "a b c"), (2L, "s", "a b"), (3L, "s", "a"))
      .toDF("doc_id", "stratum", "text")
    val order = Seq(1L, 2L, 3L)
      .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).map("%02x".format(_)).mkString, id))
    val sizes = Map(1L -> 3L, 2L -> 2L, 3L -> 1L)
    // budget = first doc's tokens + 1 → first two docs in hash order kept
    val budget = sizes(order.head) + 1
    val got = SampleOps.budgetedMixture(docs, "doc_id", "stratum",
        size(split(trim(col("text")), " ")), Map("s" -> budget))
      .collect().map(_.getLong(0)).toSet
    assert(got == order.take(2).toSet)
  }

  // --------------------------------------------------------- containment

  private def bruteContainment(corpus: Map[Long, String], n: Int,
      t: Double): Set[(Long, Long, Double)] = {
    def sh(s: String): Set[String] = {
      val toks = s.trim.split(" ")
      if (toks.length < n) Set.empty
      else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).toSet
    }
    val sets = corpus.map { case (k, v) => k -> sh(v) }.filter(_._2.nonEmpty)
    (for {
      (ia, a) <- sets; (ib, b) <- sets if ia != ib
      inter = (a & b).size
      if inter.toDouble >= t * a.size
    } yield (ia, ib, inter.toDouble / a.size)).toSet
  }

  test("ngramContainmentPairs equals brute force on a randomized corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val vocab = Vector("a", "b", "c", "d", "e")
    val corpus = (0L until 120L).map { i =>
      val len = rnd.nextInt(12)
      i -> (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }.toMap
    val docs = corpus.toSeq.toDF("doc_id", "text")
    val got = TextOps.ngramContainmentPairs(docs, "doc_id", "text",
        n = 2, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == bruteContainment(corpus, 2, 0.6))
  }

  test("containment catches an embedded document that Jaccard misses") {
    import spark.implicits._
    val host = (1 to 60).map(i => s"w$i").mkString(" ")
    val quoted = (20 to 29).map(i => s"w$i").mkString(" ") // ⊂ host
    val docs = Seq((1L, host), (2L, quoted), (3L, "x y z q r s"))
      .toDF("doc_id", "text")
    val cont = TextOps.ngramContainmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont.contains((2L, 1L)))     // quoted ⊂ host
    assert(!cont.contains((1L, 2L)))    // host ⊄ quoted
    val jac = TextOps.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)) && !jac.contains((2L, 1L)))
  }

  test("containment plan has no cartesian product") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = TextOps.ngramContainmentPairs(docs, "doc_id", "text",
      n = 2, threshold = 0.5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
