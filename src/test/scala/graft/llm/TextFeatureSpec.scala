package graft.llm

import graft.SparkTestBase
import graft.functions.NfcNormalize
import org.apache.spark.sql.functions._

/** Round-6 feature-extraction additions: the graft_nfc native expression,
  * distinctive keywords, embedding chunking, and the vocabulary build. */
class TextFeatureSpec extends SparkTestBase {

  // ------------------------------------------------------------- graft_nfc

  test("graft_nfc composes decomposed sequences and passes NFC through") {
    import spark.implicits._
    NfcNormalize.register(spark)
    val decomposedCafe = "Cafe\u0301"      // e + combining acute
    val composedCafe = "Caf\u00e9"         // precomposed \u00e9
    val df = Seq(
      (1L, decomposedCafe),
      (2L, composedCafe),
      (3L, "plain ascii"),
      (4L, "A\u030a u\u0308 o\u0302"),     // ring, diaeresis, circumflex
      (5L, null.asInstanceOf[String]),
      (6L, "")).toDF("id", "t")
    val out = df.select(col("id"),
        call_function(NfcNormalize.name, col("t")).as("n"),
        length(call_function(NfcNormalize.name, col("t"))).as("len"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) == composedCafe, "decomposed input must compose")
    assert(out(2L) == composedCafe, "already-NFC input must be unchanged")
    assert(out(3L) == "plain ascii")
    assert(out(4L) == "\u00c5 \u00fc \u00f4")
    assert(out(5L) == null, "null stays null")
    assert(out(6L) == "")
  }

  test("graft_nfc agrees between codegen and interpreted eval") {
    // evaluate the expression directly (interpreted) and compare with the
    // codegen'd DataFrame path on the same inputs
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq("Cafe\u0301", "Caf\u00e9", "", "abc", "A\u030ax",
      "mixe\u0301d a\u0308nd ascii")
    cases.foreach { s =>
      val interpreted = NfcNormalize(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)).eval(null)
      assert(interpreted.toString ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    // null literal through the expression
    assert(NfcNormalize(Literal(null,
      org.apache.spark.sql.types.StringType)).eval(null) == null)
  }

  test("GraftExtensions injects graft_nfc (registry-level check)") {
    // the shared session predates the extension; registering idempotently
    // mirrors what the injection does and must not double-register
    NfcNormalize.register(spark)
    NfcNormalize.register(spark)
    val one = spark.sql("SELECT graft_nfc('Cafe\u0301') AS x").head.getString(0)
    assert(one == "Caf\u00e9")
  }

  // ------------------------------------------------------------- keywords

  test("distinctiveKeywords ranks by tf desc, then rare df, then token") {
    import spark.implicits._
    val df = Seq(
      // doc 1: "apple" tf=2 wins; "rare" and "the" tie at tf=1 but
      // "rare" has df=1 vs "the" df=3 \u2192 rare ranks ahead
      (1L, "apple apple rare the"),
      (2L, "the banana banana"),
      (3L, "the cherry")).toDF("doc_id", "text")
    val out = TextOps.distinctiveKeywords(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(4)) -> (r.getString(1),
        r.getLong(2), r.getLong(3))).toMap
    assert(out((1L, 1)) == ("apple", 2L, 1L))
    assert(out((1L, 2)) == ("rare", 1L, 1L))
    assert(out((2L, 1)) == ("banana", 2L, 1L))
    assert(out((2L, 2)) == ("the", 1L, 3L))
    assert(out((3L, 1)) == ("cherry", 1L, 1L))
    assert(out((3L, 2)) == ("the", 1L, 3L))
  }

  test("distinctiveKeywords matches the windowed reference on random docs " +
      "and never plans a Window or a corpus-wide final shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "ggg", "hh", "i", "jj")
    val docs = (1L to 60L).map(id =>
      (id, (0 until (1 + rnd.nextInt(25)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val gotDf = TextOps.distinctiveKeywords(docs, "doc_id", "text", k = 3)
    // the rework's contract: per-doc ranking via the bounded TopKAgg
    // partial aggregate (k-sized buffers over the shuffle), no rank Window
    val plan = gotDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank window leaked back in:\n$plan")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final TopKAgg:\n$plan")
    val got = gotDf.collect()
      .map(r => (r.getLong(0), r.getInt(4)) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // windowed reference model (the documented ≥2³²-vocab fallback shape)
    val tok = docs.select(col("doc_id"), explode(split(trim(col("text")), " ")).as("t"))
    val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy("t").agg(countDistinct(col("doc_id")).as("dfc"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("dfc").asc, col("t").asc)
    val exp = tf.join(dfreq, "t").withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("doc_id", "t", "tf", "dfc", "rk").collect()
      .map(r => (r.getLong(0), r.getInt(4)) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == exp)
  }

  // ------------------------------------------------------------- chunking

  test("chunkForEmbedding windows overlap at the stride and cover all tokens") {
    import spark.implicits._
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5"),   // n=5, W=3, S=2 \u2192 2 chunks
      (2L, "a b"),              // n \u2264 W \u2192 1 chunk
      (3L, "")).toDF("doc_id", "text")
    val chunked = TextOps.chunkForEmbedding(df, "doc_id", "text", window = 3, stride = 2)
    // map-only one-to-many: no shuffle may appear in the plan
    assert(!chunked.queryExecution.executedPlan.toString.contains("Exchange"),
      "chunkForEmbedding must stay map-only")
    val out = chunked
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(out((1L, 0)) == ("t1 t2 t3", 3L))
    assert(out((1L, 1)) == ("t3 t4 t5", 3L))
    assert(out((2L, 0)) == ("a b", 2L))
    assert(out((3L, 0)) == ("", 1L)) // split("") yields one empty token
    assert(out.size == 4)
  }

  test("chunkForEmbedding matches a reference model on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (0L until 200L).map { i =>
      val n = rnd.nextInt(90)
      (i, (0 until n).map(j => s"w$j").mkString(" "))
    }
    val w = 30; val s = 20
    val expect = docs.flatMap { case (id, text) =>
      val toks = text.trim.split(" ")
      val n = toks.length
      val nc = if (n <= w) 1 else 1 + math.ceil((n - w).toDouble / s).toInt
      (0 until nc).map { i =>
        ((id, i), (toks.slice(i * s, i * s + w).mkString(" "),
          math.min(w, n - i * s).toLong))
      }
    }.toMap
    val got = TextOps.chunkForEmbedding(docs.toDF("doc_id", "text"),
        "doc_id", "text", window = w, stride = s)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(got == expect)
  }

  // ----------------------------------------------------------- vocabulary

  test("vocabulary ranks are contiguous, ordered, and window-free") {
    import spark.implicits._
    val df = Seq(
      (1L, "b b b a a c"),
      (2L, "a a d c")).toDF("doc_id", "text")
    val out = TextOps.vocabulary(df, "doc_id", "text")
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "vocabulary must not fall back to a global window")
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a: 4, b: 3, c: 2, d: 1 \u2014 ranks 1..4 contiguous
    assert(rows.sortBy(_._3).toSeq ==
      Seq(("a", 4L, 1L), ("b", 3L, 2L), ("c", 2L, 3L), ("d", 1L, 4L)))
  }

  test("vocabulary matches the global-window spelling on a random corpus") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "f0", "g", "hh", "iii", "j")
    val docs = (0L until 300L).map { i =>
      (i, (0 until rnd.nextInt(25)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val ref = docs.select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("t").asc))
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = TextOps.vocabulary(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
  }

  // ------------------------------------------------------- dup n-gram frac

  test("dupNgramStats: boundaries (all-dup, no-dup, shorter than n)") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a a"),        // 3 trigrams, all "a a a" -> frac 1.0
      (2L, "w1 w2 w3 w4"),      // 2 distinct trigrams -> frac 0.0
      (3L, "x y"),              // < n tokens -> no row
      (4L, "p q p q p q p"),    // "p q p" x3? positions: pqp,qpq,pqp,qpq,pqp
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextOps.dupNgramStats(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(!out.contains(3L))
    assert(out(4L) == ((5L, 5L, 1.0))) // pqp x3 + qpq x2, every one a dup
    assert(!out.contains(5L))
  }

  test("dupNgramStats matches a reference model on random repetitive docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val vocab = Vector("a", "b", "c") // tiny vocab so trigram dups occur
    val docs = (0L until 250L).map { i =>
      (i, (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val n = 3
    val expect = docs.flatMap { case (id, text) =>
      val toks = text.trim.split(" ").filter(_.nonEmpty)
      if (toks.length < n) None
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
        val dup = counts.values.filter(_ > 1L).sum
        Some(id -> ((grams.size.toLong, dup, dup.toDouble / grams.size)))
      }
    }.toMap
    val got = TextOps.dupNgramStats(docs.toDF("doc_id", "text"), "doc_id",
        "text", n = n)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == expect)
  }

  // ----------------------------------------------------------- collocations

  test("collocations scores by lift, floors on min count, ranks after limit") {
    import spark.implicits._
    // "new york" x6, exclusive tokens -> lift N/6; "the cat" x5 with "the"
    // diluted by filler -> much lower; "rare pair" x1 -> below minCount
    val df = Seq(
      (1L, "new york new york new york new york new york new york"),
      (2L, "the cat the cat the cat the cat the cat"),
      (3L, "the the the the the the the the the the rare pair")).toDF("doc_id", "text")
    val out = TextOps.collocations(df, "text", k = 10, minCount = 5L)
    assert(out.queryExecution.executedPlan.toString.contains("TakeOrdered"),
      "global top-k must plan as TakeOrdered, not a global sort")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(!rows.exists(r => r._1 == "rare" || r._2 == "pair"),
      "pairs under the count floor must not appear")
    val best = rows.find(_._6 == 1L).get
    assert((best._1, best._2, best._3) == (("new", "york", 6L)))
    assert(rows.map(_._6).sorted.toSeq == (1L to rows.length).toSeq,
      "ranks must be contiguous from 1")
    val theCat = rows.find(r => r._1 == "the" && r._2 == "cat").get
    assert((theCat._3, theCat._4, theCat._5) == ((5L, 15L, 5L)))
  }

  test("collocations matches a reference model on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 300L).map { i =>
      (i, (0 until (2 + rnd.nextInt(20)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val k = 12; val minCount = 2L
    val allToks = docs.map(_._2.trim.split(" ").toSeq)
    val uniCnt = allToks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTok = allToks.map(_.size).sum.toLong
    val biCnt = allToks.filter(_.size >= 2)
      .flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = biCnt.toSeq.filter(_._2 >= minCount)
      .map { case ((w1, w2), cxy) =>
        val cx = uniCnt(w1); val cy = uniCnt(w2)
        (w1, w2, cxy, cx, cy, (cxy * nTok).toDouble / (cx * cy).toDouble)
      }
      .sortBy { case (w1, w2, _, _, _, score) => (-score, w1, w2) }
      .take(k).zipWithIndex
      .map { case ((w1, w2, cxy, cx, cy, _), i) =>
        (w1, w2, cxy, cx, cy, (i + 1).toLong)
      }
    val got = TextOps.collocations(docs.toDF("doc_id", "text"), "text",
        k = k, minCount = minCount)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
  }
}
