package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextPipelineSpec extends SparkTestBase {

  // ----------------------------------------------------------------- PII

  test("PII redaction replaces every email and phone, in that order") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b-c%d@sub.ex.org and 555-123-4567 twice: x@y.io 111-222-3333"),
      (2L, "no pii here, 12-34 and a@b are not matches"),
      (3L, "edge: end with bob@site.museum")).toDF("id", "t")
    val out = df.select(col("id"), TextOps.redactPii(col("t")).as("r"),
        TextOps.emailCount(col("t")).as("ne"), TextOps.phoneCount(col("t")).as("np"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(out(1L)._1 == "mail <EMAIL> and <PHONE> twice: <EMAIL> <PHONE>")
    assert(out(1L)._2 == 2 && out(1L)._3 == 2)
    assert(out(2L)._1 == "no pii here, 12-34 and a@b are not matches")
    assert(out(2L)._2 == 0 && out(2L)._3 == 0)
    assert(out(3L)._1 == "edge: end with <EMAIL>")
  }

  test("phone digits inside longer digit runs do not match (word boundaries)") {
    import spark.implicits._
    val df = Seq((1L, "serial 1555-123-45678 is not a phone")).toDF("id", "t")
    val out = df.select(TextOps.redactPii(col("t"))).head.getString(0)
    assert(out == "serial 1555-123-45678 is not a phone")
  }

  // ---------------------------------------------------------- repetition

  private def repetitionByExplode(df: org.apache.spark.sql.DataFrame) = {
    val words = df.select(col("doc_id"),
        explode(split(trim(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
    words.groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_words"), count(lit(1)).as("n_distinct"),
        max("cnt").as("max_cnt"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"), col("max_cnt"),
        (col("max_cnt").cast("double") / col("n_words").cast("double")).as("top_frac"))
  }

  test("repetition kernel == explode+groupBy spelling on randomized docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "longword", "x1")
    val docs = (0L until 300L).map { i =>
      val n = rnd.nextInt(40) // includes empty docs
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ") +
        (if (rnd.nextBoolean()) "  " else "")) // trailing double space noise
    }.toDF("doc_id", "text")
    val got = TextOps.wordRepetitionStats(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val exp = repetitionByExplode(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got == exp)
    assert(got.nonEmpty && got.size < 300) // some docs were empty and dropped
  }

  test("repetition kernel is map-only (no shuffle) and faster than explode") {
    import spark.implicits._
    val docs = (0L until 20000L).map { i =>
      (i, Seq.fill(60)("w" + (i % 97)).mkString(" "))
    }.toDF("doc_id", "text").localCheckpoint()
    val plan = TextOps.wordRepetitionStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"kernel must not shuffle:\n$plan")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // best-of-2 per side: sbt runs suites in parallel, and a GC pause
    // landing on one single-sample run flipped this assertion once in a
    // full-suite run — min-of-n is the standard flake guard
    val tk = (1 to 2).map(_ =>
      time(TextOps.wordRepetitionStats(docs, "doc_id", "text").count())).min
    val te = (1 to 2).map(_ => time(repetitionByExplode(docs).count())).min
    info(f"kernel $tk%.2fs vs explode $te%.2fs on 20k docs × 60 words")
    // generous bound: the zero-shuffle kernel must not LOSE to the
    // |words|-row shuffle spelling (typically it's several times faster)
    assert(tk < te * 2.0, f"kernel $tk%.2fs vs explode $te%.2fs")
  }

  // ----------------------------------------------------- decontamination

  test("contamination finds planted n-gram overlap and nothing else") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares 2 shingles with e10
      (2L, "one two three four five"),             // shares 1 shingle with e11
      (3L, "totally unrelated words here")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "alpha beta gamma delta unrelated tail"), // "alpha beta gamma", "beta gamma delta"
      (11L, "zero one two three nine")).toDF("doc_id", "text") // only "one two three"
    val out = TextOps.ngramContamination(train, eval, "doc_id", "text",
        n = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 10L, 2L))) // the 1-shingle pair is below threshold
    val loose = TextOps.ngramContamination(train, eval, "doc_id", "text",
        n = 3, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((1L, 10L), (2L, 11L)))
  }

  // ---------------------------------------------- df quality / span scrub

  test("docFrequencyStats computes df sums, hapax counts, and exact mean") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextOps.docFrequencyStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // df: a→2 docs, b→1, c→1
    assert(out(0) == ((1L, 3L, 5L, 1L, 5.0 / 3)))  // a,b,a → 2+1+2
    assert(out(1) == ((2L, 2L, 3L, 1L, 3.0 / 2)))  // a,c → 2+1
  }

  test("duplicateSpanScrub drops cross-doc chunks, keeps within-doc repeats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "h1 h2 x y"),     // "h1 h2" shared with doc 2 → dropped
      (2L, "h1 h2 p q"),
      (3L, "r r r r"),       // within-doc repeat only → survives whole
      (4L, "h1 h2"),         // fully scrubbed → empty clean_text
      (5L, "z1 z2 z3")       // odd tail chunk "z3" survives
    ).toDF("doc_id", "text")
    val out = TextOps.duplicateSpanScrub(docs, "doc_id", "text", k = 2, minDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "x y", 2L, 1L),
      (2L, "p q", 2L, 1L),
      (3L, "r r r r", 2L, 0L),
      (4L, "", 1L, 1L),
      (5L, "z1 z2 z3", 2L, 0L)))
  }

  // ------------------------------------------- randomized reference models

  test("span scrub matches a brute-force reference model on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      // tiny vocab so cross-doc chunk collisions actually occur
      val docs = (1L to 40L).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i, Seq.fill(n)("w" + rnd.nextInt(4)).mkString(" "))
      }
      def chunks(text: String): Vector[String] =
        text.trim.split(" ").grouped(3).map(_.mkString(" ")).toVector
      val all = docs.map { case (id, t) => id -> chunks(t) }
      val dupSet = all.flatMap { case (id, cs) => cs.distinct.map(c => (c, id)) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val expected = all.map { case (id, cs) =>
        val kept = cs.filterNot(dupSet)
        (id, kept.mkString(" "), cs.size.toLong, (cs.size - kept.size).toLong)
      }
      val got = TextOps.duplicateSpanScrub(docs.toDF("doc_id", "text"),
          "doc_id", "text", k = 3, minDocs = 2)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == expected)
    }
  }

  test("contamination matches brute force on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def text(): String =
      Seq.fill(3 + rnd.nextInt(8))("t" + rnd.nextInt(5)).mkString(" ")
    val train = (1L to 30L).map(i => (i, text()))
    val eval = (100L to 110L).map(i => (i, text()))
    def shingles(t: String): Set[String] = {
      val toks = t.trim.split(" ")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val expected = (for {
      (tid, tt) <- train; (eid, et) <- eval
      shared = (shingles(tt) & shingles(et)).size if shared >= 2
    } yield (tid, eid, shared.toLong)).toSet
    val got = TextOps.ngramContamination(train.toDF("doc_id", "text"),
        eval.toDF("doc_id", "text"), "doc_id", "text", n = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "seed must produce at least one contaminated pair")
  }

  test("cross-corpus Jaccard decontamination matches brute force; grades overlap") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def text(): String =
      Seq.fill(3 + rnd.nextInt(8))("t" + rnd.nextInt(5)).mkString(" ")
    // plant: eval 200 is a near-verbatim copy of train 31 (one token off);
    // eval 201 shares one boilerplate shingle with everything via low vocab
    val copied = "c1 c2 c3 c4 c5 c6 c7 c8"
    val train = (1L to 30L).map(i => (i, text())) :+ (31L -> copied)
    val eval = (100L to 110L).map(i => (i, text())) :+
      (200L -> (copied + " tail"))
    def shingles(t: String): Set[String] = {
      val toks = t.trim.split(" ")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val thr = 0.2
    val expected = (for {
      (tid, tt) <- train; (eid, et) <- eval
      sa = shingles(tt); sb = shingles(et)
      shared = (sa & sb).size if shared >= 1
      j = shared.toDouble / (sa.size + sb.size - shared) if j >= thr
    } yield (tid, eid, shared.toLong, j)).toSet
    val got = TextOps.crossJaccardDecontamination(train.toDF("doc_id", "text"),
        eval.toDF("doc_id", "text"), "doc_id", "text", n = 3, threshold = thr)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
    // the planted near-copy must surface with a high grade
    val planted = got.find(p => p._1 == 31L && p._2 == 200L)
    assert(planted.exists(_._4 > 0.8),
      s"planted near-copy should grade ~1, got $planted")
  }

  // ------------------------------------------------------ feature hashing

  // bucket = first 4 md5 hex digits (16 bits) mod numBuckets — near-uniform
  // for ANY allowed bucket count, not just divisors of 16 (ADVICE r6 fix)
  private def fhBucket(s: String, numBuckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(md.substring(0, 4), 16) % numBuckets
  }

  test("featureHash counts tokens per md5 bucket, zeros elsewhere") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "")).toDF("doc_id", "text")
    val out = TextOps.featureHash(docs, "doc_id", "text", numBuckets = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getString(2)))
    val expected1 = Array.fill(16)(0L)
    expected1(fhBucket("a", 16)) += 2; expected1(fhBucket("b", 16)) += 1
    assert(out(0)._2 == expected1.toSeq)
    // the scalar spelling is the same vector comma-joined (driver-gate form)
    assert(out(0)._3 == expected1.mkString(","))
    // empty text tokenizes to [""], which still lands in one bucket —
    // consistent with the DuckDB spelling
    val expected2 = Array.fill(16)(0L); expected2(fhBucket("", 16)) += 1
    assert(out(1)._2 == expected2.toSeq)
    assert(out.forall(_._2.sum > 0) && out.forall(_._2.length == 16))
  }

  test("featureHash handles bucket counts that do not divide 16 uniformly") {
    import spark.implicits._
    // With the old first-hex-digit scheme, numBuckets=10 put 2x mass on
    // buckets 0-5; the 4-digit scheme spreads any token set near-uniformly.
    val words = (0 until 500).map(i => s"tok$i")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val vec = TextOps.featureHash(docs, "doc_id", "text", numBuckets = 10)
      .collect().head.getSeq[Long](1)
    assert(vec.length == 10 && vec.sum == 500)
    val expected = Array.fill(10)(0L)
    words.foreach(w => expected(fhBucket(w, 10)) += 1)
    assert(vec == expected.toSeq)
    // uniformity: no bucket holds more than 2x the ideal share
    assert(vec.max <= 100, s"skewed buckets: $vec")
  }

  // -------------------------------------------------- canonical selection

  test("canonicalDocs keeps longest per fingerprint group, smallest id on tie") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b a a"),       // same token set as 2 and 3
      (2L, "a b a b a b"), // longest of the group → kept
      (3L, "a b"),
      (7L, "c d"),         // tie on length with 9 → smaller id kept
      (9L, "d c"),
      (5L, "only one")     // singleton passes through
    ).toDF("doc_id", "text")
    val out = TextOps.canonicalDocs(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 3L), (5L, 1L), (7L, 2L)))
  }

  // ------------------------------------------------- token-budget packing

  test("packIntoShards matches the global-window spelling, without a Window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 257L).map(i => (i, (i * 37) % 11 + 1)).toDF("doc_id", "w")
    val out = SampleOps.packIntoShards(rows, "doc_id", col("w"), budget = 20L)
    // the distributed prefix sum must not plan a single-partition Window
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "packIntoShards must not fall back to a global window")
    val win = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = rows.withColumn("cum", sum("w").over(win))
      .select(col("doc_id"), col("w").cast("long").as("n_tok"),
        col("cum").as("cum_tok"),
        expr("(greatest(cum, 1) - 1) div 20").as("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(_._1).toSeq == ref.sortBy(_._1).toSeq)
    assert(got.map(_._4).distinct.length > 5, "expected several shards")
    // a document crossing the boundary lands in the shard where it ends
    val byId = got.map(t => t._1 -> t).toMap
    assert(got.forall { case (_, _, cum, sh) => sh == (math.max(cum, 1) - 1) / 20 })
    assert(byId(1L)._4 == 0L)
  }

  // ------------------------------------------------------------ sampling

  test("hash-stratified sample is deterministic and hits per-stratum rates") {
    import spark.implicits._
    val df = (0L until 30000L).map(i => (i, "s" + (i % 3))).toDF("id", "src")
    val rates = Map("s0" -> 0.5, "s1" -> 0.1) // s2 falls back to default 0.0
    val a = SampleOps.hashStratifiedSample(df, "id", "src", rates)
      .select("id", "src")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = SampleOps.hashStratifiedSample(df, "id", "src", rates)
      .select("id", "src")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b) // exactly reproducible
    val byStratum = a.groupBy(_._2).view.mapValues(_.size).toMap
    // 10k ids per stratum; binomial 4σ bounds
    assert(math.abs(byStratum("s0") - 5000) < 4 * math.sqrt(10000 * 0.25), byStratum)
    assert(math.abs(byStratum("s1") - 1000) < 4 * math.sqrt(10000 * 0.09), byStratum)
    assert(!byStratum.contains("s2")) // default rate 0 drops the stratum
    val full = SampleOps.hashStratifiedSample(df, "id", "src",
      Map("s0" -> 1.0), defaultRate = 1.0)
    assert(full.count() == 30000L) // rate 1.0 keeps everything
  }

  test("quota sample returns exactly N per stratum, deterministically") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i, "s" + (i % 4))).toDF("id", "src")
    val a = SampleOps.hashQuotaSample(df, "id", "src", 7)
      .select("id", "src").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.length == 28)
    assert(a.groupBy(_._2).forall(_._2.length == 7))
    val b = SampleOps.hashQuotaSample(df, "id", "src", 7)
      .select("id", "src").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSet == b.toSet)
    // a stratum smaller than the quota returns all of it
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "src")
    assert(SampleOps.hashQuotaSample(tiny, "id", "src", 7).count() == 2)
  }

  test("hash split partitions every row once, stably under corpus growth") {
    import spark.implicits._
    val df = (0L until 20000L).map(i => (i, s"d$i")).toDF("id", "p")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = SampleOps.hashSplit(df, "id", splits)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(labeled.size == 20000) // total function: every row exactly one label
    val byLabel = labeled.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(byLabel("train") - 16000) < 4 * math.sqrt(20000 * 0.16), byLabel)
    assert(math.abs(byLabel("val") - 2000) < 4 * math.sqrt(20000 * 0.09), byLabel)
    assert(math.abs(byLabel("test") - 2000) < 4 * math.sqrt(20000 * 0.09), byLabel)
    // growth stability: labels on a subset are unchanged when rows are added
    val subset = SampleOps.hashSplit(df.filter(col("id") < 1000), "id", splits)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(subset.forall { case (id, l) => labeled(id) == l })
  }

  test("sampling never shuffles the corpus (broadcast rates + map-side filter)") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, "s" + (i % 3))).toDF("id", "src")
      .localCheckpoint()
    val plan = SampleOps.hashStratifiedSample(df, "id", "src", Map("s0" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus must not shuffle:\n$plan")
  }

  test("weighted sample favors heavy rows, invariant, TakeOrdered plan") {
    import spark.implicits._
    // half the ids weigh 50, half weigh 1: the 100-row sample from 2000
    // must be dominated by heavy rows (E[heavy] ≈ 98) — and identical
    // across partitionings
    val rows = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) 50L else 1L))
    val picks = Seq(1, 16).map { parts =>
      val df = rows.toDF("doc_id", "w").repartition(parts)
      SampleOps.weightedSample(df, "doc_id", col("w"), 100)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(picks(0) == picks(1), "selection changed with partitioning")
    val heavy = picks.head.count(_ % 2 == 0)
    assert(heavy >= 85, s"expected heavy-row dominance, got $heavy/100")
    assert(picks.head.size == 100)

    // zero/negative weights are excluded, not selected-with-ln(0)
    val withZero = (rows :+ (9999L, 0L)).toDF("doc_id", "w")
    val z = SampleOps.weightedSample(withZero, "doc_id", col("w"), 2000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!z.contains(9999L))

    val plan = SampleOps.weightedSample(rows.toDF("doc_id", "w"),
        "doc_id", col("w"), 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-n must plan as TakeOrdered, not a sort:\n$plan")
  }

  test("leakageFreeSplit: near-dup pairs never straddle splits, " +
      "singletons are their own cluster, labels = hashSplit of cluster") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val vocab = (0 until 60).map(i => s"w$i").toVector
    def mkDoc(): String =
      (0 until 15).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // 40 independent docs plus 10 near-dup families of 3 (one token edit)
    val solo = (0L until 40L).map(i => (i, mkDoc()))
    val fams = (0 until 10).flatMap { f =>
      val base = mkDoc().split(" ")
      (0 until 3).map { m =>
        val v = base.clone(); v(5 + m) = s"x$f$m"
        (100L + f * 10 + m, v.mkString(" "))
      }
    }
    val df = (solo ++ fams).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    val got = SampleOps.leakageFreeSplit(df, "doc_id", "text", splits)
      .select("doc_id", "cluster", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = got.map(t => t._1 -> t).toMap
    assert(got.length == solo.size + fams.size)
    // every LSH near-dup pair shares cluster AND split
    val pairs = TextOps.minhashLshPairs(df, "doc_id", "text", 3, 128, 2, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must produce near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(byId(a)._2 == byId(b)._2 && byId(a)._3 == byId(b)._3,
        s"pair ($a,$b) straddles clusters/splits")
    }
    // docs in no pair are their own cluster
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    got.filterNot(t => paired.contains(t._1)).foreach { case (id, c, _) =>
      assert(c == id, s"singleton $id got cluster $c")
    }
    // the label is exactly hashSplit of the cluster id
    val expected = SampleOps.hashSplit(
        got.map(t => (t._1, t._2)).toSeq.toDF("doc_id", "cluster"),
        "cluster", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    got.foreach { case (id, _, s) => assert(expected(id) == s) }

    // STORE-SERVED == recomputed (VERDICT r13 #3): on this corpus every
    // exact-Jaccard pair shares >= 2 rare shingles (precondition asserted
    // below — the store's operating regime), so the SimGraphStore-served
    // split must equal the LSH recompute row for row. The store is built
    // INCREMENTALLY in two updates to exercise the maintained path.
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-splitstore-spec").toString + "/g"
    SimGraphStore.init(spark, storeDir, n = 3, cap = 50L, minCommon = 2L)
    SimGraphStore.update(spark, storeDir,
      df.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    SimGraphStore.update(spark, storeDir,
      df.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
    val storeEdges = SimGraphStore.edges(spark, storeDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.foreach { case (a, b) =>
      assert(storeEdges.contains((math.min(a, b), math.max(a, b))),
        s"precondition: Jaccard pair ($a,$b) must have a store edge") }
    val served = SampleOps.leakageFreeSplitFromStore(spark, storeDir, df,
        "doc_id", "text", splits)
      .select("doc_id", "cluster", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(served == got.toSet)

    // the in-code regime dial (VERDICT r14 #1), BOTH branches on the
    // same store. Forced-serve (ratio = ∞) must equal the default run
    // above (this corpus is sparse: edges << 4·docs, so the default
    // already served); forced-recompute (ratio = 0: any edge count
    // trips the dense-graph branch) must equal leakageFreeSplit row
    // for row — the recompute branch IS that operator, shingle width
    // taken from the store meta
    val forcedServe = SampleOps.leakageFreeSplitFromStore(spark, storeDir,
        df, "doc_id", "text", splits,
        serveEdgeRatio = Double.PositiveInfinity)
      .select("doc_id", "cluster", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(forcedServe == served)
    val forcedRecompute = SampleOps.leakageFreeSplitFromStore(spark,
        storeDir, df, "doc_id", "text", splits, serveEdgeRatio = 0.0)
      .select("doc_id", "cluster", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(forcedRecompute == got.toSet)
  }
}
