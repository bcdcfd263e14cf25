package graft

import graft.exec.SparqlExecutor
import graft.graph.TriplesGraph
import graft.llm.{AnnOps, TextOps}
import graft.rdf.{Iri, Lit, Term, Xsd}
import org.apache.spark.sql.functions._

/** Round-4 scale-hardening regressions: behaviors that are invisible at
  * small SF but wrong or quadratic at 100 TB (VERDICT r3 "What's wrong").
  */
class ScaleHardeningSpec extends SparkTestBase {

  private val ex = "http://example.net/ns#"

  test("checkpointFlatStats severs the estimated-stats lineage") {
    import spark.implicits._
    // Plain localCheckpoint goes through LogicalRDD.fromDataset, which
    // PROPAGATES the origin plan's estimated sizeInBytes — a self-join
    // squares it, so an iterative loop compounds the estimate's bit
    // length exponentially (the 100×-rehearsal planner overflow).
    // checkpointFlatStats must return a frame whose estimate does NOT
    // inherit the inflated value, making the per-round estimate constant.
    def sz(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    var inflated = Seq.tabulate(64)(i => (i.toLong, i.toLong)).toDF("a", "b")
      .localCheckpoint()
    for (_ <- 1 to 3) {
      val j = inflated.join(
        inflated.select(col("a").as("a2"), col("b").as("b2")),
        col("a") === col("a2"))
      inflated = j.select(col("a"), col("b")).localCheckpoint()
    }
    val flat = T.checkpointFlatStats(
      inflated.join(
        inflated.select(col("a").as("a2"), col("b").as("b2")),
        col("a") === col("a2")).select(col("a"), col("b")))
    assert(sz(inflated) > sz(flat),
      s"plain localCheckpoint should carry the compounded estimate " +
        s"(${sz(inflated)}) past the flat-stats rebuild's (${sz(flat)})")
    // and the flat frame's estimate is round-invariant: another wrapped
    // self-join round yields the same default-sized estimate
    val flat2 = T.checkpointFlatStats(
      flat.join(flat.select(col("a").as("a2"), col("b").as("b2")),
        col("a") === col("a2")).select(col("a"), col("b")))
    assert(sz(flat2) == sz(flat),
      "the flat-stats estimate must not compound across rounds")
    assert(flat2.count() == 64, "rebuild must preserve the data")
  }

  test("closure runs past 32 hops to true fixpoint (deep chain)") {
    // 41-node / 40-edge chain: full `+` closure has 40*41/2 = 820 pairs and
    // needs 39 fixpoint iterations — the old silent 32-iteration cap
    // returned a partial answer here.
    val edges: Seq[(Term, String, Term)] = (0 until 40).map { i =>
      (Iri(s"${ex}n$i"), s"${ex}next", Iri(s"${ex}n${i + 1}"))
    }
    val g = TriplesGraph.fromTerms(spark, edges)
    val exec = new SparqlExecutor(g)
    val n = exec.execute(
      s"""PREFIX ex:<$ex>
         |SELECT ?a ?b WHERE { ?a ex:next+ ?b }""".stripMargin).count()
    assert(n == 820L)
    // and the deepest pair is reachable
    val deepest = exec.execute(
      s"""PREFIX ex:<$ex>
         |SELECT ?b WHERE { ex:n0 ex:next+ ?b . FILTER(?b = ex:n40) }""".stripMargin)
      .count()
    assert(deepest == 1L)
  }

  test("64-round closure keeps the planner stats estimate bounded " +
      "(the flat-stats exemption is safe at any depth — VERDICT r10 #7)") {
    // The CC/k-core loops reference their checkpoint k≥3 times per round,
    // so the propagated size estimate obeys L_r ≈ c·L_{r-1}^k and its BIT
    // LENGTH grows k^r — planner overflow at ~15 rounds (the 100×-crash).
    // The closure loop is deliberately exempt from checkpointFlatStats
    // (commit 0571a20) because its recurrence is product-free in the
    // accumulator: stepped ~ frontier×edges (one edge factor), except
    // takes the LEFT size, union SUMS — so bitlen(L_r) grows LINEARLY in
    // r and can never overflow at realistic depth. This pins that claim
    // 4× past the CC crash depth: a 64-round anchored fixpoint must
    // complete and leave a small propagated estimate.
    val edges: Seq[(Term, String, Term)] = (0 until 64).map { i =>
      (Iri(s"${ex}n$i"), s"${ex}next", Iri(s"${ex}n${i + 1}"))
    }
    val g = TriplesGraph.fromTerms(spark, edges)
    val res = new SparqlExecutor(g).execute(
      s"""PREFIX ex:<$ex>
         |SELECT ?b WHERE { ex:n0 ex:next+ ?b }""".stripMargin)
    assert(res.count() == 64L)
    val bits = res.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(bits < 10000,
      s"closure estimate after 64 rounds is $bits bits — exponential " +
        "stats compounding has crept into the fixpoint loop")
  }

  test("closure fixpoint does not re-shuffle the accumulated closure per round") {
    // 39 fixpoint rounds currently cost ~362 stages (~9.3/round). The
    // once-removed redundant `acc.union(next).distinct()` paid at least one
    // extra full shuffle of the accumulated closure per round (+39 stages
    // minimum, in practice ~2/round) — the bound catches it coming back.
    val edges: Seq[(Term, String, Term)] = (0 until 40).map { i =>
      (Iri(s"${ex}n$i"), s"${ex}next", Iri(s"${ex}n${i + 1}"))
    }
    val g = TriplesGraph.fromTerms(spark, edges)
    // count only stages belonging to THIS query's jobs (scoped by job
    // group): a whole-suite stage total shifts with Spark/AQE heuristics
    // and other tests' listener traffic, causing false failures
    val group = "closure-shuffle-probe"
    val myStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (Option(js.properties)
            .exists(_.getProperty("spark.jobGroup.id") == group))
          js.stageIds.foreach { id => myStages.add(id); () }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        if (myStages.contains(sc.stageInfo.stageId)) counter.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "closure shuffle regression probe")
      val n = new SparqlExecutor(g).execute(
        s"""PREFIX ex:<$ex>
           |SELECT ?a ?b WHERE { ?a ex:next+ ?b }""".stripMargin).count()
      spark.sparkContext.clearJobGroup()
      assert(n == 820L)
      // drain the listener bus: stable count for 500ms = all events delivered
      var last = -1
      while (counter.get() != last) { last = counter.get(); Thread.sleep(500) }
      assert(counter.get() <= 400,
        s"deep-chain closure ran ${counter.get()} stages (expected ~362); " +
          "a per-round shuffle of the accumulated closure has crept back in")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("anchored closures iterate the seed's reach, not the graph diameter") {
    // 101-node / 100-edge chain. Unanchored `+` needs 99 fixpoint rounds;
    // anchored at n97 the frontier dies after 3. closureMaxIters=10 is the
    // witness: the anchored queries converge under it, the unanchored one
    // trips the runaway guard — proving the fixpoint work tracks
    // O(reach(seed)), not O(diameter). (VERDICT r5 "What's wrong" #1.)
    val edges: Seq[(Term, String, Term)] = (0 until 100).map { i =>
      (Iri(s"${ex}n$i"), s"${ex}next", Iri(s"${ex}n${i + 1}"))
    }
    val g = TriplesGraph.fromTerms(spark, edges)
    val capped = new SparqlExecutor(g, closureMaxIters = 10)
    def strs(q: String) = capped.execute(s"PREFIX ex:<$ex>\n" + q).collect()
      .map(r => (0 until r.length).map(i => r.getString(i).stripPrefix(ex)).mkString(","))
      .toSet
    // constant subject anchor: forward frontier from n97
    assert(strs("SELECT ?y WHERE { ex:n97 ex:next+ ?y }") ==
      Set("n98", "n99", "n100"))
    // zero-or-more adds the seed's identity row only (not every graph node)
    assert(strs("SELECT ?y WHERE { ex:n97 ex:next* ?y }") ==
      Set("n97", "n98", "n99", "n100"))
    // constant object anchor: inverted frontier from n3
    assert(strs("SELECT ?x WHERE { ?x ex:next+ ex:n3 }") ==
      Set("n0", "n1", "n2"))
    // a seed constant absent from the graph yields nothing (incl. zero-length)
    assert(strs("SELECT ?y WHERE { ex:missing ex:next* ?y }").isEmpty)
    // unanchored: 99 rounds needed, the 10-round guard must fire
    val thrown = intercept[IllegalStateException] {
      capped.execute(s"PREFIX ex:<$ex>\nSELECT ?a ?b WHERE { ?a ex:next+ ?b }")
        .count()
    }
    assert(thrown.getMessage.contains("did not converge"))
  }

  test("closure seeds from variables bound earlier in the BGP") {
    // the closure's subject var is bound by a sibling pattern before the
    // deferred fixpoint runs: only the marked node's reach is iterated
    // (10-round cap on a 100-deep chain = the proof), and results match
    // SPARQL join semantics exactly
    val chain: Seq[(Term, String, Term)] = (0 until 100).map { i =>
      (Iri(s"${ex}n$i"), s"${ex}next", Iri(s"${ex}n${i + 1}"))
    }
    val marks: Seq[(Term, String, Term)] = Seq(
      (Iri(s"${ex}n95"), s"${ex}mark", Lit("m", Xsd.string)))
    val g = TriplesGraph.fromTerms(spark, chain ++ marks)
    val capped = new SparqlExecutor(g, closureMaxIters = 10)
    val got = capped.execute(
      s"""PREFIX ex:<$ex>
         |SELECT ?x ?y WHERE { ?x ex:mark ?m . ?x ex:next+ ?y }""".stripMargin)
      .collect()
      .map(r => (r.getString(0).stripPrefix(ex), r.getString(1).stripPrefix(ex)))
      .toSet
    assert(got == Set(("n95", "n96"), ("n95", "n97"), ("n95", "n98"),
      ("n95", "n99"), ("n95", "n100")))
  }

  test("minhash banding drops empty-shingle docs: candidates stay linear") {
    import spark.implicits._
    // 500 short docs (1 token < shingleN=3) + 2 genuine near-dups. Without
    // the skew guard the short docs share identical band hashes and the
    // candidate join emits ~500*499/2 * bands pairs; with it, only the one
    // real pair (plus none from short docs) survives.
    val shorts = (0 until 500).map(i => (i.toLong, s"tok$i"))
    val dups = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog"),
      (1001L, "the quick brown fox jumps over the lazy cat"))
    val docs = (shorts ++ dups).toDF("doc_id", "text")
    val banded = TextOps.minhashBandTable(docs, "doc_id", "text", 3, 128, 2)
    val candidates = TextOps.bandCandidates(banded, 64).count()
    assert(candidates <= 10L,
      s"candidate blowup: $candidates pairs from 500 empty-shingle docs")
    // end-to-end result still finds the real near-dup pair
    val pairs = TextOps.minhashLshPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1000L, 1001L)))
  }

  test("ngram jaccard prefix filter: one universal shingle causes no candidate blowup") {
    import spark.implicits._
    // 400 docs all sharing the bigram "common anchor" (df=400, would alone
    // emit ~80k candidate pairs from a naive shared-shingle join) plus
    // unique content long enough that the common bigram falls outside every
    // prefix; one genuine near-dup pair must still surface (exactness).
    val uniq = (0 until 400).map { i =>
      (i.toLong, s"common anchor " + (0 until 12).map(j => s"w${i}_$j").mkString(" "))
    }
    val dups = Seq(
      (900L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (901L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
    val docs = (uniq ++ dups).toDF("doc_id", "text")
    val pairs = graft.llm.TextOps.ngramJaccardPairs(docs, "doc_id", "text",
      n = 2, threshold = 0.5)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((900L, 901L)))
  }

  test("ann lsh band width scales with corpus size (occupancy bound)") {
    // floor at the published small-SF default
    assert(AnnOps.bitsPerBandFor(100000L) == 8)
    // lake scale: 2^b buckets keep expected occupancy <= target
    val b = AnnOps.bitsPerBandFor(1000000000L)
    assert(b == 20)
    assert(1000000000L.toDouble / (1L << b) <= 1024.0)
    // monotone in corpus size, bounded key width
    assert(AnnOps.bitsPerBandFor(1L << 45) == 30)
    assert(AnnOps.bitsPerBandFor(1) == 8)
  }

  test("EXISTS with no shared vars plans lazily (no job during execute)") {
    val triples: Seq[(Term, String, Term)] = Seq(
      (Iri(s"${ex}a"), s"${ex}p", Iri(s"${ex}b")),
      (Iri(s"${ex}c"), s"${ex}q", Iri(s"${ex}d")))
    val g = TriplesGraph.fromTerms(spark, triples)
    val exec = new SparqlExecutor(g)
    val sc = spark.sparkContext
    sc.setJobGroup("plan-check", "EXISTS laziness probe")
    val df = exec.execute(
      s"""PREFIX ex:<$ex>
         |SELECT ?x WHERE { ?x ex:p ?y . FILTER(EXISTS { ex:c ex:q ex:d }) }""".stripMargin)
    val plannedJobs = sc.statusTracker.getJobIdsForGroup("plan-check")
    sc.clearJobGroup()
    assert(plannedJobs.isEmpty,
      s"plan construction ran ${plannedJobs.length} job(s)")
    // semantics: inner pattern non-empty -> all rows kept
    assert(df.collect().map(_.getString(0)).toSeq == Seq(s"${ex}a"))
    // inner pattern empty + NOT EXISTS -> all rows kept; EXISTS -> none
    val kept = exec.execute(
      s"""PREFIX ex:<$ex>
         |SELECT ?x WHERE { ?x ex:p ?y . FILTER(NOT EXISTS { ex:c ex:q ex:missing }) }""".stripMargin)
    assert(kept.count() == 1L)
    val dropped = exec.execute(
      s"""PREFIX ex:<$ex>
         |SELECT ?x WHERE { ?x ex:p ?y . FILTER(EXISTS { ex:c ex:q ex:missing }) }""".stripMargin)
    assert(dropped.count() == 0L)
  }

  test("closures over composite operands: inverse, alternation, sequence") {
    val edges: Seq[(Term, String, Term)] = Seq(
      (Iri(s"${ex}a"), s"${ex}next", Iri(s"${ex}b")),
      (Iri(s"${ex}b"), s"${ex}next", Iri(s"${ex}c")),
      (Iri(s"${ex}c"), s"${ex}alt", Iri(s"${ex}d")))
    val exec = new SparqlExecutor(TriplesGraph.fromTerms(spark, edges))
    def pairs(q: String) = exec.execute(s"PREFIX ex:<$ex>\n" + q).collect()
      .map(r => (0 until r.length).map(i => r.getString(i).stripPrefix(ex)).mkString(","))
      .toSet
    assert(pairs("SELECT ?x ?y WHERE { ?x (^ex:next)+ ?y }") ==
      Set("b,a", "c,a", "c,b"))
    assert(pairs("SELECT ?x ?y WHERE { ?x (ex:next|ex:alt)+ ?y }") ==
      Set("a,b", "a,c", "a,d", "b,c", "b,d", "c,d"))
    assert(pairs("SELECT ?x ?y WHERE { ?x (ex:next/ex:next)+ ?y }") == Set("a,c"))
    assert(pairs("SELECT ?y WHERE { ex:a (ex:next/ex:next)* ?y }") == Set("a", "c"))
  }

  test("property paths compose with OPTIONAL, MINUS, and EXISTS") {
    val edges: Seq[(Term, String, Term)] = Seq(
      (Iri(s"${ex}a"), s"${ex}next", Iri(s"${ex}b")),
      (Iri(s"${ex}b"), s"${ex}next", Iri(s"${ex}c")),
      (Iri(s"${ex}a"), s"${ex}num", Lit("1", Xsd.integer)),
      (Iri(s"${ex}b"), s"${ex}num", Lit("2", Xsd.integer)))
    val exec = new SparqlExecutor(TriplesGraph.fromTerms(spark, edges))
    def rows(q: String) = exec.execute(s"PREFIX ex:<$ex>\n" + q).collect()
    val opt = rows("SELECT ?x ?y WHERE { ?x ex:num ?n . OPTIONAL { ?x ex:next+ ?y } }")
      .map(r => (r.getString(0).stripPrefix(ex), r.getString(1).stripPrefix(ex))).toSet
    assert(opt == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val minus = rows("SELECT ?x WHERE { ?x ex:num ?n . MINUS { ?x ex:next/ex:next ?z } }")
      .map(_.getString(0).stripPrefix(ex)).toSet
    assert(minus == Set("b")) // a reaches c in two hops and is removed
    val exist = rows("SELECT ?x WHERE { ?x ex:num ?n . FILTER(EXISTS { ?x ex:next+ ex:c }) }")
      .map(_.getString(0).stripPrefix(ex)).toSet
    assert(exist == Set("a", "b"))
  }

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail, joined against a small dim
    val big = ((1 to 10000).map(i => (1L, i)) ++ (2 to 50).map(k => (k.toLong, k)))
      .toDF("k", "payload")
    val dim = (1 to 60).map(k => (k.toLong, s"d$k")).toDF("k", "attr")
      .filter($"k" <= 40) // some big-side keys unmatched
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val plainInner = big.join(dim, Seq("k"), "inner")
    val saltedInner = graft.relational.Skew.saltedJoin(big, dim, "k", factor = 8)
    assert(canon(saltedInner) == canon(plainInner))
    val plainLeft = big.join(dim, Seq("k"), "left")
    val saltedLeft = graft.relational.Skew.saltedJoin(big, dim, "k",
      factor = 8, how = "left")
    assert(canon(saltedLeft) == canon(plainLeft))
  }

  test("TpchGraph byClass branches exactly partition their slice") {
    // the builder contract class-aware pruning depends on: for every slice
    // declaring byClass, the class branches are disjoint and union to the
    // full slice — otherwise a typed NPS/var-predicate scan would silently
    // drop or duplicate rows
    val g = graft.sparql.TpchGraph.graph(spark, "/root/testdata/sf0.001")
    for ((p, sl) <- g.slices if sl.byClass.nonEmpty) {
      val full = sl.df.count()
      val parts = sl.byClass.values.map(_.count()).sum
      assert(parts == full, s"$p: byClass rows $parts != slice rows $full")
      val distinctUnion = sl.byClass.values
        .map(_.select("s"))
        .reduce(_.unionByName(_)).distinct().count()
      val fullDistinct = sl.df.select("s").distinct().count()
      assert(distinctUnion == fullDistinct,
        s"$p: byClass subjects diverge from slice subjects")
    }
  }
}
