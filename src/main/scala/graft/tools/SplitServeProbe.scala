package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q156 operating-regime probe (VERDICT r14 #1: the served split had only
  * ever been measured on the template-dense synthetic corpus, where it
  * LOSES to the LSH recompute — its winning regime, a CURATED lake with a
  * sparse near-dup graph, was argued but unmeasured, and the regime
  * choice lived in prose).
  *
  * This probe manufactures the curated regime at scale and measures both
  * paths on it:
  *  1. CURATE the scaled corpus the way the nightly cycle would leave a
  *     lake: banded-LSH near-dup clusters (the q60 operator), keep one
  *     canonical document per cluster. The survivors' pairwise near-dup
  *     graph is sparse by construction — exactly a curated lake's state.
  *  2. Build a [[graft.llm.SimGraphStore]] on the curated lake in two
  *     incremental updates (the maintained path, not a one-shot build).
  *  3. Measure [[graft.llm.SampleOps.leakageFreeSplitFromStore]] with the
  *     dial forced to SERVE, the same with the dial on AUTO (must pick
  *     serve and match the forced time), and the LSH recompute
  *     ([[graft.llm.SampleOps.leakageFreeSplit]]).
  * Prints docs, store edges, edges/doc, and the three wall times. Paired
  * with the r14 dense-corpus measurement (13.3M edges / 500k docs =
  * 26.6 edges/doc: served 109 s vs recompute 20 s) this brackets the
  * crossover that `serveEdgeRatio` encodes: per-edge verify cost a vs
  * per-doc LSH cost b ⇒ crossover at b/a edges per doc.
  *
  * Usage: runMain graft.tools.SplitServeProbe [dir] [dense]
  *   [resume=<root>] [sparseOnly]
  * `resume=` reuses a previous run's curated parquet + store (stages 1–2
  * are expensive and deterministic); `sparseOnly` skips the stage-3
  * dense-regime measurements and goes straight to the 2b sparse stage.
  */
object SplitServeProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scaled100x")
    val alsoDense = args.contains("dense")
    val resumeRoot = args.find(_.startsWith("resume="))
      .map(_.stripPrefix("resume="))
    val sparseOnly = args.contains("sparseOnly")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm._
    val root = resumeRoot.getOrElse(java.nio.file.Files
      .createTempDirectory("graft-splitprobe").toString)
    def exists(p: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(p))
    def t[A](tag: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-42s $secs%8.2f s")
      (a, secs)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"corpus docs: ${docs.count()}")

    // ---- 1. curate: collapse LSH near-dup clusters to their canonical
    // (minimum-id) member — the post-curation lake
    val curatedPath = s"$root/curated"
    if (!exists(curatedPath)) t("curate (LSH clusters -> canonicals)") {
      val pairs = TextOps.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 128, rowsPerBand = 2, threshold = 0.5)
      val cc = TextOps.connectedComponents(
        pairs.select(col("ida"), col("idb")))
      val drop = cc.filter(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"))
      docs.join(drop, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(curatedPath)
    }
    val curated = spark.read.parquet(curatedPath)
    val nCur = curated.count()
    println(s"curated docs: $nCur")

    // ---- 2. maintained store on the curated lake
    val store = s"$root/graph"
    if (!exists(store)) t("store: init + 2 incremental folds") {
      SimGraphStore.init(spark, store, n = 3, cap = 50L, minCommon = 2L)
      SimGraphStore.update(spark, store,
        curated.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      SimGraphStore.update(spark, store,
        curated.filter(pmod(col("doc_id"), lit(2)) =!= 0), "doc_id", "text")
    }
    val (nEdges, _) = t("store edge count (the dial's read)") {
      SimGraphStore.edges(spark, store).count()
    }
    println(f"edges/doc: ${nEdges.toDouble / nCur}%.3f")

    // ---- 3. the three measurements
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    if (!sparseOnly) {
      t("served split (dial forced to serve)") {
        noop(SampleOps.leakageFreeSplitFromStore(spark, store, curated,
          "doc_id", "text", splits,
          serveEdgeRatio = Double.PositiveInfinity))
      }
      t("served split (dial on auto)") {
        noop(SampleOps.leakageFreeSplitFromStore(spark, store, curated,
          "doc_id", "text", splits))
      }
      t("LSH recompute (leakageFreeSplit)") {
        noop(SampleOps.leakageFreeSplit(curated, "doc_id", "text", splits))
      }
    }

    // ---- 2b. the NIGHTLY-GATE regime: the LSH curation above leaves the
    // template corpus's sub-threshold near-dups (≥2 shared rare shingles
    // but J < 0.5) in place, so the rare-shingle graph stays dense — but
    // a lake maintained by the admission gate never ACCUMULATES those
    // pairs in the first place (near-contained docs are rejected against
    // the current lake). Manufacture that state directly: collapse the
    // maintained graph's own components to canonicals and rebuild the
    // store on the survivors — the graph a long-curated lake carries.
    val curated2Path = s"$root/curated2"
    if (!exists(curated2Path)) t("graph-curate (store CC -> canonicals)") {
      val cc2 = TextOps.connectedComponents(
        SimGraphStore.edges(spark, store)
          .select(col("a").as("ida"), col("b").as("idb")))
      val drop2 = cc2.filter(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"))
      curated.join(drop2, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(curated2Path)
    }
    val curated2 = spark.read.parquet(curated2Path)
    val nCur2 = curated2.count()
    println(s"graph-curated docs: $nCur2")
    val store2 = s"$root/graph2"
    if (!exists(store2)) t("store2: init + 2 incremental folds") {
      SimGraphStore.init(spark, store2, n = 3, cap = 50L, minCommon = 2L)
      SimGraphStore.update(spark, store2,
        curated2.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      SimGraphStore.update(spark, store2,
        curated2.filter(pmod(col("doc_id"), lit(2)) =!= 0), "doc_id", "text")
    }
    val (nEdges2, _) = t("store2 edge count (the dial's read)") {
      SimGraphStore.edges(spark, store2).count()
    }
    println(f"store2 edges/doc: ${nEdges2.toDouble / nCur2}%.3f")
    t("sparse served split (dial forced to serve)") {
      noop(SampleOps.leakageFreeSplitFromStore(spark, store2, curated2,
        "doc_id", "text", splits,
        serveEdgeRatio = Double.PositiveInfinity))
    }
    t("sparse served split (dial on auto)") {
      noop(SampleOps.leakageFreeSplitFromStore(spark, store2, curated2,
        "doc_id", "text", splits))
    }
    t("sparse LSH recompute (leakageFreeSplit)") {
      noop(SampleOps.leakageFreeSplit(curated2, "doc_id", "text", splits))
    }

    // ---- 2c. the REALISTIC sparse lake at full scale. Stage 2b is
    // degenerate on this synthetic corpus: the template replicas chain
    // the ≥2-shared-rare-shingle graph into giant components, so CC
    // collapse leaves ~1k canonicals — a toy corpus, not a measurement.
    // A lake maintained by the admission gate on REAL data looks
    // different: mostly unique content with a thin tail of lingering
    // near-dups (same-night arrivals, borderline sub-threshold pairs).
    // Manufacture exactly that at 500k docs: deterministic unique token
    // streams (131k vocab — cross-doc shingle collisions are ~vocab⁻³),
    // with 1 doc in 40 a near-duplicate of its predecessor (one token
    // changed). Expected graph: ~0.025 edges/doc — the serve regime.
    val nDocs3 = 500000L
    val sparse3Path = s"$root/sparse3"
    if (!exists(sparse3Path)) t("gen sparse lake (unique + 2.5% pairs)") {
      val seed = when(pmod(col("doc_id"), lit(40)) === 1,
        col("doc_id") - 1).otherwise(col("doc_id"))
      val toks = transform(sequence(lit(0), lit(119)),
        i => concat(lit("w"),
          pmod(xxhash64(seed, i), lit(131072L))))
      // near-dup partner differs in exactly one trailing doc-keyed token
      val text = concat_ws(" ",
        concat(slice(toks, 1, 119),
          array(concat(lit("u"), col("doc_id")))))
      spark.range(nDocs3).select(col("id").as("doc_id"))
        .select(col("doc_id"), text.as("text"))
        .write.mode("overwrite").parquet(sparse3Path)
    }
    val sparse3 = spark.read.parquet(sparse3Path)
    val store3 = s"$root/graph3"
    if (!exists(store3)) t("store3: init + 2 incremental folds") {
      SimGraphStore.init(spark, store3, n = 3, cap = 50L, minCommon = 2L)
      SimGraphStore.update(spark, store3,
        sparse3.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      SimGraphStore.update(spark, store3,
        sparse3.filter(pmod(col("doc_id"), lit(2)) =!= 0), "doc_id", "text")
    }
    val (nEdges3, _) = t("store3 edge count (the dial's read)") {
      SimGraphStore.edges(spark, store3).count()
    }
    println(f"store3 edges/doc: ${nEdges3.toDouble / nDocs3}%.4f")
    t("realistic served split (dial forced to serve)") {
      noop(SampleOps.leakageFreeSplitFromStore(spark, store3, sparse3,
        "doc_id", "text", splits,
        serveEdgeRatio = Double.PositiveInfinity))
    }
    t("realistic served split (dial on auto)") {
      noop(SampleOps.leakageFreeSplitFromStore(spark, store3, sparse3,
        "doc_id", "text", splits))
    }
    t("realistic LSH recompute (leakageFreeSplit)") {
      noop(SampleOps.leakageFreeSplit(sparse3, "doc_id", "text", splits))
    }

    // ---- 2d. the CROSSOVER point: same recipe but near-dup CLIQUES of
    // ten (each block of 10 consecutive docs shares a seed, each member
    // one unique trailing token) → C(10,2)/10 = 4.5 edges/doc, right at
    // the dial's default serveEdgeRatio = 4. Unlike the template corpus
    // (where most candidate edges fail the Jaccard verify), every edge
    // here verifies — the per-edge work is the same either way, so this
    // brackets the default from the regime where serving is HONEST work.
    val sparse4Path = s"$root/sparse4"
    if (!exists(sparse4Path)) t("gen clique lake (blocks of 10)") {
      val seed = col("doc_id") - pmod(col("doc_id"), lit(10))
      val toks = transform(sequence(lit(0), lit(119)),
        i => concat(lit("w"),
          pmod(xxhash64(seed, i), lit(131072L))))
      val text = concat_ws(" ",
        concat(slice(toks, 1, 119),
          array(concat(lit("u"), col("doc_id")))))
      spark.range(nDocs3).select(col("id").as("doc_id"))
        .select(col("doc_id"), text.as("text"))
        .write.mode("overwrite").parquet(sparse4Path)
    }
    val sparse4 = spark.read.parquet(sparse4Path)
    val store4 = s"$root/graph4"
    if (!exists(store4)) t("store4: init + 2 incremental folds") {
      SimGraphStore.init(spark, store4, n = 3, cap = 50L, minCommon = 2L)
      SimGraphStore.update(spark, store4,
        sparse4.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      SimGraphStore.update(spark, store4,
        sparse4.filter(pmod(col("doc_id"), lit(2)) =!= 0), "doc_id", "text")
    }
    val (nEdges4, _) = t("store4 edge count (the dial's read)") {
      SimGraphStore.edges(spark, store4).count()
    }
    println(f"store4 edges/doc: ${nEdges4.toDouble / nDocs3}%.4f")
    t("crossover served split (dial forced to serve)") {
      noop(SampleOps.leakageFreeSplitFromStore(spark, store4, sparse4,
        "doc_id", "text", splits,
        serveEdgeRatio = Double.PositiveInfinity))
    }
    t("crossover LSH recompute (leakageFreeSplit)") {
      noop(SampleOps.leakageFreeSplit(sparse4, "doc_id", "text", splits))
    }

    if (alsoDense) {
      // the r14 dense-regime measurement, re-run for the record: store
      // over the UNCURATED corpus, served vs recompute
      val dstore = s"$root/graph-dense"
      t("dense store: init + fold (uncurated)") {
        SimGraphStore.init(spark, dstore, n = 3, cap = 50L, minCommon = 2L)
        SimGraphStore.update(spark, dstore, docs, "doc_id", "text")
      }
      val (de, _) = t("dense edge count") {
        SimGraphStore.edges(spark, dstore).count()
      }
      println(f"dense edges/doc: ${de.toDouble / docs.count()}%.3f")
      t("dense served split (forced serve)") {
        noop(SampleOps.leakageFreeSplitFromStore(spark, dstore, docs,
          "doc_id", "text", splits,
          serveEdgeRatio = Double.PositiveInfinity))
      }
      t("dense auto (must pick recompute)") {
        noop(SampleOps.leakageFreeSplitFromStore(spark, dstore, docs,
          "doc_id", "text", splits))
      }
      t("dense LSH recompute") {
        noop(SampleOps.leakageFreeSplit(docs, "doc_id", "text", splits))
      }
    }
    spark.stop()
  }
}
