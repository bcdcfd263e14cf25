package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One NIGHT of the store-backed curation cycle at scale (VERDICT r12 #1's
  * 100× table): bootstrap the five stores from a 99% history lake (the
  * one-time cost, reported per store), then run the nightly path on a 1%
  * batch — quality gate, Bloom probe + exact verify, shingle containment
  * sweep, and the five appends — timing every stage. The claim under test:
  * the NIGHTLY stages are batch-sized (plus pruned index reads), never
  * corpus-sized; only the bootstrap pays the lake.
  *
  * Run: runMain graft.tools.NightlyCurationProbe <docsDir> [cap|auto]
  *   [edgeBudget] [resume=<root>]
  * e.g. `SPARK_DRIVER_MEM=56g sbt "runMain
  *   graft.tools.NightlyCurationProbe /tmp/scaled100x"`
  * `resume=` reuses a previous run's root: each bootstrap stage leaves a
  * `.done-<stage>` marker and is skipped when the marker exists (the
  * 1000× bootstrap is >1 h on this box and a host stall can kill the
  * JVM mid-fold — delete the partial store dir of the unmarked stage
  * before resuming). */
object NightlyCurationProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scaled100x")
    val resumeRoot = args.find(_.startsWith("resume="))
      .map(_.stripPrefix("resume="))
    // the simgraph df cap is THE pair-volume dial (edges ∝ Σ_rare df²):
    // at 1000× on this box the hand-set 50 filled the 62 GB free disk
    // mid-write (r14 rehearsal). DEFAULT IS NOW BUDGET-DERIVED
    // (VERDICT r14 #3): SimGraphStore.capForEdgeBudget walks the lake's
    // own df histogram and returns the largest cap whose exact retained
    // pair volume fits the edge-row budget (arg 3, default 500M rows ≈
    // low-tens-of-GB shuffle+store on this box). Pass a numeric arg 2 to
    // force a cap; "auto" or absent derives.
    val simCapArg = args.lift(1).filterNot(_ == "auto").map(_.toLong)
    val edgeBudget = args.lift(2).map(_.toLong).getOrElse(500000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // a 1000×-scale fold can push a full-heap GC pause (or a host
      // stall) past the 120 s default; in local mode losing the
      // heartbeat WEDGES the scheduler (observed 2026-08-17: a 138 s
      // pause killed a 78-min bootstrap), and the heartbeat protects
      // nothing single-JVM anyway
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "300s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm._
    val base = resumeRoot.getOrElse(java.nio.file.Files
      .createTempDirectory("graft-nightlyprobe").toString)
    val root = base + "/stores"
    def marker(s: String) = java.nio.file.Paths.get(s"$base/.done-$s")
    def doneStage(s: String) = java.nio.file.Files.exists(marker(s))
    val stores = NightlyCuration.Stores(root)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val history = docs.filter(pmod(col("doc_id"), lit(100)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
    val historyEmb = emb.filter(pmod(col("vec_id"), lit(100)) =!= 0)
    println(s"history=${history.count()} batch=${batch.count()} " +
      s"historyEmb=${historyEmb.count()}")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }
    // ---- bootstrap (one-time, corpus-sized by design) — per store
    def stage(s: String, tag: String)(f: => Unit): Unit =
      if (doneStage(s)) println(s"$tag  [resumed: done]")
      else { t(tag)(f); java.nio.file.Files.createFile(marker(s)) }
    stage("bloom", "bootstrap bloom (init+fold 99%)") {
      BloomHistory.init(spark, stores.bloom, mBits = 1 << 24)
      BloomHistory.append(spark, stores.bloom, history, "text")
    }
    stage("shingle", "bootstrap shingle build")(ShingleIndex.build(
      history, "doc_id", "text", stores.shingle, n = 3, nBuckets = 64))
    stage("text", "bootstrap text build")(TextIndex.buildIndex(history,
      "doc_id", "text", stores.text, nBuckets = 64))
    stage("ivf", "bootstrap ivf build") {
      AnnOps.buildIvfIndex(historyEmb, stores.ivf, dim = 64,
        nCentroids = 16,
        centroids = Some(AnnOps.seedCentroids(historyEmb, 16, 64)))
    }
    val simCap = simCapArg.getOrElse(t(
        s"derive simgraph cap (edge budget $edgeBudget)") {
      val c = SimGraphStore.capForEdgeBudget(
        SimGraphStore.postingsOf(history, "doc_id", "text", 3), edgeBudget)
      println(s"  derived cap: $c")
      c
    })
    stage("simgraph", s"bootstrap simgraph (init+fold, cap=$simCap)") {
      SimGraphStore.init(spark, stores.graph, n = 3, cap = simCap,
        minCommon = 2L)
      SimGraphStore.update(spark, stores.graph, history, "doc_id", "text")
    }
    // ---- the night: admission stages, then the five appends
    val toks = TextOps.tokens(col("text"))
    val quality = t("night: quality gate (count)") {
      val q = batch.filter(size(toks) >= 8 &&
        size(array_distinct(toks)) >= lit(0.3) * size(toks))
      println(s"  quality rows: ${q.count()}")
      q
    }
    val exactDups = t("night: bloom probe + exact verify") {
      val d = BloomHistory.dedupFromStore(spark, stores.bloom,
        quality, "doc_id", "text").localCheckpoint()
      println(s"  exact dups: ${d.count()}")
      d.withColumnRenamed("doc_id", "doc_id")
    }
    val fresh = quality.join(exactDups, Seq("doc_id"), "left_anti")
    val contained = t("night: containment sweep (pruned)") {
      val c = ShingleIndex.containmentAgainst(spark, stores.shingle,
          fresh, "doc_id", "text", 0.8)
        .select(col("ida").as("doc_id")).distinct().localCheckpoint()
      println(s"  contained: ${c.count()}")
      c
    }
    val admitted = t("night: admitted materialize") {
      val a = fresh.join(contained, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      println(s"  admitted: ${a.count()}")
      a
    }
    val admittedEmb = emb.join(
      admitted.select(col("doc_id").as("vec_id")), "vec_id")
    t("night: append bloom")(
      BloomHistory.append(spark, stores.bloom, admitted, "text"))
    t("night: append shingle")(ShingleIndex.appendToIndex(spark,
      stores.shingle, admitted, "doc_id", "text"))
    t("night: append text")(TextIndex.appendToIndex(spark, stores.text,
      admitted, "doc_id", "text"))
    t("night: append ivf")(
      AnnOps.appendToIvfIndex(spark, stores.ivf, admittedEmb, dim = 64))
    t("night: append simgraph")(SimGraphStore.update(spark, stores.graph,
      admitted, "doc_id", "text"))
    spark.stop()
  }
}
