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
  * Usage: runMain graft.tools.SplitServeProbe [dir] [alsoDense]
  */
object SplitServeProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scaled100x")
    val alsoDense = args.lift(1).contains("dense")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm._
    val root = java.nio.file.Files
      .createTempDirectory("graft-splitprobe").toString
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
    t("curate (LSH clusters -> canonicals)") {
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
    t("store: init + 2 incremental folds") {
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
