package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× scale rehearsal for the round-13 curation operators (q148–q153):
  * sliding-window substring dedup, hashed importance selection, fuzzy
  * cross-corpus decontamination, cluster-balanced sampling, and the
  * leakage-free cluster-disjoint split — each timed once on the scaled
  * corpus ([[MakeScaledData]] output), with the shape notes STATUS.md
  * records. The decontamination eval side is a ~0.5% hash slice — the
  * realistic shape (benchmark suites are tiny next to the training
  * corpus) and the documented scale argument: its cost is bounded by the
  * EVAL side's posting lists, not the corpus pair space.
  *
  * Run: runMain graft.tools.CurationOpsProbe <scaledDir> [ops]
  * e.g. `runMain graft.tools.CurationOpsProbe /tmp/scaled100x all` */
object CurationOpsProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scaled100x")
    val ops = args.lift(1).getOrElse("all")
    def on(name: String): Boolean =
      ops == "all" || ops.split(",").map(_.trim).contains(name)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.{SampleOps, TextOps}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"corpus: ${docs.count()} docs, ${emb.count()} vectors")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s   rows=$n")
    }
    if (on("substring")) t("substringSpanDedup") {
      // count() forces the full clean_text construction, not just the spans
      TextOps.substringSpanDedup(docs, "doc_id", "text", k = 5, minDocs = 2)
        .filter(col("n_removed") > 0).count()
    }
    if (on("substringAB")) {
      // hashed vs text gram keys (VERDICT r13 #4): same answer, the
      // shuffle carries 8 B hashes vs full gram strings — record wall
      // AND shuffle-write bytes per variant via a stage listener
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      for (hashed <- Seq(true, false)) {
        shuffleBytes.set(0L)
        t(s"substringSpanDedup hashed=$hashed") {
          TextOps.substringSpanDedup(docs, "doc_id", "text", k = 5,
              minDocs = 2, hashedGramKeys = hashed)
            .filter(col("n_removed") > 0).count()
        }
        // settle the async listener queue before reading the counter
        Thread.sleep(2000)
        println(f"  shuffle write: ${shuffleBytes.get / 1e6}%10.1f MB")
      }
      spark.sparkContext.removeSparkListener(listener)
    }
    if (on("simhashClusters")) t("simhashNearDupClusters (q155)") {
      // the composed operator: exact-dup collapse → rep-only hamming
      // pairs → CC → per-doc labels; output is n rows, cost should be
      // candidate-bound (vs the pair-emitting q154 probe above)
      TextOps.simhashNearDupClusters(docs, "doc_id", "text", maxHamming = 3)
        .count()
    }
    if (on("splitStore")) {
      // q156 at scale: one store build (the maintained-lake stand-in),
      // then the split SERVED from it vs the LSH+CC recompute (q153)
      import graft.llm.SimGraphStore
      val p = java.nio.file.Files
        .createTempDirectory("graft-splitstore-probe").toString + "/g"
      t("splitStore: store build (once)") {
        SimGraphStore.init(spark, p, n = 3, cap = 50L, minCommon = 2L)
        SimGraphStore.update(spark, p, docs.select("doc_id", "text"),
          "doc_id", "text")
        1L
      }
      t("splitStore: store edge count") {
        SimGraphStore.edges(spark, p).count()
      }
      t("splitStore: served split") {
        SampleOps.leakageFreeSplitFromStore(spark, p, docs, "doc_id",
          "text", Seq("train" -> 0.8, "test" -> 0.2))
          .groupBy("split").count().collect().map(_.getLong(1)).sum
      }
      t("splitStore: LSH recompute") {
        SampleOps.leakageFreeSplit(docs, "doc_id", "text",
          Seq("train" -> 0.8, "test" -> 0.2))
          .groupBy("split").count().collect().map(_.getLong(1)).sum
      }
    }
    if (on("importance")) t("hashedImportanceSelect") {
      SampleOps.hashedImportanceSelect(docs, "doc_id", "text",
        isTarget = col("source").isin("src0", "src1"),
        numBuckets = 64, n = 50).count()
    }
    if (on("decontam")) t("crossJaccardDecontamination") {
      // eval = ~0.5% hash slice (the benchmark suite), train = the rest
      val isEval = pmod(xxhash64(col("doc_id")), lit(200)) === 0
      TextOps.crossJaccardDecontamination(
        docs.filter(!isEval), docs.filter(isEval),
        "doc_id", "text", n = 3, threshold = 0.03).count()
    }
    if (on("simhash")) t("simhashNearDupPairs") {
      TextOps.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
        .count()
    }
    if (on("balanced")) t("clusterBalancedSample") {
      SampleOps.clusterBalancedSample(emb, dim = 64, nCells = 256,
        quota = 8).count()
    }
    if (on("split")) t("leakageFreeSplit") {
      SampleOps.leakageFreeSplit(docs, "doc_id", "text",
        Seq("train" -> 0.8, "test" -> 0.2))
        .groupBy("split").count().collect().map(_.getLong(1)).sum
    }
    if (on("contnight")) {
      // the CONTINUOUS mode at 100×: three 0.33% slices drained as three
      // stage+fold nights through one checkpoint. Per-night cost should
      // be the staged mode's stage + fold (admission ~13 s + appends
      // ~18 s at this scale); since r14 the exact-verify reads the
      // Bloom fingerprint sidecar — no per-batch lake re-read at all.
      import graft.llm.NightlyCuration
      import graft.streaming.StreamingNightlyCuration
      import org.apache.hadoop.fs.Path
      val root = java.nio.file.Files
        .createTempDirectory("graft-contprobe").toString
      val stores = NightlyCuration.Stores(s"$root/stores")
      val isBatch = pmod(xxhash64(col("doc_id")), lit(100)) === 0
      val history = docs.filter(!isBatch).localCheckpoint()
      val emb100 = emb.select(col("vec_id"), col("embedding"))
      val histEmb = emb100.join(
        history.select(col("doc_id").as("vec_id")), "vec_id")
      t("contnight: bootstrap (99%)") {
        NightlyCuration.initStores(spark, stores, history, histEmb,
          "doc_id", "text")
        history.count()
      }
      val src = s"$root/feed"
      val fs = new Path(src)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (0 until 3).foreach { i =>
        val tmp = s"$root/stage-$i"
        docs.filter(isBatch && pmod(col("doc_id"), lit(3)) === i)
          .select(col("doc_id"), col("text"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new Path(tmp)).map(_.getPath)
          .find(_.getName.endsWith(".parquet")).get
        fs.mkdirs(new Path(src))
        fs.rename(part, new Path(src, s"b$i.parquet"))
        fs.delete(new Path(tmp), true)
      }
      t("contnight: 3 stage+fold nights") {
        StreamingNightlyCuration.runContinuous(spark, src, stores,
          emb100, s"$root/ck")
        StreamingNightlyCuration.admittedLog(spark, stores).count()
      }
    }
    if (on("night")) {
      // the STREAMED night at 100×: bootstrap the five stores on a 99%
      // lake (the NightlyCurationProbe shape), then stage tonight's 1%
      // batch through the admission gate in three micro-batch slices and
      // fold once — the q152 lifecycle at scale. Staging should price as
      // the batch admission split three ways; the fold as the appends.
      import graft.llm.NightlyCuration
      import graft.streaming.StreamingNightlyCuration
      val stores = NightlyCuration.Stores(java.nio.file.Files
        .createTempDirectory("graft-nightprobe").toString)
      val isBatch = pmod(xxhash64(col("doc_id")), lit(100)) === 0
      val history = docs.filter(!isBatch).localCheckpoint()
      val emb100 = emb.select(col("vec_id"), col("embedding"))
      val histEmb = emb100.join(
        history.select(col("doc_id").as("vec_id")), "vec_id")
      t("night: bootstrap (99%)") {
        NightlyCuration.initStores(spark, stores, history, histEmb,
          "doc_id", "text")
        history.count()
      }
      val slices = (0 until 3).map(i =>
        docs.filter(isBatch && pmod(col("doc_id"), lit(3)) === i)
          .select(col("doc_id"), col("text")).localCheckpoint())
      slices.zipWithIndex.foreach { case (sl, b) =>
        t(s"night: stage slice $b") {
          StreamingNightlyCuration.stageBatch(sl, b.toLong, stores)
          sl.count()
        }
      }
      t("night: staged admitted") {
        StreamingNightlyCuration.stagedAdmitted(spark, stores).count()
      }
      t("night: endOfNight fold") {
        StreamingNightlyCuration.endOfNight(spark, stores, emb100,
          nightId = 1L)
        1L
      }
    }
    spark.stop()
  }
}
