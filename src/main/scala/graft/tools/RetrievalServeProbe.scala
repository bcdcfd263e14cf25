package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serve-path rehearsal for the r12 persisted-store retrieval (VERDICT
  * r11 #2/#3 "Done" clauses): times the in-memory hybrid kernels against
  * their index-served counterparts on one directory, plus the Bloom
  * history store's append/probe cycle — the numbers that justify "serve
  * from the persisted indexes" at 100 TB.
  *
  * Run: runMain graft.tools.RetrievalServeProbe <dir> */
object RetrievalServeProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scaled100x")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = docs.filter(col("doc_id") < 10)
    val qEmb = emb.filter(col("vec_id") < 10)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      a
    }
    val textIdx = java.nio.file.Files
      .createTempDirectory("graft-ret-text").toString + "/idx"
    val ivfIdx = java.nio.file.Files
      .createTempDirectory("graft-ret-ivf").toString + "/idx"
    t("TextIndex build (once)") {
      graft.llm.TextIndex.buildIndex(docs, "doc_id", "text", textIdx,
        nBuckets = 64)
    }
    t("IVF build (once, 64 cells)") {
      graft.llm.AnnOps.buildIvfIndex(emb, ivfIdx, dim = 64, nCentroids = 64)
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val memLex = t("lexical in-memory (corpus scan)") {
        graft.llm.Retrieval.sharedRareTokenTopK(docs, queries,
          "doc_id", "text", k = 20, dfCap = 50L).count()
      }
      val idxLex = t("lexical from TextIndex") {
        graft.llm.Retrieval.sharedRareTokenTopKFromIndex(spark, textIdx,
          queries, "doc_id", "text", k = 20, dfCap = 50L).count()
      }
      require(memLex == idxLex, s"lexical row mismatch: $memLex vs $idxLex")
      t("dense brute-force (q138 kernel)") {
        graft.llm.AnnOps.topKForQueries(emb, qEmb, 20).count()
      }
      t("dense from IVF (nProbe=8/64)") {
        graft.llm.AnnOps.ivfTopKFromIndex(spark, ivfIdx, qEmb, k = 20,
          dim = 64, nProbe = 8).count()
      }
    }
    // Bloom history store cycle at this scale
    val bloomDir = java.nio.file.Files
      .createTempDirectory("graft-ret-bloom").toString + "/store"
    graft.llm.BloomHistory.init(spark, bloomDir, mBits = 1 << 24, k = 5)
    t("Bloom append (99% history)") {
      graft.llm.BloomHistory.append(spark, bloomDir,
        docs.filter(pmod(col("doc_id"), lit(100)) =!= 0), "text")
    }
    t("Bloom append (1% batch)") {
      graft.llm.BloomHistory.append(spark, bloomDir,
        docs.filter(pmod(col("doc_id"), lit(100)) === 0), "text")
    }
    t("Bloom probe (1% batch)") {
      graft.llm.BloomHistory.probe(spark, bloomDir,
        docs.filter(pmod(col("doc_id"), lit(100)) === 0),
        "doc_id", "text").count()
    }
    println(f"fp rate ${graft.llm.BloomHistory.estimatedFpRate(spark, bloomDir)}%.6f")
    spark.stop()
  }
}
