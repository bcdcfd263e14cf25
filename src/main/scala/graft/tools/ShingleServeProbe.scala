package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rehearsal probe for the ShingleIndex serve split (VERDICT r10 #1):
  * times the full self-sweep and an incremental 1%-batch sweep against
  * the same persisted index — the batch sweep is the recurring-curation
  * serve path and must scale with the batch, not the corpus.
  * Run: `runMain graft.tools.ShingleServeProbe <dir> <indexPath>`
  * (index is built first if absent). */
object ShingleServeProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val idx = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(idx, "_graft_shingle_meta.json"))) {
      val t0 = System.nanoTime()
      graft.llm.ShingleIndex.build(docs, "doc_id", "text", idx, n = 3,
        nBuckets = 64)
      println(f"build                        ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    } else println("index reused")
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = mk.count()
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // ~1% of the corpus posing as "tonight's batch". NOT localCheckpointed:
    // time() unpersists everything between passes and a checkpointed frame
    // cannot recompute (the PageRankProbe lesson) — the filter re-reads,
    // which is what a real batch sweep pays anyway.
    val batch = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
    println(s"batch docs = ${batch.count()}")
    for (pass <- 1 to 2) {
      time(s"batch-vs-index (pass $pass)") {
        graft.llm.ShingleIndex.containmentAgainst(spark, idx, batch,
          "doc_id", "text", 0.8)
      }
    }
    // the r12 nightly lifecycle: fold the batch in as an epoch, serve a
    // SECOND disjoint batch against the now-two-epoch index (cross-epoch
    // candidates pay the waived positional filter — this prices that),
    // then compact (global re-rank) and serve again
    val batch2 = docs.filter(pmod(col("doc_id"), lit(100)) === 50)
    locally {
      val t0 = System.nanoTime()
      // shift appended ids out of the corpus id space (append contract:
      // new ids) — same text, so candidate volume is realistic
      graft.llm.ShingleIndex.appendToIndex(spark, idx,
        batch.select((col("doc_id") + (1L << 40)).as("doc_id"), col("text")),
        "doc_id", "text")
      println(f"appendToIndex (1%% batch)     ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    for (pass <- 1 to 2) {
      time(s"batch-vs-2epoch (pass $pass)") {
        graft.llm.ShingleIndex.containmentAgainst(spark, idx, batch2,
          "doc_id", "text", 0.8)
      }
    }
    locally {
      val t0 = System.nanoTime()
      graft.llm.ShingleIndex.compactIndex(spark, idx)
      println(f"compactIndex                 ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("batch-vs-compacted") {
      graft.llm.ShingleIndex.containmentAgainst(spark, idx, batch2,
        "doc_id", "text", 0.8)
    }
    time("full self-sweep") {
      graft.llm.ShingleIndex.containmentSelf(spark, idx, 0.8)
    }
    spark.stop()
  }
}
