package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The STREAMED store lifecycles at scale (VERDICT r12 #6): the q143
  * simgraph lifecycle and the StreamingShingleIndex maintenance have
  * batch-path 100× rows but no streamed ones. This probe stages three 2%
  * document slices as one file each (one file per AvailableNow
  * micro-batch), then for each store: bootstrap from a 50% base, stream
  * two slices in, run the store's compaction in the maintenance slot,
  * stage the third slice, and RESUME THE SAME CHECKPOINT — timing every
  * phase. Claim under test: foreachBatch inherits the batch append costs
  * (the fold IS the batch fold) and the checkpoint resume adds nothing
  * beyond stream startup.
  *
  * Run: runMain graft.tools.StreamingLifecycleProbe <docsDir> */
object StreamingLifecycleProbe {

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
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files
      .createTempDirectory("graft-streamprobe").toString
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }
    // base = doc_id % 100 in [0, 50); slices = [50,52) [52,54) [54,56)
    def slice(lo: Int, hi: Int) = docs.filter(
      pmod(col("doc_id"), lit(100)) >= lo && pmod(col("doc_id"), lit(100)) < hi)
    def stage(src: String, lo: Int, hi: Int, name: String): Unit = {
      val tmp = s"$base/stage-$name"
      slice(lo, hi).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new Path(tmp)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.mkdirs(new Path(src))
      fs.rename(part, new Path(src, s"$name.parquet"))
      fs.delete(new Path(tmp), true)
    }

    // ---- streamed SimGraphStore lifecycle
    locally {
      val (src, store, ck) = (s"$base/sg-src", s"$base/sg-store", s"$base/sg-ck")
      graft.llm.SimGraphStore.init(spark, store, n = 3, cap = 50L,
        minCommon = 2L)
      t("simgraph: base fold (50%, batch)")(
        graft.llm.SimGraphStore.update(spark, store, slice(0, 50),
          "doc_id", "text"))
      stage(src, 50, 52, "b0"); stage(src, 52, 54, "b1")
      // the base fold committed bid 0 → the stream's engine ids start
      // at 0 and must map above it (bidOffset = #bootstrap folds; the
      // r13 replay-signature check fails loudly without it — which is
      // how this very probe surfaced the seam)
      t("simgraph: stream 2 slices (2% each)")(
        graft.streaming.StreamingSimGraph.run(spark, src, store, ck,
          bidOffset = 1L))
      t("simgraph: mid-stream compact")(
        graft.llm.SimGraphStore.compact(spark, store))
      stage(src, 54, 56, "b2")
      t("simgraph: resume checkpoint +1 slice")(
        graft.streaming.StreamingSimGraph.run(spark, src, store, ck,
          bidOffset = 1L))
      t("simgraph: serve edges (count)") {
        val n = graft.llm.SimGraphStore.edges(spark, store).count()
        println(s"  edges: $n")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // ---- streamed ShingleIndex lifecycle
    locally {
      val (src, idx, ck) = (s"$base/sh-src", s"$base/sh-idx", s"$base/sh-ck")
      t("shingle: build (50%, batch)")(
        graft.llm.ShingleIndex.build(slice(0, 50), "doc_id", "text", idx,
          n = 3, nBuckets = 64))
      stage(src, 50, 52, "b0"); stage(src, 52, 54, "b1")
      t("shingle: stream 2 slices (2% each)")(
        graft.streaming.StreamingShingleIndex.run(spark, src, idx, ck))
      t("shingle: mid-stream compact")(
        graft.llm.ShingleIndex.compactIndex(spark, idx))
      stage(src, 54, 56, "b2")
      t("shingle: resume checkpoint +1 slice")(
        graft.streaming.StreamingShingleIndex.run(spark, src, idx, ck))
      t("shingle: containmentAgainst probe") {
        val probePath = s"$base/sh-probe"
        docs.filter(pmod(xxhash64(col("doc_id")), lit(1000)) === 0)
          .write.mode("overwrite").parquet(probePath)
        val n = graft.llm.ShingleIndex.containmentAgainst(spark, idx,
          spark.read.parquet(probePath), "doc_id", "text", 0.8).count()
        println(s"  pairs: $n")
      }
    }
    spark.stop()
  }
}
