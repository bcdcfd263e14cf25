package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SimGraphStore at a REALISTIC cadence (VERDICT r11 #5): the gate entry
  * folds twice; a production pipeline folds nightly for months. This probe
  * initializes a store, folds a 50% base, then `nBatches` sequential small
  * batches (each 1/(2·nBatches) of the corpus), timing every fold plus the
  * serve (edges()) cost after each — the growth curves the compaction
  * policy has to be set from. `compactAt` (comma list of fold indexes, or
  * "none") injects compactions mid-sequence so the post-compaction fold
  * cost is measured in the same window.
  *
  * Run: runMain graft.tools.SimGraphCadence <docsDir> <nBatches> <compactAt>
  * e.g. `runMain graft.tools.SimGraphCadence /tmp/scaled100x 10 5` */
object SimGraphCadence {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scaled100x")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val compactAt: Set[Int] = args.lift(2) match {
      case None | Some("none") => Set.empty
      case Some(s) => s.split(",").map(_.trim.toInt).toSet
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = java.nio.file.Files
      .createTempDirectory("graft-simcadence").toString + "/store"
    // NOT localCheckpointed: the between-fold unpersist-everything would
    // destroy the truncated-lineage blocks later folds need (the
    // PageRankProbe lesson)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val m = 2L * nBatches // slices: base = buckets [0, nBatches)
    def slice(lo: Int, hi: Int) = docs.filter(
      pmod(col("doc_id"), lit(m)) >= lo && pmod(col("doc_id"), lit(m)) < hi)
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def files(sub: String): Int =
      graft.sources.ParquetCompaction.dataFileCount(spark, s"$store/$sub")
    graft.llm.SimGraphStore.init(spark, store, n = 3, cap = 50L, minCommon = 2L)
    val (_, baseSec) = t(graft.llm.SimGraphStore.update(spark, store,
      slice(0, nBatches), "doc_id", "text"))
    println(f"base fold (50%%):            $baseSec%7.2f s")
    for (i <- 0 until nBatches) {
      if (compactAt.contains(i)) {
        val (_, cs) = t(graft.llm.SimGraphStore.compact(spark, store))
        println(f"  compact before fold $i%2d:   $cs%7.2f s")
      }
      val (_, fs) = t(graft.llm.SimGraphStore.update(spark, store,
        slice(nBatches + i, nBatches + i + 1), "doc_id", "text"))
      val (nEdges, es) = t(
        graft.llm.SimGraphStore.edges(spark, store).count())
      println(f"fold $i%2d: $fs%7.2f s   serve: $es%6.2f s  " +
        f"edges=$nEdges%9d  files(edges/post/df)=${files("edges")}%d/" +
        f"${files("post")}%d/${files("df")}%d")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val (_, finalCompact) = t(graft.llm.SimGraphStore.compact(spark, store))
    val (n2, serveAfter) = t(graft.llm.SimGraphStore.edges(spark, store).count())
    println(f"final compact:              $finalCompact%7.2f s")
    println(f"serve after compact:        $serveAfter%7.2f s  edges=$n2")
    spark.stop()
  }
}
