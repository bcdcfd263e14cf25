package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ShingleIndex at a REALISTIC cadence (VERDICT r12 #2 — the
  * [[SimGraphCadence]] rehearsal applied to the containment index): build
  * on a 50% base, then `nBatches` sequential appends (each 1/(2·nBatches)
  * of the corpus), timing every append plus the nightly serve
  * ([[graft.llm.ShingleIndex.containmentAgainst]] of a fixed ~0.1% probe
  * slice) after each — the growth curves the `compactionDue` policy is
  * set from. The full self-sweep is timed at the start, the end, and
  * after the final compaction (it is minutes at 100×, not a per-fold
  * cost). `compactAt` (comma list of fold indexes, or "none") injects
  * compactions mid-sequence.
  *
  * Run: runMain graft.tools.ShingleCadence <docsDir> <nBatches> <compactAt>
  * e.g. `runMain graft.tools.ShingleCadence /tmp/scaled100x 10 5` */
object ShingleCadence {

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
      .createTempDirectory("graft-shcadence").toString + "/idx"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val m = 2L * nBatches
    def slice(lo: Int, hi: Int) = docs.filter(
      pmod(col("doc_id"), lit(m)) >= lo && pmod(col("doc_id"), lit(m)) < hi)
    // fixed ~0.1% probe batch — the nightly "is tonight's batch contained
    // in the lake" sweep; overlap with indexed docs is fine (self-pairs
    // are id-excluded). Materialized to PARQUET, not localCheckpoint: the
    // between-fold unpersist-everything (needed so the appends' own
    // checkpoint blocks don't accumulate across 10 folds) would destroy a
    // checkpointed probe's blocks mid-sequence.
    val probePath = java.nio.file.Files
      .createTempDirectory("graft-shcadence-probe").toString + "/probe"
    docs.filter(pmod(xxhash64(col("doc_id")), lit(1000)) === 0)
      .write.mode("overwrite").parquet(probePath)
    val probe = spark.read.parquet(probePath)
    println(s"probe batch: ${probe.count()} docs")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    import graft.llm.ShingleIndex
    val (_, buildSec) = t(ShingleIndex.build(slice(0, nBatches),
      "doc_id", "text", store, n = 3, nBuckets = 64))
    println(f"build (50%%):                $buildSec%7.2f s")
    val (n0, against0) = t(ShingleIndex.containmentAgainst(spark, store,
      probe, "doc_id", "text", 0.8).count())
    println(f"against @1 epoch:           $against0%7.2f s  pairs=$n0")
    val (s0, self0) = t(ShingleIndex.containmentSelf(spark, store, 0.8).count())
    println(f"self   @1 epoch:            $self0%7.2f s  pairs=$s0")
    for (i <- 0 until nBatches) {
      if (compactAt.contains(i)) {
        val (_, cs) = t(ShingleIndex.compactIndex(spark, store))
        println(f"  compact before fold $i%2d:   $cs%7.2f s")
      }
      val (_, fs) = t(ShingleIndex.appendToIndex(spark, store,
        slice(nBatches + i, nBatches + i + 1), "doc_id", "text"))
      val (np, as) = t(ShingleIndex.containmentAgainst(spark, store,
        probe, "doc_id", "text", 0.8).count())
      println(f"fold $i%2d: append $fs%7.2f s   against: $as%6.2f s  " +
        f"pairs=$np%7d  due=${ShingleIndex.compactionDue(spark, store)}")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val (sDeep, selfDeep) = t(ShingleIndex.containmentSelf(spark, store, 0.8).count())
    println(f"self   @deep epochs:        $selfDeep%7.2f s  pairs=$sDeep")
    val (_, finalCompact) = t(ShingleIndex.compactIndex(spark, store))
    println(f"final compact:              $finalCompact%7.2f s")
    val (nAfter, againstAfter) = t(ShingleIndex.containmentAgainst(spark,
      store, probe, "doc_id", "text", 0.8).count())
    println(f"against after compact:      $againstAfter%7.2f s  pairs=$nAfter")
    val (sAfter, selfAfter) = t(ShingleIndex.containmentSelf(spark, store, 0.8).count())
    println(f"self   after compact:       $selfAfter%7.2f s  pairs=$sAfter")
    spark.stop()
  }
}
