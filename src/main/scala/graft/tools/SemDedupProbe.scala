package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup with the PRODUCTION quantizer at scale (VERDICT r11 #7): the
  * gate pins deterministic seed centroids; real pipelines pass trained
  * k-means|| cells, and skewed LEARNED-cell occupancy is the known
  * SemDeDup failure mode (one mega-cell turns the within-cell join
  * quadratic). Runs semDedup on a directory's embeddings with (a) seed
  * centroids and (b) kmeansParCentroids, both at the occupancy-derived
  * auto cell count, and reports wall time plus the assignment occupancy
  * distribution (max/mean/p99) — the number AQE's skew split has to
  * absorb.
  *
  * Run: runMain graft.tools.SemDedupProbe <dir> [threshold] */
object SemDedupProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scaled100x")
    val thr = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // NOT localCheckpointed: the between-pass unpersist-everything would
    // destroy the truncated-lineage blocks pass 2 needs (the
    // PageRankProbe lesson); re-reading parquet is what the operator
    // pays in production anyway
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val nc = math.max(16L, math.min(1L << 16, (n + 1023L) / 1024L)).toInt
    println(s"vectors=$n  auto cells=$nc")
    def occupancy(cents: Array[(Long, Array[Float], Double)]): Unit = {
      // the operator's own assignment kernel — the distribution AQE's
      // skew split has to absorb in the within-cell join
      val occ = graft.llm.AnnOps.ivfAssignments(emb, cents, 64)
        .groupBy("cid").count()
        .select("count").collect().map(_.getLong(0)).sorted
      val mean = occ.sum.toDouble / math.max(1, occ.length)
      val p99 = occ((occ.length * 99) / 100 min (occ.length - 1))
      println(f"  occupancy: cells=${occ.length} max=${occ.max} " +
        f"p99=$p99 mean=$mean%.1f max/mean=${occ.max / mean}%.2f")
    }
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); a
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val seedOut = t("seed cells semDedup") {
        graft.llm.AnnOps.semDedup(emb, threshold = thr, dim = 64).count()
      }
      println(s"  seed removed=$seedOut")
      val cents = t("kmeans|| training") {
        graft.llm.AnnOps.kmeansParCentroids(emb, nc, dim = 64)
      }
      occupancy(cents)
      val trainedOut = t("trained cells semDedup") {
        graft.llm.AnnOps.semDedup(emb, threshold = thr, dim = 64,
          centroids = Some(cents)).count()
      }
      println(s"  trained removed=$trainedOut")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
