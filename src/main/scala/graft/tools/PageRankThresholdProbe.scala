package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank broadcast-vs-shuffled crossover probe (VERDICT r11 #6): after
  * the r11 edge-layout fix, the forced-shuffled path beat broadcast at
  * 2.1M nodes — below the 4M `broadcastNodesBelow` default — so the
  * default needed re-deriving FROM DATA. Builds the q116 part–supp
  * bipartite graph from a directory's lineitem at several node scales
  * (modulo-subsampled parts below the full graph; an id-offset disjoint
  * copy above it) and times BOTH paths per scale in one JVM — one calm
  * window, within-window ordering is the trustworthy signal on this box.
  *
  * Run: runMain graft.tools.PageRankThresholdProbe <dir>
  * (56 g driver recommended at the 100× dir: SPARK_DRIVER_MEM=56g). */
object PageRankThresholdProbe {

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
    // NOT localCheckpointed: the between-run unpersist-everything would
    // destroy the truncated-lineage blocks later runs need (the
    // PageRankProbe lesson) — each timed run recomputes the distinct from
    // parquet, the same cost for every variant
    val pairs = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("p"),
        col("l_suppkey").cast("long").as("k")).distinct()
    def edgesOf(ps: DataFrame): DataFrame = {
      val fwd = ps.select(col("p").as("s"), (-col("k") - 1).as("d"))
      fwd.union(ps.select((-col("k") - 1).as("s"), col("p").as("d")))
    }
    // node scales: quarter/half/full via part-id subsampling; ~2× full
    // via a disjoint id-offset copy (same degree structure, twice the
    // nodes and edges)
    val offset = 1L << 40
    val variants: Seq[(String, DataFrame)] = Seq(
      "quarter" -> edgesOf(pairs.filter(pmod(col("p"), lit(4)) === 0)),
      "half" -> edgesOf(pairs.filter(pmod(col("p"), lit(2)) === 0)),
      "full" -> edgesOf(pairs),
      "double" -> {
        val shifted = pairs.select((col("p") + offset).as("p"),
          (col("k") + offset).as("k"))
        edgesOf(pairs).union(edgesOf(shifted))
      })
    def time(tag: String, edges: DataFrame, threshold: Long): Unit = {
      val t0 = System.nanoTime()
      val n = graft.relational.GraphAlgos.pageRankFixedPoint(edges,
        iterations = 5, broadcastNodesBelow = threshold).count()
      println(f"$tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ranks=$n")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // optional second arg: comma list of variant names — a targeted
    // confirmation run (r13: re-checking the tie at the memory-derived
    // threshold's boundary) without paying all four scales
    val only: Set[String] = args.lift(1) match {
      case None | Some("all") => variants.map(_._1).toSet
      case Some(s) => s.split(",").map(_.trim).toSet
    }
    println("derived broadcastNodesBelow on this JVM: " +
      graft.relational.GraphAlgos.derivedBroadcastNodesBelow() +
      s" (maxHeap=${Runtime.getRuntime.maxMemory()})")
    for (pass <- 1 to 2; (name, e) <- variants if only(name)) {
      println(s"--- pass $pass  $name")
      time(s"$name broadcast", e, Long.MaxValue)
      time(s"$name shuffled", e, 0L)
    }
    spark.stop()
  }
}
