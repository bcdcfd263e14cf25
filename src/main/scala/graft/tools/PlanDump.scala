package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for catalog entries to files — the
  * optimization-round evidence trail (plans/rNN/<entry>_<tag>.txt).
  *
  * Run: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [q1,q2,...]
  *
  * Notes:
  *  - building an entry's DataFrame executes any lifecycle side effects
  *    the entry performs before returning its final frame (store
  *    bootstraps, streamed nights); the dumped plan is the SERVE plan —
  *    the part a plan file can evidence;
  *  - uses the same session shape as Bench (cpus, AQE, initial
  *    partitions) so the dumped plans match what the bench executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val only: Option[Set[String]] = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "256"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    def selected(name: String): Boolean =
      only.forall(_.exists(tok => name == tok || name.startsWith(tok)))
    graft.SparkEntry.catalog.filter(q => selected(q.name)).foreach { q =>
      try {
        val df = q.fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${q.name}_$tag.txt"), plan)
        println(s"[plandump] ${q.name} ok")
      } catch {
        case e: Throwable =>
          println(s"[plandump] ${q.name} FAILED: ${e.getMessage}")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
