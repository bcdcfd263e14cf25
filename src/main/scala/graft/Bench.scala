package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Headline benchmark: runs every catalog query twice (warmup + measured) on
  * SPARK_GRAFT_SF_DIR, materializing through the noop sink so the full plan
  * (sorts/projections included — `.count()` lets Catalyst elide them) is
  * executed. Emits ONE JSON line on stdout and mirrors it to bench.json so
  * the driver can parse it even if sbt pollutes stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, true)
      } catch {
        case _: Throwable => ((System.nanoTime() - t0) / 1e9, false)
      }
    }

    val entries = SparkEntry.catalog.filter(_.bench)
    // Warmup: full pass (JIT + codegen caches + file-listing caches).
    entries.foreach(q => runOnce(q.name, q.fn))
    val results = entries.map { q =>
      val (sec, ok) = runOnce(q.name, q.fn)
      (q.name, sec, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val status = results.map { case (k, _, ok) => "\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nFail = results.count(!_._3)
    // Full detail (per-query ok map) goes to bench.json; the stdout line is
    // kept SHORT and printed LAST (after spark.stop()) because the driver
    // captures only a bounded tail of sbt stdout — in rounds 1–3 the long
    // line fell off the window and "parsed" came back null.
    val full =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"ok":$status,"failed":$nFail,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench.json"), full + "\n")
    spark.stop()
    val line =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"failed":$nFail,"sf":"$sfDir"}"""
    println(line)
    Console.out.flush()
  }
}
