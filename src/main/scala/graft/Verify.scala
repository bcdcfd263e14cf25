package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Output-schema lint: the driver's pandas canonicalizer sorts rows by
    * every column, which dies on nested values (`unhashable type:
    * numpy.ndarray` — the r6 q95 failure). Catalog outputs must therefore
    * be scalar-only; array results use the q15/q95 concat_ws convention.
    * Failing here names the entry at build time instead of erring a
    * driver-gate row. */
  def assertScalarSchema(name: String, schema: StructType): Unit = {
    val nested = schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType] ||
                f.dataType.isInstanceOf[StructType] ||
                f.dataType == BinaryType =>
        s"${f.name}: ${f.dataType.simpleString}"
    }
    require(nested.isEmpty,
      s"catalog entry '$name' emits non-scalar column(s) the driver " +
        s"harness cannot canonicalize — ${nested.mkString(", ")}; " +
        "stringify (concat_ws/base64) before returning")
  }
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS) — read as Long nanos.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write micros (not INT96) so the driver-side reader sees plain int64.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      // repartition(1): single output file for the driver, but behind a
      // shuffle so the query itself keeps its parallelism (coalesce(1)
      // would collapse the whole upstream plan to one task)
      try {
        val df = fn(spark, sfDir)
        assertScalarSchema(name, df.schema)
        df.repartition(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release localCheckpoint blocks between entries (same hygiene as
      // Bench: queries never share persisted state)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
