package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random samples (`df.sample`) are useless for a dataset you must be able
  * to REBUILD: re-running the pipeline, or running it on another engine,
  * must select the exact same rows. The standard fix is hash sampling —
  * keep a row iff a cryptographic hash of its id falls under the rate
  * threshold — which is reproducible everywhere md5 exists, uniform by the
  * hash's mixing, and consistent across engines (DuckDB selects the
  * identical row set, which is exactly how the oracle checks it).
  */
object SampleOps {

  /** First 16 bits of md5(id) as a 4-hex-char string. Lowercase fixed-width
    * hex compares lexicographically in numeric order, so thresholds can be
    * plain string literals and the filter stays a codegen'd comparison. */
  def hashBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(md5(id.cast("string")), 1, 4)

  /** Rate → 4-hex-digit threshold ('0000'..'ffff'; rate 1.0 → "g", which
    * sorts above every hex string). */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val t = math.round(rate * 65536.0)
    if (t >= 65536L) "g" else f"$t%04x"
  }

  /** Stratified deterministic sample: each stratum (value of `strataCol`)
    * keeps its own fraction of rows, selected by id-hash. Rates ship as a
    * BROADCAST join against a rates table (strata counts are catalog-sized;
    * a when-chain would bake thousands of literals into one expression) and
    * the final filter is a map-side string comparison — no shuffle of `df`
    * at any scale. Strata absent from `rates` fall back to `defaultRate`. */
  def hashStratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rdf = rates.toSeq.map { case (s, r) => (s, rateThreshold(r)) }
      .toDF(strataCol, "__thr")
    df.join(broadcast(rdf), Seq(strataCol), "left_outer")
      .withColumn("__thr",
        coalesce(col("__thr"), lit(rateThreshold(defaultRate))))
      .filter(hashBucket(col(idCol)) < col("__thr"))
      .drop("__thr")
  }
}
