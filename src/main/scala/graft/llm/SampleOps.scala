package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Exact per-stratum quota sample: the `quota` rows with the smallest
    * md5(id) in each stratum — deterministic "give me exactly N per
    * source" selection (id tie-break makes the order total, so the row
    * set is unique). One shuffle on the stratum key. Exact selection
    * needs a per-stratum order; at scale, pre-filter with
    * [[hashStratifiedSample]] at a rate comfortably above quota/|stratum|
    * first so the sort sees a sliver of the corpus. */
  def hashQuotaSample(df: DataFrame, idCol: String, strataCol: String,
      quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val rn = "__qs_rn"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= quota).drop(rn)
  }

  /** Deterministic train/validation/test split: a `split` label column
    * assigned by md5(id) range. `splits` lists (label, fraction) pairs in
    * order; the LAST label takes the remainder (fractions of all but the
    * last must sum below 1). Map-only, reproducible on any engine, and
    * stable under corpus growth: a row's label never changes when other
    * rows are added, the property random splits lack. */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._1).distinct.size == splits.size, "duplicate labels")
    val head = splits.init
    require(head.map(_._2).sum <= 1.0, "fractions exceed 1")
    val b = hashBucket(col(idCol))
    var cum = 0.0
    var e: Column = null
    head.foreach { case (label, frac) =>
      cum += frac
      val cond = b < lit(rateThreshold(cum))
      e = if (e == null) when(cond, lit(label)) else e.when(cond, lit(label))
    }
    val labeled = if (e == null) lit(splits.last._1) else e.otherwise(lit(splits.last._1))
    df.withColumn(splitCol, labeled)
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
