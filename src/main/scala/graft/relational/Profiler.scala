package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass column profiler — the data-quality triage op run first
  * against an unknown table (row count, null count, exact distinct count,
  * min/max, sum per column).
  *
  * Plan shape (measured, sf0.1 lineitem, local[32]): TWO aggregations
  * over the scan, crossJoined as 1-row frames —
  *  - plain metrics (count/null/min/max/sum, all columns) in one
  *    HashAggregate that partial-aggregates map-side, and
  *  - the multi-column exact COUNT(DISTINCT) block in Catalyst's
  *    single-Expand rewrite.
  * The FUSED spelling (every metric in one .agg) measured 7–9 s vs
  * 1.8 s for this split: fusing forces the plain aggs through the
  * distinct rewrite's Expand, multiplying rows ×(|distinct cols|+1)
  * through 19 null-guarded agg functions. The split pays a second scan —
  * at lake scale cache the input (or accept the scan; both aggregations
  * remain map-side-partial, shuffling only per-partition aggregate
  * states). Never a per-column driver loop launching one job per metric.
  *
  * Exactness discipline (the catalog convention): numeric mins/maxes/sums
  * travel as ×`scale` scaled BIGINTs — a double SUM would diverge across
  * engines on partial-aggregation order. The profiled doubles here are
  * cents/percent values, exact at scale=100. Approximate profiling at
  * lake scale swaps the exact distinct for the KMV sketch aggregate
  * (functions.KmvSketchAgg) — same shape, bounded state. */
object Profiler {

  def profile(df: DataFrame, numeric: Seq[String], strings: Seq[String],
      scale: Int = 100): DataFrame = {
    require(numeric.nonEmpty || strings.nonEmpty, "profile needs columns")
    val all = numeric ++ strings
    val fixed = (c: String) => round(col(c) * scale).cast(LongType)
    val plainAggs: Seq[org.apache.spark.sql.Column] =
      Seq(count(lit(1)).as("n_rows")) ++
      numeric.flatMap { c =>
        Seq((count(lit(1)) - count(col(c))).as(s"nn_$c"),
          min(fixed(c)).as(s"mn_$c"), max(fixed(c)).as(s"mx_$c"),
          sum(fixed(c)).as(s"sm_$c"))
      } ++
      strings.flatMap { c =>
        Seq((count(lit(1)) - count(col(c))).as(s"nn_$c"),
          min(col(c)).as(s"mns_$c"), max(col(c)).as(s"mxs_$c"))
      }
    val distinctAggs: Seq[org.apache.spark.sql.Column] =
      all.map(c => count_distinct(col(c)).as(s"nd_$c"))
    val one = df.agg(plainAggs.head, plainAggs.tail: _*)
      .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail: _*))
    // unpivot as ONE select over the 1-row join (explode of a struct
    // array) — a union of per-column selects would re-plan the aggregates
    // once per branch
    val nullL = lit(null).cast(LongType)
    val nullS = lit(null).cast(StringType)
    val rowStructs =
      numeric.map { c =>
        struct(lit(c).as("col"), col("n_rows"),
          col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
          col(s"mn_$c").as("min_c"), col(s"mx_$c").as("max_c"),
          col(s"sm_$c").as("sum_c"), nullS.as("min_s"), nullS.as("max_s"))
      } ++
      strings.map { c =>
        struct(lit(c).as("col"), col("n_rows"),
          col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
          nullL.as("min_c"), nullL.as("max_c"), nullL.as("sum_c"),
          col(s"mns_$c").as("min_s"), col(s"mxs_$c").as("max_s"))
      }
    one.select(explode(array(rowStructs: _*)).as("r")).select("r.*")
  }
}
