package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass column profiler — the data-quality triage op run first
  * against an unknown table (row count, null count, exact distinct count,
  * min/max, sum per column).
  *
  * Scale (100 TB lens): ONE aggregation over ONE scan produces every
  * metric for every profiled column. The plain metrics (count/null/min/
  * max/sum) partial-aggregate map-side; the multi-column exact
  * COUNT(DISTINCT) side is Catalyst's standard single-Expand rewrite
  * (rows × |profiled columns|, de-duplicated per group BEFORE the
  * exchange) — never one scan per column, never a driver loop launching
  * per-column jobs. The final 1-row → |columns|-rows unpivot is a stack()
  * over the aggregate, free.
  *
  * Exactness discipline (the catalog convention): numeric mins/maxes/sums
  * travel as ×`scale` scaled BIGINTs — a double SUM would diverge across
  * engines on partial-aggregation order. The profiled doubles here are
  * cents/percent values, exact at scale=100. Approximate profiling at
  * lake scale swaps the exact distinct for the KMV sketch aggregate
  * (functions.KmvSketchAgg) — same one-pass shape, bounded state. */
object Profiler {

  def profile(df: DataFrame, numeric: Seq[String], strings: Seq[String],
      scale: Int = 100): DataFrame = {
    require(numeric.nonEmpty || strings.nonEmpty, "profile needs columns")
    val fixed = (c: String) => round(col(c) * scale).cast(LongType)
    val aggs: Seq[org.apache.spark.sql.Column] =
      Seq(count(lit(1)).as("n_rows")) ++
      numeric.flatMap { c =>
        Seq((count(lit(1)) - count(col(c))).as(s"nn_$c"),
          count_distinct(col(c)).as(s"nd_$c"),
          min(fixed(c)).as(s"mn_$c"), max(fixed(c)).as(s"mx_$c"),
          sum(fixed(c)).as(s"sm_$c"))
      } ++
      strings.flatMap { c =>
        Seq((count(lit(1)) - count(col(c))).as(s"nn_$c"),
          count_distinct(col(c)).as(s"nd_$c"),
          min(col(c)).as(s"mns_$c"), max(col(c)).as(s"mxs_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot as ONE select over the 1-row aggregate (explode of a struct
    // array) — a union of per-column selects would re-plan the aggregate,
    // and with it the scan, once per branch
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
