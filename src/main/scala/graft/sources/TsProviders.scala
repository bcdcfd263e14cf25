package graft.sources

import graft.graph.TsProvider
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet-backed time-series provider — the scale path for the hybrid
  * engine's pluggable backend (the reference's Arrow-Flight/Dremio impl,
  * hybrid/src/timeseries_database/arrow_flight_sql_database.rs, re-expressed
  * as a lake source: at 100 TB the series live as (id-partitioned) parquet
  * and "the database" IS the object store).
  *
  * The provider only declares the mapping from physical columns to the
  * engine's long format; the executor's per-query time/id predicates reach
  * the scan through Catalyst — time filters as `PushedFilters` row-group
  * pruning, constant-series lookups as `PartitionFilters` directory pruning
  * when the dataset is `partitionBy(id)` (both asserted in PlanSpec). No
  * per-backend query rewriter needed, unlike the reference's 943-LoC
  * timeseries_sql_rewrite.
  *
  * @param idCol/tsCol/valueCol physical column names, for datasets whose
  *   schema doesn't already match the engine's id/ts/value contract.
  */
final case class ParquetTsProvider(
    spark: SparkSession,
    path: String,
    idCol: String = "id",
    tsCol: String = "ts",
    valueCol: String = "value") extends TsProvider {

  def frame: DataFrame =
    spark.read.parquet(path).select(
      col(idCol).cast(StringType).as("id"),
      col(tsCol).as("ts"),
      col(valueCol).as("value"))
}

/** JDBC-backed time-series provider — the external-database path of the
  * pluggable backend, proving the [[TsProvider]] seam generalizes beyond
  * the lake: the reference reaches Dremio over Arrow Flight SQL with a
  * hand-written query rewriter (arrow_flight_sql_database.rs:121-233);
  * here the SAME declarative contract rides Spark's JDBC source, which
  * compiles Catalyst predicates into the remote WHERE clause (shown as
  * PushedFilters on the JDBCRelation scan) — the provider itself stays a
  * column mapping, identical in shape to [[ParquetTsProvider]].
  *
  * `partitionOptions` (e.g. partitionColumn/lowerBound/upperBound/
  * numPartitions) split the remote read for parallelism at scale; the
  * default single-partition read is fine for metadata-sized stores and
  * tests.
  */
final case class JdbcTsProvider(
    spark: SparkSession,
    url: String,
    table: String,
    driver: Option[String] = None,
    idCol: String = "id",
    tsCol: String = "ts",
    valueCol: String = "value",
    partitionOptions: Map[String, String] = Map.empty) extends TsProvider {

  def frame: DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(partitionOptions)
    driver.foreach(d => reader.option("driver", d))
    reader.load().select(
      col(idCol).cast(StringType).as("id"),
      col(tsCol).as("ts"),
      col(valueCol).as("value"))
  }
}
