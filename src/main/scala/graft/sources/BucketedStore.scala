package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed-table layout for shuffle-free co-located joins.
  *
  * At lake scale the dominant cost of a fact-to-fact equi-join is
  * shuffling BOTH sides on the key. Writing each table bucketed by the
  * join key fixes the partitioning at write time: the files are
  * hash-clustered into `numBuckets` buckets and the layout is recorded
  * in the catalog, so every subsequent join or aggregation on that key
  * reads matching buckets pairwise and plans ZERO exchanges — the cost
  * is paid once at ingest instead of on every query. This is the batch
  * analogue of the pre-partitioned store layouts used elsewhere in this
  * repo (the (predicate, kind, class)-partitioned triples store, the
  * cid-partitioned IVF index): choose the partitioning the workload
  * joins on, persist it, and let every downstream plan inherit it.
  *
  * Bucket-count sizing at 100 TB: buckets are the join's parallelism
  * ceiling and each bucket must fit an executor's working memory —
  * size `numBuckets ≈ tableBytes / targetPartitionBytes` (e.g. 100 TB
  * at 256 MB targets → ~400k buckets is too many files; in practice
  * bucket to the cluster's core count × a small factor and let each
  * task stream its bucket). Both sides of a co-located join must use
  * the SAME bucket count and key.
  *
  * BucketedJoinSpec asserts the join plan over two such tables contains
  * no Exchange and returns the same rows as the plain shuffled join.
  */
object BucketedStore {

  /** Write `df` as a managed parquet table bucketed (and sorted) by
    * `key`. Overwrites any existing table of the same name. */
  def saveBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** The catalog table, carrying its bucketed layout into every plan. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
