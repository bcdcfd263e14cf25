package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted inverted text index + BM25 serving — the text-retrieval
  * counterpart of the persisted IVF index (AnnOps.buildIvfIndex): pay the
  * corpus-sized tokenize/aggregate shuffle ONCE at build time, then serve
  * every query batch by reading only the term-bucket partitions its terms
  * hash into.
  *
  * Layout at `path`:
  *  - `postings/` — (term, doc_id, tf, dl) parquet, partitioned by
  *    `tb = pmod(xxhash64(term), nBuckets)`. A query's scan carries an
  *    explicit tb partition filter, so the data read is bounded by the
  *    probed buckets' postings, not the corpus (PlanSpec asserts
  *    PartitionFilters). dl is denormalized into the postings row — the
  *    Lucene norm trick — so serving needs NO doc-table join.
  *  - `df/` — (term, dfc), the Zipf-small document-frequency table,
  *    partitioned by the same tb.
  *  - `_graft_text_meta.json` — nBuckets + the two corpus scalars
  *    (n_docs, tot_len) BM25 needs; rewriting it is the index commit.
  *
  * Scale (100 TB): build is one explode + one partial-agg shuffle (the
  * minimum possible: tf aggregation is the index's definition). Serving
  * reads ~|probed buckets|/nBuckets of the postings, broadcasts the ≤|terms|
  * df rows, and runs the same two-phase top-k as TextOps.bm25TermTopK so a
  * hot term's posting list never serializes through one reducer. */
object TextIndex {

  /** Tokenize, aggregate, and persist the index. One corpus pass. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    val toks = TextOps.tokens(col(textCol))
    val base = docs.select(col(idCol).cast(LongType).as("doc_id"),
      toks.as("toks")).select(col("doc_id"), size(col("toks")).as("dl"),
      explode(col("toks")).as("term"))
    val postings = base.groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(xxhash64(col("term")), lit(nBuckets)))
    // repartition BY tb before partitionBy (the BloomHistory sidecar
    // discipline): unaligned, every groupBy task opens a writer in every
    // bucket dir — tasks×nBuckets files whose per-writer overhead
    // dominates the build. Bucket skew stays bounded: terms spread
    // uniformly by hash, and even a corpus-wide hot term adds ≤ nDocs
    // rows to its one bucket (~2× the mean bucket, not a straggler).
    postings.repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$path/postings")
    // df re-derives from the written postings (one Zipf-small agg) so the
    // two datasets can never disagree
    spark.read.parquet(s"$path/postings")
      .groupBy("tb", "term").agg(count(lit(1)).as("dfc"))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/df")
    val Array(nDocs, totLen) = docs
      .select(col(idCol).cast(LongType).as("doc_id"), size(toks).as("dl"))
      .agg(count(lit(1)), sum(col("dl"))).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    writeMeta(spark, path, nBuckets, nDocs, totLen)
  }

  /** BM25 top-k per query term, served from the persisted index. The term
    * list's bucket set (≤ |terms| values) is computed through the SAME
    * xxhash64 the build used and lands on the scan as a literal partition
    * filter. */
  def bm25FromIndex(spark: SparkSession, path: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    // finish any crashed compaction before reading (cheap when whole)
    graft.sources.ParquetCompaction.recover(spark, s"$path/postings")
    graft.sources.ParquetCompaction.recover(spark, s"$path/df")
    val (nBuckets, nDocs, totLen) = readMeta(spark, path)
    import spark.implicits._
    val buckets = terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(nBuckets)).as("tb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("tb").isin(buckets: _*) && col("term").isin(terms: _*))
    val dft = spark.read.parquet(s"$path/df")
      .filter(col("tb").isin(buckets: _*) && col("term").isin(terms: _*))
      .select("term", "dfc")
    val avgdl = lit(totLen.toDouble / nDocs)
    val idf = log((lit(nDocs) - col("dfc") + lit(0.5)) /
      (col("dfc") + lit(0.5)) + lit(1.0))
    val norm = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl)
    val scored = postings.join(broadcast(dft), "term")
      .withColumn("score",
        round(idf * (col("tf") * (lit(k1) + lit(1.0))) / norm, 6))
    val w1 = Window
      .partitionBy(col("term"), pmod(xxhash64(col("doc_id")), lit(64)))
      .orderBy(col("score").desc, col("doc_id"))
    val w2 = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= topK)
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= topK)
      .select(col("term"), col("rank"), col("doc_id"), col("tf"), col("dl"),
        col("score"))
  }

  /** Incrementally APPEND documents to a persisted index — the text
    * counterpart of AnnOps.appendToIvfIndex. New postings land as files
    * inside their tb partition directories (no index rewrite); the
    * document-frequency dataset is merged incrementally (existing df +
    * batch term counts — vocabulary-sized work, never a re-aggregation of
    * the corpus-sized postings), and the meta rewrite (updated nDocs /
    * totLen) is the commit that makes the new stats visible to scoring.
    *
    * Serving concurrency caveat (same as every non-transactional parquet
    * index here): a query racing the df overwrite can observe a partial df
    * dataset; production deployments put a table format (Delta/Iceberg)
    * under this layout. */
  def appendToIndex(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String): Unit = {
    // recover-before-first-touch (the ParquetCompaction invariant): a
    // compactIndex killed mid-swap leaves postings/ or df/ only in its
    // READY temp; appending into a blindly recreated root would make the
    // next recover() discard that temp and the whole index with it
    graft.sources.ParquetCompaction.recover(spark, s"$path/postings")
    graft.sources.ParquetCompaction.recover(spark, s"$path/df")
    val (nBuckets, nDocs, totLen) = readMeta(spark, path)
    val toks = TextOps.tokens(col(textCol))
    val base = docs.select(col(idCol).cast(LongType).as("doc_id"),
      toks.as("toks")).select(col("doc_id"), size(col("toks")).as("dl"),
      explode(col("toks")).as("term")).localCheckpoint()
    val postings = base.groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(xxhash64(col("term")), lit(nBuckets)))
      .localCheckpoint()
    postings.select("term", "doc_id", "dl", "tf", "tb")
      .repartition(col("tb")) // align writers with buckets (build-path note)
      .write.mode("append").partitionBy("tb").parquet(s"$path/postings")
    val batchDf = postings.groupBy("tb", "term").agg(count(lit(1)).as("dfc"))
    val merged = spark.read.parquet(s"$path/df")
      .select("tb", "term", "dfc").unionByName(batchDf)
      .groupBy("tb", "term").agg(sum("dfc").as("dfc"))
      .localCheckpoint() // materialize BEFORE overwriting its own input
    merged.repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/df")
    val Array(bDocs, bLen) = docs
      .select(col(idCol).cast(LongType).as("doc_id"), size(toks).as("dl"))
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    writeMeta(spark, path, nBuckets, nDocs + bDocs, totLen + bLen)
  }

  /** Compact the index's datasets in place: [[appendToIndex]] and the
    * streaming maintainer add one file per batch per touched tb
    * partition, which grows without bound (VERDICT r10 #4). Rewrites
    * postings/ and df/ to one file per tb directory, crash-safe
    * (ParquetCompaction's rewrite-then-swap); layout, partition dirs,
    * meta, and rows are unchanged, so pruned serving is identical.
    * Run between appends, not concurrently with one. */
  def compactIndex(spark: SparkSession, path: String): Unit = {
    readMeta(spark, path) // fail fast on a non-index directory
    graft.sources.ParquetCompaction.compact(spark, s"$path/postings",
      partitionCols = Seq("tb"))
    graft.sources.ParquetCompaction.compact(spark, s"$path/df",
      partitionCols = Seq("tb"))
  }

  private def writeMeta(spark: SparkSession, path: String, nBuckets: Int,
      nDocs: Long, totLen: Long): Unit =
    graft.sources.MetaSidecar.write(spark, path, "_graft_text_meta.json",
      Seq("nBuckets" -> nBuckets.toString, "nDocs" -> nDocs.toString,
        "totLen" -> totLen.toString))

  private[graft] def readMeta(spark: SparkSession,
      path: String): (Int, Long, Long) = {
    import graft.sources.MetaSidecar._
    val txt = readText(spark, path, "_graft_text_meta.json").getOrElse(
      throw new IllegalStateException(s"no text index meta at $path"))
    (requireLong(txt, path, "nBuckets").toInt,
      requireLong(txt, path, "nDocs"), requireLong(txt, path, "totLen"))
  }
}
