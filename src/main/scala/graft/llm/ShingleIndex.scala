package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted shingle-postings index for n-gram containment dedup — the
  * [[TextIndex]] treatment applied to [[TextOps.ngramContainmentPairs]]
  * (VERDICT r10 #1: the in-memory spelling re-derives signatures, document
  * frequencies, and ranked postings on EVERY sweep, which made q114 the
  * catalog's biggest 100× wall at 422 s ≈ linear; all of that work is
  * corpus-determined and belongs in a build step).
  *
  * Layout at `path`:
  *  - `postings/` — one row per (doc, distinct shingle):
  *    (id, sz, s, rn) partitioned by `sb = pmod(xxhash64(s), nBuckets)`.
  *    `rn` is the shingle's rank within its doc in the GLOBAL
  *    (df asc, shingle asc) order and `sz` the doc's shingle-set size —
  *    so any threshold's probe prefix is just the stored-row filter
  *    `rn ≤ sz − ⌈t·sz⌉ + 1`: one dataset serves both the probe and the
  *    full-postings target side, and the prefix cut needs no recompute.
  *  - `df/` — (s, df) document frequencies, same sb partitioning: the
  *    order key external probe batches must rank by (see below).
  *  - `sigs/` — per-doc (id, sh, hs) verify signatures
  *    ([[TextOps.shingleSigs]] shape: first-occurrence shingle array +
  *    sorted FNV-64 fingerprints).
  *  - `_graft_shingle_meta.json` — nBuckets, n, nDocs; rewriting it is
  *    the commit.
  *
  * Serving:
  *  - [[containmentSelf]] — the full self-sweep, bit-identical to the
  *    in-memory operator (spec-pinned): candidates + two-stage verify,
  *    with the signature/df/rank work all read instead of rebuilt.
  *  - [[containmentAgainst]] — the incremental sweep a recurring curation
  *    pipeline actually runs (tonight's batch vs the corpus): the batch
  *    ranks its shingles by the INDEX's df order, keeps its prefixes, and
  *    the postings scan prunes to the ≤nBuckets partitions those prefix
  *    shingles hash into (PartitionFilters spec-asserted) — work scales
  *    with the batch and the probed postings, not the corpus.
  *
  * Exactness under mixed ranking (containmentAgainst): the prefix
  * pigeonhole only needs A's OWN order to be fixed, but the positional
  * filter compares rna against rnb, which is valid only when common
  * shingles sort identically on both sides. Ranking the batch by the
  * index's (df, s) keys guarantees that for every shingle the index
  * knows; batch-only shingles (absent from the index) rank with df = 0.
  * They can never be common with an index doc, and the positional
  * bound's two sides — |A|−rna common-after upper bound, |B|−rnb
  * likewise — hold with interleaved non-common elements, so the filter
  * stays exact (they only make rna larger, i.e. the bound tighter,
  * never dropping a qualifying pair's first common shingle, which both
  * orders agree ranks before the other ⌈t·|A|⌉−1 common ones).
  *
  * Scale (100 TB): build pays the corpus explode + df agg + one ranking
  * window once; a nightly batch sweep then does batch-sized signature
  * work, one Zipf-small df join, a partition-pruned postings equi-join,
  * and candidate-sized verifies. The self-sweep still pays the
  * candidate join (inherently corpus×corpus) but skips signature,
  * df, and ranking rebuilds. */
object ShingleIndex {

  /** Shingle, rank, and persist. One corpus pass plus one ranking
    * window. */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
      n: Int = 3, nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    val base = TextOps.shingleSigs(docs, idCol, textCol, n).localCheckpoint()
    base.write.mode("overwrite").parquet(s"$path/sigs")
    val ex = base.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s"))
    val dfTab = ex.groupBy("s").agg(count(lit(1)).as("df"))
    dfTab.withColumn("sb", pmod(xxhash64(col("s")), lit(nBuckets)))
      .write.mode("overwrite").partitionBy("sb").parquet(s"$path/df")
    val w = Window.partitionBy("id").orderBy(col("df"), col("s"))
    ex.join(dfTab, "s")
      .withColumn("rn", row_number().over(w))
      .select(col("id"), col("sz"), col("s"), col("rn"),
        pmod(xxhash64(col("s")), lit(nBuckets)).as("sb"))
      .write.mode("overwrite").partitionBy("sb").parquet(s"$path/postings")
    val nDocs = base.count()
    writeMeta(spark, path, nBuckets, n, nDocs)
  }

  /** Full self-sweep served from the index — output identical to
    * `TextOps.ngramContainmentPairs(corpus, …, threshold)` on the indexed
    * corpus (spec-pinned): (ida, idb, containment) for every ordered pair
    * with |A∩B|/|A| ≥ threshold. */
  def containmentSelf(spark: SparkSession, path: String,
      threshold: Double): DataFrame = {
    readMeta(spark, path) // fail fast on a missing/partial index
    val postings = spark.read.parquet(s"$path/postings")
    val probe = postings
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("id").as("ida"), col("sz").as("sza"), col("s"),
        col("rn").as("rna"))
    val target = postings.select(col("id").as("idb"), col("sz").as("szb"),
      col("s").as("s2"), col("rn").as("rnb"))
    val candidates = TextOps.containmentCandidates(probe, target, threshold)
    val sigs = spark.read.parquet(s"$path/sigs")
    TextOps.containmentVerify(candidates, sigs, sigs, threshold)
  }

  /** Incremental sweep: ordered pairs (ida ∈ batch, idb ∈ index) with
    * |A∩B|/|A| ≥ threshold — "which corpus documents contain tonight's
    * batch". The batch never joins the corpus-sized postings outside the
    * pruned buckets its prefix shingles hash into. */
  def containmentAgainst(spark: SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val (_, n, _) = readMeta(spark, path)
    val sigsA = TextOps.shingleSigs(batch, idCol, textCol, n)
      .localCheckpoint()
    val candidates = againstCandidates(spark, path, sigsA, threshold)
    val sigsB = spark.read.parquet(s"$path/sigs")
    TextOps.containmentVerify(candidates, sigsA, sigsB, threshold)
  }

  /** Candidate (ida, idb) frame of [[containmentAgainst]] — split out so
    * the pruned-scan plan is assertable before the verify stage's eager
    * checkpoint consumes it. */
  private[graft] def againstCandidates(spark: SparkSession, path: String,
      sigsA: DataFrame, threshold: Double): DataFrame = {
    val (nBuckets, _, _) = readMeta(spark, path)
    val ex = sigsA.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s"))
    // rank by the INDEX's df order (batch-only shingles as df = 0) — the
    // positional filter's shared-order requirement, see the scaladoc
    val dfTab = spark.read.parquet(s"$path/df").select("s", "df")
    val w = Window.partitionBy("id").orderBy(col("df"), col("s"))
    val probe = ex.join(dfTab, Seq("s"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("id").as("ida"), col("sz").as("sza"), col("s"),
        col("rn").as("rna"))
      .localCheckpoint()
    // the probed bucket set (≤ nBuckets values) lands on the postings
    // scan as a literal partition filter — the q120 pruned-serve shape
    val buckets = probe
      .select(pmod(xxhash64(col("s")), lit(nBuckets)).as("sb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val target = spark.read.parquet(s"$path/postings")
      .filter(col("sb").isin(buckets: _*))
      .select(col("id").as("idb"), col("sz").as("szb"),
        col("s").as("s2"), col("rn").as("rnb"))
    TextOps.containmentCandidates(probe, target, threshold)
  }

  private def writeMeta(spark: SparkSession, path: String, nBuckets: Int,
      n: Int, nDocs: Long): Unit =
    graft.sources.MetaSidecar.write(spark, path, "_graft_shingle_meta.json",
      Seq("nBuckets" -> nBuckets.toString, "n" -> n.toString,
        "nDocs" -> nDocs.toString))

  private[graft] def readMeta(spark: SparkSession,
      path: String): (Int, Int, Long) = {
    import graft.sources.MetaSidecar._
    val txt = readText(spark, path, "_graft_shingle_meta.json").getOrElse(
      throw new IllegalStateException(s"no shingle index meta at $path"))
    (requireLong(txt, path, "nBuckets").toInt,
      requireLong(txt, path, "n").toInt, requireLong(txt, path, "nDocs"))
  }
}
