package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Persisted, incrementally-folded Bloom history filter — the store behind
  * [[TextOps.dedupAgainstHistory]]'s "is tonight's batch already in the
  * lake" sweep (VERDICT r11 #3: the q139 filter was rebuilt from the full
  * history on every run; Bloom filters OR-merge, so a nightly job keeps ONE
  * persisted filter and folds only the new batch's fingerprints in).
  *
  * Layout at `path`:
  *  - `words/` — a ONE-ROW parquet holding the filter as `array<long>`
  *    (mBits/64 words, ≤ 16 MB at the 2^27 cap).
  *  - `_graft_bloom_meta.json` — mBits, k, nItems (fingerprints folded, for
  *    the fp-rate policy), lastBid (replay discipline).
  * and the FINGERPRINT SIDECAR at the sibling `path`__fp (outside the
  * swap root, so the filter's whole-store rewrite never has to copy it):
  *  - `bid=<b>/nb=<B>/bkt=<x>/` — each committed batch's token-set
  *    fingerprints (the md5 strings the filter folded), hash-bucketed by
  *    pmod(xxhash64(fp), B) for partition-pruned verify reads. B is
  *    SIZED TO THE BATCH (next power of two of rows/8k, capped at 256):
  *    a 5k-doc nightly append writes ONE bucket file instead of a fixed
  *    64 (the r14 q141 bench mover — 64 tiny files per append was pure
  *    fixed overhead at small SFs), while a lake-sized bootstrap fold
  *    still fans out for pruned verify reads. Readers prune across
  *    MIXED fan-outs because every B is a power of two dividing 256:
  *    a hit hashing to bucket r under mod 256 lives in bucket r mod B
  *    of a B-bucket partition (B | 256 ⇒ h ≡ r (mod B)).
  * The sidecar is the lake's fingerprint column as a store-owned dataset
  * (VERDICT r13 #1): [[probe]] hits verify against IT, so the nightly
  * admission gate never reads lake text — the verify scan is fp-bytes
  * (~32 B/doc vs KB-sized documents), pruned to the buckets the hits
  * land in, with the hit set broadcast (map-only, never shuffled).
  *
  * Every append is a WHOLE-STORE rewrite-then-swap
  * ([[graft.sources.ParquetCompaction.rewrite]]): words and meta move
  * together, so a kill at any stage leaves the old or the new store —
  * never a filter whose meta disagrees. The sidecar commits THROUGH that
  * swap: a batch's fingerprints land under `bid=<b>` BEFORE the filter
  * swap, and a sidecar partition is committed iff its bid ≤ meta
  * lastBid — a crash between the sidecar write and the swap leaves an
  * orphan partition readers ignore and the next append deletes.
  *
  * Replay discipline (the [[SimGraphStore]] / StreamingCuration rule): a
  * `foreachBatch` maintainer passes the ENGINE batch id; a replayed
  * in-flight id (== lastBid) is a no-op — OR-folding the same rows twice
  * is bitwise idempotent anyway, but skipping keeps `nItems` honest — and
  * an OLDER id means the checkpoint and the store are out of sync and
  * fails loudly. The skip path VERIFIES the replay (ADVICE r12): meta
  * carries `lastSig`, an order-free signature of the committed batch's
  * fingerprint multiset, and a "replay" whose rows don't match it fails
  * loudly instead of silently no-opping — so a reset checkpoint exactly
  * one batch behind (indistinguishable from a replay by id alone) can
  * only be skipped when it genuinely carries the already-folded rows.
  *
  * FP-rate policy (STATUS note): the filter cannot resize in place, so
  * appends monotonically raise occupancy. [[estimatedFpRate]] estimates
  * the per-probe false-positive rate from the actual bit occupancy,
  * (setBits/mBits)^k — the standard approximation (double-hashed probes
  * into one word array are not independent uniform, so it is an
  * estimate, not an exact rate; it only drives the rebuild policy).
  * Because callers re-verify hits exactly (the q139 shape), a drifting
  * fp rate never corrupts output — it only grows the verify join's probe
  * side — so the policy is operational: when the rate crosses the
  * configured budget (default 1%), [[rebuild]] with mBits doubled (one
  * history pass, the same cost the non-persisted spelling paid every
  * night). At the default mBits = 2^20, k = 5 the 1% line sits near
  * 10^5.6 ≈ 440k fingerprints.
  *
  * Scale (100 TB): append cost is one map-only pass over the BATCH (the
  * history is never re-read), a filter-sized shuffle buffer, and a
  * filter-sized store rewrite. Serving broadcasts the one-row filter and
  * probes map-side; only Bloom hits reach the exact verify join. */
object BloomHistory {

  private val metaFile = "_graft_bloom_meta.json"

  /** Max fingerprint-sidecar bucket fan-out (class doc). Every
    * partition's own fan-out is a power of two dividing this, so readers
    * derive any partition's bucket for a hit from the hit's residue mod
    * this one modulus. */
  private[graft] val maxFpBuckets = 256

  /** Target fingerprint rows per sidecar bucket file (~32 B/row ⇒
    * ~256 KB files); drives [[bucketsFor]]. */
  private val fpBucketTargetRows = 8192L

  /** Batch-sized bucket fan-out: next power of two of rows/target,
    * clamped to [1, maxFpBuckets]. */
  private[graft] def bucketsFor(rows: Long): Int = {
    val want = math.max(1L, (rows + fpBucketTargetRows - 1) / fpBucketTargetRows)
    math.min(maxFpBuckets.toLong,
      java.lang.Long.highestOneBit(math.max(1L, 2 * want - 1))).toInt
  }

  private[graft] def fpPath(path: String): String = s"${path}__fp"

  /** Create an empty filter store. */
  def init(spark: SparkSession, path: String, mBits: Int = 1 << 20,
      k: Int = 5): Unit = {
    require(mBits >= 64 && Integer.bitCount(mBits) == 1,
      "mBits must be a power of two >= 64")
    graft.sources.ParquetCompaction.recover(spark, path)
    graft.sources.ParquetCompaction.rewrite(spark, path) { tmp =>
      emptyWords(spark, mBits).write.parquet(s"$tmp/words")
      writeMeta(spark, tmp, mBits, k, nItems = 0L, lastBid = -1L,
        lastSig = None)
    }
    // a stale sidecar from an earlier store at this path is all orphans
    // now (every bid > the fresh lastBid = -1), so readers already ignore
    // it; deleting is cleanup, and deleting AFTER the swap means a crash
    // here leaves no window where an old filter lacks its sidecar
    val fp = new org.apache.hadoop.fs.Path(fpPath(path))
    val fs = fp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(fp)) fs.delete(fp, true)
  }

  /** Fold a batch's token-set fingerprints into the stored filter. Returns
    * the committed batch id. `explicitBid` is the streaming seam (see the
    * class doc); `None` auto-increments. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, explicitBid: Option[Long] = None): Long = {
    graft.sources.ParquetCompaction.recover(spark, path)
    val (mBits, k, nItems, lastBid) = readMeta(spark, path)
    val bid = explicitBid match {
      case None => lastBid + 1L
      case Some(b) =>
        if (b == lastBid) {
          // replayed in-flight batch: no-op — but VERIFY it (class doc):
          // a reset checkpoint one batch behind carries the same id with
          // DIFFERENT rows, and skipping those would drop a real batch
          val sig = batchSig(batch, textCol)
          require(readSig(spark, path).forall(_ == sig),
            s"batch id $b matches the store's latest committed id at " +
              s"$path but its rows differ from the committed batch — " +
              "this is a reset checkpoint one batch behind, not a " +
              "replay; reset the checkpoint and the store together")
          return b
        }
        require(b > lastBid,
          s"batch id $b is older than the store's latest committed " +
            s"$lastBid at $path — a replay can only repeat the latest " +
            "batch; reset the checkpoint and the store together")
        b
    }
    graft.functions.BloomFilterAgg.register(spark)
    // the sidecar write precedes the swap (class doc): orphans from a
    // crashed earlier attempt are exactly the partitions above lastBid
    cleanOrphanFps(spark, path, lastBid)
    // fan-out sized to the batch (class doc); the count is a
    // column-pruned pass, cheap next to the fingerprint+write pass
    val nb = bucketsFor(batch.count())
    batch
      .select(TextOps.tokenSetFingerprint(col(textCol)).as("fp"))
      .withColumn("bkt", pmod(xxhash64(col("fp")), lit(nb)))
      // repartition BY bkt first: without it every shuffle task writes
      // into every bucket directory — up to tasks×buckets tiny files per
      // append (measured 7.6 s vs 1.8 s for a 5k-doc batch at 100×)
      .repartition(col("bkt"))
      .write.partitionBy("bkt").mode("overwrite")
      .parquet(s"${fpPath(path)}/bid=$bid/nb=$nb")
    // fold the filter FROM the just-written sidecar partition: one read
    // of fp-bytes instead of re-tokenizing the batch text, and the
    // filter can never disagree with what the sidecar recorded
    // explicit schema: a 0-row batch writes no data files, and the fold
    // must still see an empty (fp, bkt) frame, not an inference failure
    val folded = spark.read.schema("fp STRING, nb BIGINT, bkt BIGINT")
      .parquet(s"${fpPath(path)}/bid=$bid")
      .agg(call_function(graft.functions.BloomFilterAgg.name,
          xxhash64(col("fp")), lit(mBits), lit(k)).as("bw"),
        count(lit(1)).as("bn"),
        coalesce(expr("bit_xor(xxhash64(fp))"), lit(0L)).as("bx"))
    val stored = spark.read.parquet(s"$path/words")
    // one row × one row: OR the word arrays; Bloom union is exact
    val merged = stored.crossJoin(broadcast(folded))
      .select(zip_with(col("words"), col("bw"),
        (a, b) => a.bitwiseOR(b)).as("words"), col("bn"), col("bx"))
      .localCheckpoint() // materialize BEFORE the swap deletes its input
    val head = merged.select("bn", "bx").collect()(0)
    val added = head.getLong(0)
    val sig = combineSig(head.getLong(1), added)
    graft.sources.ParquetCompaction.rewrite(spark, path) { tmp =>
      merged.select("words").write.parquet(s"$tmp/words")
      writeMeta(spark, tmp, mBits, k, nItems + added, bid, Some(sig))
    }
    bid
  }

  /** REBUILD the filter at a new size — the fp-rate policy's operation
    * (class doc): one pass over the FINGERPRINT SIDECAR (every
    * fingerprint the store ever folded — fp-bytes, never lake text)
    * into a fresh `newMBits`-bit filter, whole-store rewrite-then-swap
    * (a kill at any stage leaves the old or the new store), `lastBid`
    * and the replay signature PRESERVED so a streaming maintainer's
    * next fold lands on the rebuilt store exactly as it would have on
    * the old one, `nItems` reset honestly to the rows actually folded.
    * The sidecar itself is untouched (its contents are the rebuild's
    * input, not its output). */
  def rebuild(spark: SparkSession, path: String, newMBits: Int,
      newK: Int = 5): Unit = {
    require(newMBits >= 64 && Integer.bitCount(newMBits) == 1,
      "mBits must be a power of two >= 64")
    graft.sources.ParquetCompaction.recover(spark, path)
    val (_, _, _, lastBid) = readMeta(spark, path)
    val lastSig = readSig(spark, path)
    graft.functions.BloomFilterAgg.register(spark)
    val folded = storedFingerprints(spark, path, lastBid)
      .agg(call_function(graft.functions.BloomFilterAgg.name,
          xxhash64(col("fp")), lit(newMBits), lit(newK)).as("bw"),
        count(lit(1)).as("bn"))
    // OR onto an empty filter so a 0-row history still yields a valid
    // all-zero word array (the agg's empty-buffer eval already does, but
    // the shape keeps rebuild structurally identical to append's fold)
    val merged = emptyWords(spark, newMBits).crossJoin(broadcast(folded))
      .select(zip_with(col("words"), col("bw"),
        (a, b) => a.bitwiseOR(b)).as("words"), col("bn"))
      .localCheckpoint() // materialize BEFORE the swap deletes its input
    val n = merged.select("bn").collect()(0).getLong(0)
    graft.sources.ParquetCompaction.rewrite(spark, path) { tmp =>
      merged.select("words").write.parquet(s"$tmp/words")
      writeMeta(spark, tmp, newMBits, newK, n, lastBid, lastSig)
    }
  }

  /** Batch rows whose fingerprint MAY be in the folded history — true
    * duplicates plus the fp-rate residue, never missing a true dup. The
    * one-row filter broadcasts; the probe is pure codegen'd Column bit
    * tests ([[graft.functions.BloomProbe.mightContain]]). Output
    * (doc_id, fp). */
  def probe(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    graft.sources.ParquetCompaction.recover(spark, path)
    val (mBits, k, _, _) = readMeta(spark, path)
    val stored = spark.read.parquet(s"$path/words")
    batch.select(col(idCol).cast(LongType).as("doc_id"),
        TextOps.tokenSetFingerprint(col(textCol)).as("fp"))
      .crossJoin(broadcast(stored))
      .filter(graft.functions.BloomProbe.mightContain(
        col("words"), xxhash64(col("fp")), mBits, k))
      .select("doc_id", "fp")
  }

  /** The exact q139 sweep served ENTIRELY from the store: Bloom hits
    * re-verify against the fingerprint sidecar — the lake corpus is
    * read ZERO times, in text or otherwise (VERDICT r13 #1). The output
    * is EXACT — identical to [[TextOps.dedupAgainstHistory]] over the
    * corpus the store folded — because the sidecar holds precisely that
    * corpus's fingerprint multiset (appended batch-by-batch alongside
    * the filter, committed through the same swap).
    *
    * Scale shape: the hit set (true dups + the ≤fpBudget residue)
    * BROADCASTS; the sidecar scan prunes to the hash buckets the hits
    * land in and probes map-side — fp-bytes, no shuffle, cost tracking
    * hits (small nights touch few buckets) with a lake-fp-bytes ceiling
    * ~32 B/doc, two to three orders below the text scan it replaces. */
  def dedupFromStore(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    graft.sources.ParquetCompaction.recover(spark, path)
    val (_, _, _, lastBid) = readMeta(spark, path)
    // materialize the hits: they are read twice (bucket list + verify
    // join) and both reads must see the same filter state
    val hits = probe(spark, path, batch, idCol, textCol)
      .withColumn("bkt", pmod(xxhash64(col("fp")), lit(maxFpBuckets)))
      .localCheckpoint()
    // hit residues mod the MAX fan-out — ≤ maxFpBuckets distinct
    // values, a driver-bounded collect; each partition's own bucket for
    // a hit is its residue mod that partition's nb (class doc)
    val res = hits.select("bkt").distinct().collect().map(_.getLong(0))
    if (res.isEmpty) return hits.select("doc_id").limit(0)
    // one OR-of-ANDs over the 9 possible fan-outs: partition pruning
    // keeps only (nb, bkt) dirs a hit can land in, absent nbs cost 0
    val prune = (0 to 8).map(1L << _).map { b =>
      col("nb") === b && col("bkt").isin(res.map(_ % b).distinct: _*)
    }.reduce(_ || _)
    storedFingerprints(spark, path, lastBid)
      .filter(prune)
      .join(broadcast(hits.select("doc_id", "fp")), Seq("fp"))
      .select("doc_id").distinct()
  }

  /** Every committed fingerprint in the sidecar (bids ≤ `lastBid`; an
    * orphan partition above it is a crashed append's leftover). Columns
    * (fp, nb, bkt); empty frame when nothing has been appended. */
  private def storedFingerprints(spark: SparkSession, path: String,
      lastBid: Long): DataFrame = {
    val dirs = committedFpDirs(spark, path, lastBid)
    if (dirs.isEmpty)
      spark.range(0).select(lit("").as("fp"), lit(1L).as("nb"),
        lit(0L).as("bkt")).limit(0)
    else
      spark.read.schema("fp STRING, nb BIGINT, bkt BIGINT")
        .option("basePath", fpPath(path)).parquet(dirs: _*)
        .select("fp", "nb", "bkt")
  }

  private def committedFpDirs(spark: SparkSession, path: String,
      lastBid: Long): Seq[String] = {
    // the ParquetCompaction invariant: recover before first touch — a
    // compactFingerprints killed between root-delete and rename leaves
    // the WHOLE sidecar in the READY temp, and a reader that skipped
    // recovery would silently verify against nothing
    graft.sources.ParquetCompaction.recover(spark, fpPath(path))
    val root = new org.apache.hadoop.fs.Path(fpPath(path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("bid=") && n.stripPrefix("bid=").toLongOption
          .exists(_ <= lastBid)
      }
      .map(_.toString)
  }

  private def cleanOrphanFps(spark: SparkSession, path: String,
      lastBid: Long): Unit = {
    graft.sources.ParquetCompaction.recover(spark, fpPath(path))
    val root = new org.apache.hadoop.fs.Path(fpPath(path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("bid=") && n.stripPrefix("bid=").toLongOption
          .forall(_ > lastBid))
        fs.delete(st.getPath, true)
    }
  }

  /** Compact the sidecar's committed partitions into ONE `bid=<lastBid>`
    * partition (still bucket-partitioned) — the small-files dial for a
    * store that gains a partition directory per append. Re-attributing
    * every fingerprint to the latest committed bid is sound: readers
    * only ever ask "bid ≤ lastBid", and the replay discipline never
    * re-writes a committed bid's partition. Whole-sidecar
    * rewrite-then-swap, so a kill leaves the old or the new sidecar. */
  def compactFingerprints(spark: SparkSession, path: String): Unit = {
    graft.sources.ParquetCompaction.recover(spark, path)
    val (_, _, nItems, lastBid) = readMeta(spark, path)
    if (lastBid < 0L) return
    graft.sources.ParquetCompaction.recover(spark, fpPath(path))
    // fan-out re-sized to the WHOLE folded multiset (nItems counts every
    // row the sidecar holds), buckets recomputed under it — the mixed
    // per-append fan-outs collapse into one uniform partition
    val nb = bucketsFor(nItems)
    val all = storedFingerprints(spark, path, lastBid)
      .select(col("fp"), pmod(xxhash64(col("fp")), lit(nb)).as("bkt"))
      .localCheckpoint()
    graft.sources.ParquetCompaction.rewrite(spark, fpPath(path)) { tmp =>
      all.repartition(col("bkt"))
        .write.partitionBy("bkt").parquet(s"$tmp/bid=$lastBid/nb=$nb")
    }
  }

  /** Per-probe false-positive rate of the stored filter, estimated from
    * the actual bit occupancy as (setBits/mBits)^k — the standard
    * approximation (probe positions are double-hashed, not independent
    * uniform); it drives the [[rebuild]] policy dial (class doc). */
  def estimatedFpRate(spark: SparkSession, path: String): Double = {
    graft.sources.ParquetCompaction.recover(spark, path)
    val (mBits, k, _, _) = readMeta(spark, path)
    val setBits = spark.read.parquet(s"$path/words")
      .select(aggregate(transform(col("words"), w => bit_count(w)),
        lit(0L), (acc, x) => acc + x.cast(LongType)).as("n"))
      .collect()(0).getLong(0)
    math.pow(setBits.toDouble / mBits, k.toDouble)
  }

  private def emptyWords(spark: SparkSession, mBits: Int): DataFrame = {
    import spark.implicits._
    Seq(Seq.fill(mBits / 64)(0L)).toDF("words")
  }

  /** Order-free signature of a batch's fingerprint multiset (count mixed
    * with the bit_xor of per-row hashes) — what [[append]]'s replay skip
    * verifies. One map-only pass over the batch, paid ONLY on the replay
    * path. */
  private def batchSig(batch: DataFrame, textCol: String): Long = {
    val row = batch
      .select(TextOps.tokenSetFingerprint(col(textCol)).as("fp"))
      .agg(coalesce(expr("bit_xor(xxhash64(fp))"), lit(0L)).as("bx"),
        count(lit(1)).as("bn"))
      .collect()(0)
    combineSig(row.getLong(0), row.getLong(1))
  }

  private def combineSig(xorHash: Long, n: Long): Long =
    xorHash ^ java.lang.Long.rotateLeft(n, 32) ^ 0x5851f42d4c957f2dL

  private def writeMeta(spark: SparkSession, path: String, mBits: Int,
      k: Int, nItems: Long, lastBid: Long,
      lastSig: Option[Long]): Unit =
    graft.sources.MetaSidecar.write(spark, path, metaFile,
      Seq("mBits" -> mBits.toString, "k" -> k.toString,
        "nItems" -> nItems.toString, "lastBid" -> lastBid.toString) ++
        lastSig.map(s => "lastSig" -> s.toString))

  /** The committed batch's replay signature; None for a pre-lastSig
    * store (then the replay check degenerates to the documented id-only
    * skip — the one-behind case stays undetectable there). */
  private def readSig(spark: SparkSession, path: String): Option[Long] = {
    import graft.sources.MetaSidecar._
    readText(spark, path, metaFile).flatMap(longField(_, "lastSig"))
  }

  private[graft] def readMeta(spark: SparkSession,
      path: String): (Int, Int, Long, Long) = {
    import graft.sources.MetaSidecar._
    val txt = readText(spark, path, metaFile).getOrElse(
      throw new IllegalStateException(s"no bloom history store at $path"))
    (requireLong(txt, path, "mBits").toInt, requireLong(txt, path, "k").toInt,
      requireLong(txt, path, "nItems"), requireLong(txt, path, "lastBid"))
  }
}
