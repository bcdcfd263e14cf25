package graft.streaming

import graft.SparkTestBase
import graft.llm.{BloomHistory, NightlyCuration, ShingleIndex, SimGraphStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streamed nightly curation cycle (StreamingNightlyCuration):
  * staged admission + end-of-night fold equals the batch cycle for any
  * micro-batch split, staging replays exactly once and fails loudly on
  * a reset checkpoint, and endOfNight converges after a kill anywhere
  * (including mid-fold partial appends). */
class StreamingNightlyCurationSpec extends SparkTestBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-nightstream-$tag").toString

  // the NightlyCurationSpec fixture: history plus a batch exercising
  // every admission branch (fresh / exact-dup permutations / contained
  // slices / low-quality)
  private lazy val fixture: (Seq[(Long, String)], Seq[(Long, String)]) = {
    val rnd = new scala.util.Random(321)
    val vocab = (0 until 50).map(i => s"w$i").toVector
    def mkDoc(len: Int): String =
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val hist = (0L until 80L).map(i => (i, mkDoc(10 + rnd.nextInt(10))))
    val batch =
      (0 until 20).map(i => (1000L + i, mkDoc(10 + rnd.nextInt(8)))) ++
      (0 until 6).map { i =>
        val src = hist(rnd.nextInt(hist.size))._2.split(" ")
        (1100L + i, rnd.shuffle(src.toSeq).mkString(" "))
      } ++
      (0 until 6).map { i =>
        val src = hist(rnd.nextInt(hist.size))._2.split(" ")
        (1200L + i, src.slice(1, src.length - 1).mkString(" "))
      } ++
      (0 until 4).map(i => (1300L + i, "w0 w0 w0 w0 w0 w0 w0 w0 w0 w0")) ++
      (0 until 3).map(i => (1400L + i, "w1 w2 w3"))
    (hist, batch)
  }

  private def mkStores(histDf: DataFrame, histEmb: DataFrame,
      tag: String): NightlyCuration.Stores = {
    val stores = NightlyCuration.Stores(tmp(tag))
    NightlyCuration.initStores(spark, stores, histDf, histEmb,
      "doc_id", "text", dim = 8, nCentroids = 4)
    stores
  }

  private def storeState(stores: NightlyCuration.Stores)
      : (Set[(Long, Long)], Set[(Long, Long)], Long, Long, Long) = (
    ShingleIndex.containmentSelf(spark, stores.shingle, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
    SimGraphStore.edges(spark, stores.graph)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
    spark.read.parquet(s"${stores.text}/postings")
      .select("doc_id").distinct().count(),
    spark.read.parquet(s"${stores.ivf}/cells").count(),
    spark.read.parquet(s"${stores.bloom}/words")
      .select(aggregate(transform(col("words"), w => bit_count(w)),
        lit(0L), (acc, x) => acc + x).as("sb"))
      .collect()(0).getLong(0))

  test("staged admission + end-of-night fold == the batch cycle, for a " +
      "3-way micro-batch split; a second endOfNight no-ops") {
    import spark.implicits._
    val (hist, batch) = fixture
    val histDf = hist.toDF("doc_id", "text").localCheckpoint()
    val histEmb = hist.map { case (i, _) => (i, Seq.fill(8)(0.3f)) }
      .toDF("vec_id", "embedding")
    val emb = (hist ++ batch).map { case (i, _) =>
      (i, Seq.fill(8)(0.1f + (i % 7) * 0.1f))
    }.toDF("vec_id", "embedding").localCheckpoint()
    // batch cycle
    val bStores = mkStores(histDf, histEmb, "batch")
    val admitted = NightlyCuration.admit(spark, bStores,
      batch.toDF("doc_id", "text"), "doc_id", "text").localCheckpoint()
    NightlyCuration.appendAll(spark, bStores, admitted,
      emb.join(admitted.select(col("doc_id").as("vec_id")), "vec_id"),
      "doc_id", "text", dim = 8)
    // streamed cycle: three slices staged, one fold
    val sStores = mkStores(histDf, histEmb, "stream")
    val slices = batch.grouped((batch.size + 2) / 3).toSeq
    slices.zipWithIndex.foreach { case (sl, b) =>
      StreamingNightlyCuration.stageBatch(sl.toDF("doc_id", "text"),
        b.toLong, sStores)
    }
    val staged = StreamingNightlyCuration.stagedAdmitted(spark, sStores)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(staged ==
      admitted.select("doc_id").collect().map(_.getLong(0)).toSet)
    StreamingNightlyCuration.endOfNight(spark, sStores, emb, nightId = 1L,
      dim = 8)
    assert(storeState(sStores) == storeState(bStores))
    // the manifest is retired, so a second endOfNight is a no-op
    val before = storeState(sStores)
    StreamingNightlyCuration.endOfNight(spark, sStores, emb, nightId = 2L,
      dim = 8)
    assert(storeState(sStores) == before)
  }

  test("a crash-replayed staging micro-batch stages exactly once; a " +
      "committed id with different rows or an older id fails loudly") {
    import spark.implicits._
    val (hist, batch) = fixture
    val histDf = hist.toDF("doc_id", "text").localCheckpoint()
    val histEmb = hist.map { case (i, _) => (i, Seq.fill(8)(0.3f)) }
      .toDF("vec_id", "embedding")
    val stores = mkStores(histDf, histEmb, "replay")
    val b0 = batch.take(15).toDF("doc_id", "text")
    val b1 = batch.drop(15).toDF("doc_id", "text")
    StreamingNightlyCuration.stageBatch(b0, 0L, stores)
    StreamingNightlyCuration.stageBatch(b1, 1L, stores)
    val once = StreamingNightlyCuration.stagedAdmitted(spark, stores)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // replay of the in-flight batch: verified skip
    StreamingNightlyCuration.stageBatch(b1, 1L, stores)
    assert(StreamingNightlyCuration.stagedAdmitted(spark, stores)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet == once)
    // same id, different rows: a reset checkpoint one batch behind
    val e1 = intercept[IllegalArgumentException](
      StreamingNightlyCuration.stageBatch(b0, 1L, stores))
    assert(e1.getMessage.contains("rows differ"))
    // older id: checkpoint and manifest out of sync
    val e2 = intercept[IllegalArgumentException](
      StreamingNightlyCuration.stageBatch(b0, 0L, stores))
    assert(e2.getMessage.contains("older"))
  }

  test("endOfNight killed mid-fold (partial appends) converges on re-run " +
      "to the clean run's state; an empty night no-ops") {
    import spark.implicits._
    val (hist, batch) = fixture
    val histDf = hist.toDF("doc_id", "text").localCheckpoint()
    val histEmb = hist.map { case (i, _) => (i, Seq.fill(8)(0.3f)) }
      .toDF("vec_id", "embedding")
    val emb = (hist ++ batch).map { case (i, _) =>
      (i, Seq.fill(8)(0.1f + (i % 7) * 0.1f))
    }.toDF("vec_id", "embedding").localCheckpoint()
    // clean reference
    val cStores = mkStores(histDf, histEmb, "clean")
    StreamingNightlyCuration.stageBatch(batch.toDF("doc_id", "text"), 0L,
      cStores)
    StreamingNightlyCuration.endOfNight(spark, cStores, emb, nightId = 1L,
      dim = 8)
    // crashed run: the first two appends of the fold land, then a kill —
    // simulated by performing them directly with the night's ids
    val kStores = mkStores(histDf, histEmb, "killed")
    StreamingNightlyCuration.stageBatch(batch.toDF("doc_id", "text"), 0L,
      kStores)
    val staged = StreamingNightlyCuration.stagedAdmitted(spark, kStores)
      .localCheckpoint()
    BloomHistory.append(spark, kStores.bloom, staged, "text",
      explicitBid = Some(1L))
    ShingleIndex.appendToIndex(spark, kStores.shingle, staged, "doc_id",
      "text", explicitEp = Some(1L))
    // re-run the night: id-disciplined stores replay-skip, the rest fold
    StreamingNightlyCuration.endOfNight(spark, kStores, emb, nightId = 1L,
      dim = 8)
    assert(storeState(kStores) == storeState(cStores))
    // an empty night no-ops (nothing staged after retirement)
    val before = storeState(kStores)
    StreamingNightlyCuration.endOfNight(spark, kStores, emb, nightId = 2L,
      dim = 8)
    assert(storeState(kStores) == before)
    // a checkpoint replaying a FOLDED bid with the SAME rows no-ops (the
    // batch's content is already in the stores — the continuous mode's
    // normal crash window)...
    StreamingNightlyCuration.stageBatch(batch.toDF("doc_id", "text"), 0L,
      kStores)
    assert(storeState(kStores) == before &&
      StreamingNightlyCuration.stagedAdmitted(spark, kStores).count() == 0L)
    // ...but DIFFERENT rows under a folded bid is a reset checkpoint —
    // recomputing admission would read post-fold stores, so it fails
    val e = intercept[IllegalArgumentException](
      StreamingNightlyCuration.stageBatch(batch.take(5)
        .toDF("doc_id", "text"), 0L, kStores))
    assert(e.getMessage.contains("folded"))
    // the next night's bids (above the floor) stage normally
    StreamingNightlyCuration.stageBatch(batch.take(5)
      .toDF("doc_id", "text"), 1L, kStores)
    assert(StreamingNightlyCuration.stagedAdmitted(spark, kStores)
      .count() >= 0L)
  }

  test("crash between writeNightFloor and manifest rename, then a re-run " +
      "with a BUMPED nightId: folded bids never re-append; a fresh bid " +
      "staged into the stale manifest still folds") {
    import spark.implicits._
    val (hist, batch) = fixture
    val histDf = hist.toDF("doc_id", "text").localCheckpoint()
    val histEmb = hist.map { case (i, _) => (i, Seq.fill(8)(0.3f)) }
      .toDF("vec_id", "embedding")
    val emb = (hist ++ batch).map { case (i, _) =>
      (i, Seq.fill(8)(0.1f + (i % 7) * 0.1f))
    }.toDF("vec_id", "embedding").localCheckpoint()
    val (n1, n2) = batch.splitAt(batch.size / 2)
    val stores = mkStores(histDf, histEmb, "floorcrash")
    val fs = new org.apache.hadoop.fs.Path(stores.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(s"${stores.root}/manifest")
    // crash-window reconstruction: snapshot the live manifest before the
    // fold, put it back after (the fold advanced the floor and retired
    // the manifest; restoring it = "rename never happened")
    def snapshotManifest(tag: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(tmp(s"floormani-$tag"), "m")
      org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, p, false, conf)
      p
    }
    def restoreManifest(p: org.apache.hadoop.fs.Path): Unit = {
      if (fs.exists(live)) fs.delete(live, true)
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, live, false, conf)
    }
    StreamingNightlyCuration.stageBatch(n1.toDF("doc_id", "text"), 0L,
      stores)
    val snap1 = snapshotManifest("n1")
    StreamingNightlyCuration.endOfNight(spark, stores, emb, nightId = 1L,
      dim = 8)
    val afterNight1 = storeState(stores)
    restoreManifest(snap1)
    // the operator contract says re-run with the SAME nightId; a caller
    // that bumps it instead must not duplicate night 1's content
    StreamingNightlyCuration.endOfNight(spark, stores, emb, nightId = 2L,
      dim = 8)
    assert(storeState(stores) == afterNight1)
    // and the stale manifest is retired, so the state converged —
    // retirement also means it was re-tagged folded and then GC'd
    assert(!fs.exists(live))
    // the worse shape: the stale manifest holds night 1's folded bid AND
    // night 2's first fresh bid when the bumped fold runs — only the
    // fresh bid may fold. endOfNight(2) above left no retired manifest
    // (GC), so rebuild the crash window from night 2's own fold below.
    StreamingNightlyCuration.stageBatch(n2.take(3).toDF("doc_id", "text"),
      1L, stores)
    val snap2 = snapshotManifest("n2a")
    StreamingNightlyCuration.endOfNight(spark, stores, emb, nightId = 3L,
      dim = 8)
    restoreManifest(snap2) // crash window again: floor=1, manifest has bid 1
    StreamingNightlyCuration.stageBatch(n2.drop(3).toDF("doc_id", "text"),
      2L, stores) // fresh bid lands in the STALE manifest
    StreamingNightlyCuration.endOfNight(spark, stores, emb, nightId = 4L,
      dim = 8) // folds ONLY bid 2
    // reference: the same three admission rounds run cleanly. Night 2's
    // two slices admit against the same lake in both runs, so per-slice
    // staging composes (split invariance) — compare final store state.
    val cStores = mkStores(histDf, histEmb, "floorclean")
    StreamingNightlyCuration.stageBatch(n1.toDF("doc_id", "text"), 0L,
      cStores)
    StreamingNightlyCuration.endOfNight(spark, cStores, emb, nightId = 1L,
      dim = 8)
    StreamingNightlyCuration.stageBatch(n2.take(3).toDF("doc_id", "text"),
      1L, cStores)
    StreamingNightlyCuration.endOfNight(spark, cStores, emb, nightId = 3L,
      dim = 8)
    StreamingNightlyCuration.stageBatch(n2.drop(3).toDF("doc_id", "text"),
      2L, cStores)
    StreamingNightlyCuration.endOfNight(spark, cStores, emb, nightId = 4L,
      dim = 8)
    assert(storeState(stores) == storeState(cStores))
  }

  test("continuous mode: each micro-batch is its own night, admitted " +
      "against post-fold stores — equals sequential batch nights; the " +
      "admitted log records lake growth") {
    import spark.implicits._
    val (hist, batch) = fixture
    val histDf = hist.toDF("doc_id", "text").localCheckpoint()
    val histEmb = hist.map { case (i, _) => (i, Seq.fill(8)(0.3f)) }
      .toDF("vec_id", "embedding")
    val emb = (hist ++ batch).map { case (i, _) =>
      (i, Seq.fill(8)(0.1f + (i % 7) * 0.1f))
    }.toDF("vec_id", "embedding").localCheckpoint()
    val (n1, n2) = batch.splitAt(batch.size / 2)
    // reference: two sequential batch nights with a growing lake
    val bStores = mkStores(histDf, histEmb, "cont-batch")
    val adm1 = NightlyCuration.admit(spark, bStores,
      n1.toDF("doc_id", "text"), "doc_id", "text").localCheckpoint()
    NightlyCuration.appendAll(spark, bStores, adm1,
      emb.join(adm1.select(col("doc_id").as("vec_id")), "vec_id"),
      "doc_id", "text", dim = 8)
    val adm2 = NightlyCuration.admit(spark, bStores,
      n2.toDF("doc_id", "text"), "doc_id", "text").localCheckpoint()
    NightlyCuration.appendAll(spark, bStores, adm2,
      emb.join(adm2.select(col("doc_id").as("vec_id")), "vec_id"),
      "doc_id", "text", dim = 8)
    // continuous streamed: two files → two micro-batches, each its own
    // night (stage + fold inside one foreachBatch)
    val sStores = mkStores(histDf, histEmb, "cont-stream")
    val src = tmp("cont-src")
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def post(rows: Seq[(Long, String)], name: String): Unit = {
      val stageDir = tmp(s"cont-stage-$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stageDir)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(stageDir))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(src, s"$name.parquet"))
    }
    post(n1, "b0")
    post(n2, "b1")
    StreamingNightlyCuration.runContinuous(spark, src, sStores,
      emb, tmp("cont-ck"), dim = 8)
    assert(storeState(sStores) == storeState(bStores))
    // the admitted log holds exactly the two nights' admitted sets
    val log = StreamingNightlyCuration.admittedLog(spark, sStores)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val want =
      adm1.select("doc_id").collect().map(r => (r.getLong(0), 1L)).toSet ++
      adm2.select("doc_id").collect().map(r => (r.getLong(0), 2L)).toSet
    assert(log == want)
  }

  test("two sequential staged nights == two sequential batch nights " +
      "(night 2 admits against post-night-1 stores)") {
    import spark.implicits._
    val (hist, batch) = fixture
    val histDf = hist.toDF("doc_id", "text").localCheckpoint()
    val histEmb = hist.map { case (i, _) => (i, Seq.fill(8)(0.3f)) }
      .toDF("vec_id", "embedding")
    val emb = (hist ++ batch).map { case (i, _) =>
      (i, Seq.fill(8)(0.1f + (i % 7) * 0.1f))
    }.toDF("vec_id", "embedding").localCheckpoint()
    val (n1, n2) = batch.splitAt(batch.size / 2)
    // batch spelling: night 2 admits against the post-night-1 stores
    // (the Bloom sidecar grew by night-1's admitted fps in appendAll)
    val bStores = mkStores(histDf, histEmb, "seq-batch")
    val adm1 = NightlyCuration.admit(spark, bStores,
      n1.toDF("doc_id", "text"), "doc_id", "text").localCheckpoint()
    NightlyCuration.appendAll(spark, bStores, adm1,
      emb.join(adm1.select(col("doc_id").as("vec_id")), "vec_id"),
      "doc_id", "text", dim = 8)
    val adm2 = NightlyCuration.admit(spark, bStores,
      n2.toDF("doc_id", "text"), "doc_id", "text").localCheckpoint()
    NightlyCuration.appendAll(spark, bStores, adm2,
      emb.join(adm2.select(col("doc_id").as("vec_id")), "vec_id"),
      "doc_id", "text", dim = 8)
    // streamed spelling: two staged nights, same slices
    val sStores = mkStores(histDf, histEmb, "seq-stream")
    StreamingNightlyCuration.stageBatch(n1.toDF("doc_id", "text"), 0L,
      sStores)
    StreamingNightlyCuration.endOfNight(spark, sStores, emb, nightId = 1L,
      dim = 8)
    StreamingNightlyCuration.stageBatch(n2.toDF("doc_id", "text"), 1L,
      sStores)
    StreamingNightlyCuration.endOfNight(spark, sStores, emb, nightId = 2L,
      dim = 8)
    assert(storeState(sStores) == storeState(bStores))
  }
}
