package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer — the vocabulary-construction step of a
  * training-data pipeline (Sennrich et al. 2016; the algorithm behind
  * GPT-2/SentencePiece-BPE vocabularies).
  *
  * Scale shape: the only corpus-sized work is ONE distributed word-count
  * aggregation (partial-agg shuffle, Zipf-small output); the merge loop
  * then runs driver-side over the word HISTOGRAM, exactly like the
  * reference trainers (HuggingFace/SentencePiece train from word counts,
  * not the raw corpus). Encoding is a broadcast-merges map kernel: zero
  * shuffles at any corpus size.
  */
object Bpe {

  /** End-of-word marker (GPT-2-style suffix symbol): lets merges learn
    * word-final units without crossing word boundaries. */
  val EndOfWord = "</w>"

  /** Cap on the word histogram rows brought to the driver. 4M entries ×
    * ~100 B ≈ a few hundred MB — comfortable driver heap; far above any
    * vocabulary a tokenizer trainer benefits from (GPT-2 trains from ~50k
    * symbol types). The cap is a top-N BY COUNT, so what falls off is the
    * lowest-frequency tail — exactly what `min_frequency` drops in
    * HF/SentencePiece trainers. */
  val DefaultMaxDistinctWords: Int = 4 << 20

  /** Train `numMerges` merge rules. Deterministic: the best pair is chosen
    * by (count desc, pair lexicographic asc) — integer counts, so the rule
    * sequence is reproducible on any engine/partitioning. Pairs below
    * `minCount` stop training early.
    *
    * Driver-side memory is BOUNDED: the word histogram is filtered to
    * `count >= minCount` (a 100 TB web crawl's distinct-token tail — URLs,
    * typos, code — is overwhelmingly singletons) and capped to the
    * `maxDistinctWords` most frequent words (TakeOrderedAndProject, a
    * distributed top-N, not a full sort) BEFORE `.collect()`. Both bounds
    * mirror the standard trainer knob (HF `min_frequency`); the merge loop
    * itself then runs over the histogram like every published BPE trainer. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L,
      maxDistinctWords: Int = DefaultMaxDistinctWords): Seq[(String, String)] = {
    val wordCounts: Array[(String, Long)] =
      wordHistogram(df, textCol, minCount, maxDistinctWords)

    // mutable symbol sequences per distinct word, weighted by word count
    val words: Array[Array[String]] = wordCounts.map { case (w, _) =>
      w.map(_.toString).toArray :+ EndOfWord
    }
    val weights: Array[Long] = wordCounts.map(_._2)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      var i = 0
      while (i < words.length) {
        val w = words(i)
        var j = 0
        while (j + 1 < w.length) {
          val p = (w(j), w(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + weights(i)
          j += 1
        }
        i += 1
      }
      val best = pairCounts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some((pair, c)) if c >= minCount =>
          merges += pair
          i = 0
          while (i < words.length) {
            words(i) = mergeOnce(words(i), pair)
            i += 1
          }
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  /** The bounded distributed word histogram `train` collects: one
    * partial-agg shuffle, then `c >= minCount` and a top-`maxDistinctWords`
    * by (count desc, word asc) — the sort+limit compiles to
    * TakeOrderedAndProject, so no partition ever holds the full histogram
    * and the driver sees at most `maxDistinctWords` rows. Exposed for the
    * bound spec. */
  private[llm] def wordHistogram(df: DataFrame, textCol: String,
      minCount: Long, maxDistinctWords: Int): Array[(String, Long)] = {
    df.select(explode(split(trim(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxDistinctWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** One merge applied left-to-right, non-overlapping. */
  private def mergeOnce(w: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < w.length) {
      if (j + 1 < w.length && w(j) == pair._1 && w(j + 1) == pair._2) {
        out += (pair._1 + pair._2); j += 2
      } else { out += w(j); j += 1 }
    }
    out.toArray
  }

  /** Production greedy encode of one word: repeatedly merge the
    * LOWEST-RANK adjacent pair present (the GPT-2 `bpe()` loop) — may
    * revisit earlier ranks when a later merge creates their pair. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ EndOfWord
    var go = true
    while (go && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var j = 0
      while (j + 1 < syms.length) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (bestPair == null) go = false
      else syms = mergeOnce(syms, bestPair)
    }
    syms.toSeq
  }

  /** Distributed encode: (id, tokens array<string>) via a map-only kernel
    * with the merge table broadcast. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val ranks = merges.zipWithIndex.toMap
    val rb = spark.sparkContext.broadcast(ranks)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("tokens", ArrayType(StringType))))
    val rdd = df.select(col(idCol).cast(LongType), col(textCol)).rdd
      .mapPartitions { rows =>
        val r = rb.value
        rows.map { row =>
          val toks = row.getString(1).trim.split(" ", -1).filter(_.nonEmpty)
            .flatMap(w => encodeWord(w, r))
          Row(row.getLong(0), toks.toSeq)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** SINGLE-PASS-PER-RANK token count — the oracle-checkable spelling: each
    * merge is applied once, in rank order, as a literal string replace over
    * a delimiter-wrapped symbol string (symbols wrapped in \u0001…\u0002 so
    * replaces can never match across a seam), which is exactly a chain of
    * `replace()` calls any SQL engine reproduces. Diverges from the greedy
    * [[encodeWord]] only when a later merge re-creates an earlier pair —
    * the documented trade for cross-engine verifiability. Map-only. */
  def singlePassTokenCount(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val mb = spark.sparkContext.broadcast(merges.toArray)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("n_bpe", LongType)))
    val rdd = df.select(col(idCol).cast(LongType), col(textCol)).rdd
      .mapPartitions { rows =>
        val ms = mb.value
        rows.map { row =>
          var s = wrapText(row.getString(1))
          var i = 0
          while (i < ms.length) {
            s = s.replace(wrap(ms(i)._1) + wrap(ms(i)._2),
              wrap(ms(i)._1 + ms(i)._2))
            i += 1
          }
          Row(row.getLong(0), s.count(_ == '\u0001').toLong)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  private[llm] def wrap(sym: String): String = "\u0001" + sym + "\u0002"

  /** Words → wrapped char symbols + end-of-word marker, concatenated.
    * The seam delimiters \u0001/\u0002 are stripped from the input FIRST
    * (before word splitting, mirrored in the q108 oracle SQL) — otherwise
    * input containing them would corrupt both the replace chain and the
    * \u0001-counting token count. */
  private[llm] def wrapText(text: String): String = {
    val sb = new StringBuilder
    val clean = text.replace("\u0001", "").replace("\u0002", "")
    clean.trim.split(" ", -1).foreach { w =>
      if (w.nonEmpty) {
        w.foreach(c => sb.append(wrap(c.toString)))
        sb.append(wrap(EndOfWord))
      }
    }
    sb.toString
  }
}
