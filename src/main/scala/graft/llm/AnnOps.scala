package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two patterns, per the training-pipeline brief:
  *  - `topKForQueries`: exact brute-force cosine top-k for a bounded query
  *    batch — broadcast the batch against the corpus; the baseline, and the
  *    legitimate production shape for "score this request against the lake".
  *  - `lshThresholdPairs`: random-hyperplane LSH self-join for the scale
  *    path — signatures via fixed pseudo-random hyperplanes, candidates from
  *    a (band, signature) bucket join (never an all-pairs product), then
  *    exact cosine verification.
  */
object AnnOps {

  /** Sequential-fold double-precision dot product (same evaluation order as
    * a plain loop, so independent engines agree bit-for-bit). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for a small query set: broadcast queries × corpus
    * scoring + per-query top-k window. Output (qid, rk, nid). */
  def topKForQueries(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nemb"))
    val scored = c.crossJoin(broadcast(q)) // bounded batch: |q| rows broadcast
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qemb"), col("nemb")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk").cast(LongType), col("nid"))
  }

  /** Deterministic pseudo-random hyperplane component: sin(i*dim + k + 1).
    * Chosen because any engine can regenerate it (for oracle checks); in
    * production swap for seeded gaussians — the plumbing is identical. */
  def hyperplane(i: Int, dim: Int): Seq[Double] =
    (0 until dim).map(k => math.sin(i.toDouble * dim + k + 1))

  /** Random-hyperplane LSH threshold self-join: numBands bands of
    * bitsPerBand sign bits each (band key = the bit string), candidates from
    * the bucket join, verified with exact cosine >= threshold.
    *
    * Band parameters are tuned for the production regime (cos >= 0.9 dups:
    * recall 1-(1-0.857^8)^16 ~ 0.996); at this dataset's max cos ~0.5 the
    * LSH is exercised for correctness, not recall.
    */
  def lshThresholdPairs(df: DataFrame, dim: Int, numBands: Int = 16,
      bitsPerBand: Int = 8, threshold: Double = 0.4): DataFrame = {
    val base = df.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val bandKeys = (0 until numBands).map { j =>
      val bits = (0 until bitsPerBand).map { r =>
        val plane = typedLit(hyperplane(j * bitsPerBand + r, dim))
        when(dot(col("emb"), plane) >= 0, "1").otherwise("0")
      }
      concat(bits: _*).as(s"b$j")
    }
    val banded = base.select((col("id") +: bandKeys): _*)
    val bandLong = banded.select(col("id"),
      posexplode(array((0 until numBands).map(j => col(s"b$j")): _*))
        .as(Seq("band", "key")))
    val l = bandLong.select(col("id").as("ida"), col("band"), col("key"))
    val r = bandLong.select(col("id").as("idb"), col("band").as("band2"), col("key").as("key2"))
    val candidates = l.join(r,
        col("band") === col("band2") && col("key") === col("key2") &&
          col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    val ea = base.select(col("id").as("ida"), col("emb").as("ea"))
    val eb = base.select(col("id").as("idb"), col("emb").as("eb"))
    candidates.join(ea, "ida").join(eb, "idb")
      .filter(cosine(col("ea"), col("eb")) >= threshold)
      .select(col("ida"), col("idb"))
  }
}
