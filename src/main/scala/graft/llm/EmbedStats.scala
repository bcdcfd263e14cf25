package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Embedding-corpus second-moment statistics + PCA — the dimensionality-
  * reduction / whitening preprocessing a similarity pipeline runs before
  * indexing (published practice: PCA-whitening embeddings before PQ/IVF
  * improves recall at the same code budget; FAISS ships the same
  * OPQ/PCA pre-transform stage).
  *
  * The DISTRIBUTED part is the moment accumulation: one corpus pass
  * reducing to a metadata-sized accumulator (n, Σq_i, Σq_i·q_j for
  * i ≤ j — d(d+1)/2 + d + 1 longs, ~17 KB at d=64), the same
  * "corpus-pass → tiny accumulator" shape as the PQ Lloyd trainer. The
  * eigen-decomposition runs on the driver over the d×d matrix —
  * metadata-sized work, exactly where it belongs.
  *
  * INTEGER-EXACT by construction: coordinates quantize to
  * `round(x·scale)` longs BEFORE accumulation, so partition count,
  * row order, and merge order cannot move a bit — the catalog's
  * hash-match discipline (a raw double Σ x_i·x_j can never match the
  * oracle across engines). Overflow bound: |q| ≤ scale·max|x|; with unit-
  * normalized embeddings and the default scale 2¹⁶, each product is
  * < 2³⁴, so Σ stays in-range up to ~2²⁹ rows per accumulator slot —
  * raise to a two-level (per-shard, then combine in BigInt) accumulation
  * past that, documented not implemented. */
object EmbedStats {

  /** Round half AWAY FROM ZERO — the SQL `round()` convention (DuckDB,
    * ANSI). Java's Math.round is floor(x+0.5) (half toward +∞), which
    * disagrees on negative exact halves — and float coordinates scaled by
    * a power of two land on exact halves routinely. */
  private[llm] def qRound(x: Double): Long =
    if (x >= 0) Math.floor(x + 0.5).toLong else Math.ceil(x - 0.5).toLong

  /** One corpus pass → exact quantized second moments, as rows
    * (i, j, n, si, sj, dot) for 0 ≤ i ≤ j < dim, where
    * q = round(x·scale) (half away from zero), si = Σq_i,
    * dot = Σ q_i·q_j. */
  def secondMoments(emb: DataFrame, vecCol: String, dim: Int,
      scale: Long = 65536L): DataFrame = {
    require(dim >= 1 && dim <= 4096)
    val spark = emb.sparkSession
    val nPairs = dim * (dim + 1) / 2
    // acc layout: [0] = n, [1..dim] = si, [dim+1 ..] = upper-triangle dots
    val zero = new Array[Long](1 + dim + nPairs)
    val acc = emb.select(vecCol).rdd.treeAggregate(zero)(
      seqOp = (a, row) => {
        val v = row.getSeq[Float](0)
        require(v.length == dim, s"expected dim $dim, got ${v.length}")
        val q = new Array[Long](dim)
        var i = 0
        while (i < dim) { q(i) = qRound(v(i) * scale.toDouble); i += 1 }
        a(0) += 1L
        i = 0
        var p = 1 + dim
        while (i < dim) {
          a(1 + i) += q(i)
          var j = i
          while (j < dim) { a(p) += q(i) * q(j); j += 1; p += 1 }
          i += 1
        }
        a
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    val rows = new scala.collection.mutable.ArrayBuffer[Row](nPairs)
    var p = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        rows += Row(i.toLong, j.toLong, acc(0), acc(1 + i), acc(1 + j), acc(p))
        j += 1; p += 1
      }
      i += 1
    }
    val schema = StructType(Seq(StructField("i", LongType),
      StructField("j", LongType), StructField("n", LongType),
      StructField("si", LongType), StructField("sj", LongType),
      StructField("dot", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Driver-side top-k principal components from collected moment rows
    * (the output of [[secondMoments]]): build the covariance matrix in
    * doubles, power-iterate with deflation from the deterministic unit
    * seeds e_k. Metadata-sized work (d×d). Returns k orthonormal rows. */
  def principalComponents(moments: Array[(Int, Int, Long, Long, Long, Long)],
      dim: Int, k: Int, iters: Int = 60,
      scale: Long = 65536L): Array[Array[Double]] = {
    require(k >= 1 && k <= dim)
    val cov = Array.ofDim[Double](dim, dim)
    val s2 = scale.toDouble * scale.toDouble
    moments.foreach { case (i, j, n, si, sj, dot) =>
      val c = (dot.toDouble - si.toDouble * sj.toDouble / n) / (n * s2)
      cov(i)(j) = c; cov(j)(i) = c
    }
    def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0; var j = 0
        while (j < dim) { s += m(i)(j) * v(j); j += 1 }
        out(i) = s; i += 1
      }
      out
    }
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val basis = new scala.collection.mutable.ArrayBuffer[Array[Double]]
    val work = cov.map(_.clone())
    for (c <- 0 until k) {
      var v = Array.tabulate(dim)(i => if (i == c) 1.0 else 0.0)
      for (_ <- 1 to iters) {
        val w = matVec(work, v)
        val n0 = norm(w)
        v = if (n0 > 1e-30) w.map(_ / n0) else v
      }
      basis += v
      // deflate: work -= λ v vᵀ
      val lam = {
        val w = matVec(work, v)
        v.zip(w).map { case (a, b) => a * b }.sum
      }
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { work(i)(j) -= lam * v(i) * v(j); j += 1 }
        i += 1
      }
    }
    basis.toArray
  }

  /** Distributed projection of an embedding column onto a (small,
    * broadcast) basis: map-only kernel, output `Array[Float]` of
    * length |basis|. Mean-centering uses the moment sums. */
  def project(emb: DataFrame, vecCol: String, outCol: String,
      basis: Array[Array[Double]], mean: Array[Double]): DataFrame = {
    val spark = emb.sparkSession
    val bc = spark.sparkContext.broadcast((basis, mean))
    val dim = mean.length
    val outSchema = StructType(emb.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val rdd = emb.rdd.mapPartitions { rows =>
      val (b, m) = bc.value
      rows.map { r =>
        val v = r.getSeq[Float](r.fieldIndex(vecCol))
        val out = new Array[Float](b.length)
        var c = 0
        while (c < b.length) {
          var s = 0.0; var i = 0
          while (i < dim) { s += (v(i) - m(i)) * b(c)(i); i += 1 }
          out(c) = s.toFloat; c += 1
        }
        Row.fromSeq(r.toSeq :+ out.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
