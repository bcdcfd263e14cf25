package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Embedding moments + PCA: exact partition-invariant accumulation, a
  * driver-side model check, and recovery of a planted principal axis. */
class EmbedStatsSpec extends SparkTestBase {

  private def mkDf(vecs: Seq[Array[Float]], parts: Int) = {
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding").repartition(parts)
  }

  test("secondMoments is integer-exact and partition-invariant") {
    val rnd = new scala.util.Random(5)
    val vecs = Seq.fill(200)(Array.fill(8)(rnd.nextFloat() * 2 - 1))
    // driver model
    val scale = 65536L
    val q = vecs.map(_.map(x => EmbedStats.qRound(x * scale.toDouble)))
    def want(i: Int, j: Int): (Long, Long, Long) =
      (q.map(_(i)).sum, q.map(_(j)).sum, q.map(v => v(i) * v(j)).sum)
    val results = Seq(1, 7, 32).map { parts =>
      EmbedStats.secondMoments(mkDf(vecs, parts), "embedding", dim = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2))
        .toVector
    }
    assert(results.distinct.size == 1, "moments changed with partitioning")
    val m = results.head
    assert(m.length == 8 * 9 / 2)
    m.foreach { case (i, j, n, si, sj, dot) =>
      assert(n == 200)
      val (wsi, wsj, wdot) = want(i.toInt, j.toInt)
      assert((si, sj, dot) == (wsi, wsj, wdot), s"($i,$j)")
    }
  }

  test("PCA recovers a planted dominant axis and projection centers it") {
    // cloud stretched along u with a small orthogonal component: the top
    // principal component must align with u
    val dim = 16
    val u = Array.tabulate(dim)(i => if (i % 2 == 0) 0.5f else -0.25f)
    val nu = math.sqrt(u.map(x => x * x.toDouble).sum)
    val rnd = new scala.util.Random(9)
    val vecs = Seq.fill(300) {
      val a = (rnd.nextDouble() * 2 - 1) * 3
      val b = rnd.nextDouble() * 0.2 - 0.1
      Array.tabulate(dim)(i =>
        (a * u(i) / nu + b * (if (i == 3) 1 else 0)).toFloat)
    }
    val df = mkDf(vecs, 13)
    val moments = EmbedStats.secondMoments(df, "embedding", dim)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt,
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val basis = EmbedStats.principalComponents(moments, dim, k = 2)
    val cos = basis(0).zip(u).map { case (a, b) => a * b / nu }.sum
    assert(math.abs(cos) > 0.99, s"top PC misaligned: |cos|=$cos")
    // components are orthonormal
    val b01 = basis(0).zip(basis(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(b01) < 1e-6)
    assert(math.abs(basis(0).map(x => x * x).sum - 1.0) < 1e-9)

    val n = moments.find(m => m._1 == 0 && m._2 == 0).get._3
    val mean = {
      val s = new Array[Double](dim)
      moments.foreach { case (i, j, _, si, _, _) =>
        if (i == j) s(i) = si.toDouble / 65536.0 / n }
      s
    }
    val proj = EmbedStats.project(df, "embedding", "pc", basis, mean)
    assert(proj.schema("pc").dataType.typeName == "array")
    val rows = proj.select("pc").collect().map(_.getSeq[Float](0))
    assert(rows.forall(_.length == 2))
    // projection of a centered cloud has ~zero mean per component
    val mean0 = rows.map(_(0).toDouble).sum / rows.length
    val spread0 = rows.map(v => math.abs(v(0).toDouble)).max
    assert(math.abs(mean0) < spread0 * 0.05)
  }
}
