package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native KMV sketch aggregate: exact k-smallest-distinct semantics under
  * any partitioning (exercising both update and merge paths), duplicate
  * insensitivity, and the distinct-count estimate's error bound. */
class KmvSketchAggSpec extends SparkTestBase {

  test("keeps the k smallest distinct values under any partitioning") {
    import spark.implicits._
    KmvSketchAgg.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map(_ =>
      ("g" + rnd.nextInt(3), rnd.nextInt(800).toLong))
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).distinct.sorted.take(16)).toMap
    for (parts <- Seq(1, 13)) {
      val got = rows.toDF("g", "h").repartition(parts)
        .groupBy("g").agg(expr("graft_kmv_sketch(h, 16)").as("mins"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList)
        .toMap
      assert(got == want, s"mismatch at $parts partitions")
    }
  }

  test("duplicates never occupy two of the k slots") {
    import spark.implicits._
    KmvSketchAgg.register(spark)
    // 1000 copies of value 5 plus singletons 10..20: the sketch must hold
    // {5, 10, 11, 12} for k=4, not {5, 5, 5, 5}
    val rows = Seq.fill(1000)(5L) ++ (10L to 20L)
    val got = rows.toDF("h").repartition(7)
      .agg(expr("graft_kmv_sketch(h, 4)").as("m"))
      .collect().head.getSeq[Long](0).toList
    assert(got == List(5L, 10L, 11L, 12L))
  }

  test("estimate is within 4 sigma on a 60-bit-hashed stream") {
    import spark.implicits._
    KmvSketchAgg.register(spark)
    val n = 40000
    val k = 256
    val df = (0 until n).map(i => s"tok$i").toDF("t")
      .select(conv(substring(md5(col("t")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val mins = df.agg(expr(s"graft_kmv_sketch(h, $k)").as("m"))
      .collect().head.getSeq[Long](0)
    assert(mins.size == k)
    val est = (k - 1).toDouble * math.pow(2, 60) / mins.last
    val sigma = n / math.sqrt(k - 2)
    assert(math.abs(est - n) < 4 * sigma,
      s"estimate $est outside 4 sigma of $n")
  }
}
