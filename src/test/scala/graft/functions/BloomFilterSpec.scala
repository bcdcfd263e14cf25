package graft.functions

import graft.SparkTestBase
import graft.llm.TextOps
import org.apache.spark.sql.functions._

/** Native Bloom aggregate + pure-Column probe: no false negatives on any
  * partitioning (partial-agg merge is word-wise OR), probe matches a
  * driver-side model of the same bit layout, and the history-dedup
  * operator is exact end to end. */
class BloomFilterSpec extends SparkTestBase {

  private val mBits = 1 << 12
  private val k = 4

  /** Driver model of BloomFilterAgg.set / BloomProbe.mightContain. */
  private def model(items: Seq[Long]): Array[Long] = {
    val words = new Array[Long](mBits / 64)
    items.foreach { h =>
      val h2 = (h >>> 32) | 1L
      (0 until k).foreach { i =>
        val pos = ((h + i * h2) & (mBits - 1)).toInt
        words(pos >>> 6) |= (1L << (pos & 63))
      }
    }
    words
  }

  test("aggregate equals the driver model on any partitioning; " +
      "probe has no false negatives and few false positives") {
    import spark.implicits._
    BloomFilterAgg.register(spark)
    val rnd = new scala.util.Random(7)
    val members = Seq.fill(300)(rnd.nextLong())
    val got = members.toDF("h").repartition(7)
      .agg(call_function(BloomFilterAgg.name, $"h", lit(mBits), lit(k)))
      .collect()(0).getSeq[Long](0).toArray
    assert(got.sameElements(model(members)))

    val bloom = members.toDF("h").repartition(7)
      .agg(call_function(BloomFilterAgg.name, $"h", lit(mBits), lit(k))
        .as("words"))
    val probes = (members ++ Seq.fill(3000)(rnd.nextLong())).distinct
    val hits = probes.toDF("h").crossJoin(broadcast(bloom))
      .filter(BloomProbe.mightContain($"words", $"h", mBits, k))
      .select("h").collect().map(_.getLong(0)).toSet
    assert(members.toSet.subsetOf(hits), "false negative!")
    // 300 items in 4096 bits, k=4: fill ~25%, fp rate ~(0.25)^4 ≈ 0.4% —
    // allow 10x headroom before calling the layout broken
    assert(hits.size <= members.toSet.size + 120,
      s"false-positive blowup: ${hits.size}")
  }

  test("dedupAgainstHistory is exact: equals the brute-force semi-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e")
    def doc() = Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(5))).mkString(" ")
    val history = (0L until 200L).map(i => (i, doc()))
    val batch = (1000L until 1100L).map(i => (i, doc()))
    val hDF = history.toDF("doc_id", "text").repartition(5)
    val bDF = batch.toDF("doc_id", "text").repartition(3)
    def fpOf(t: String) = t.trim.split(" ").distinct.sorted.mkString(" ")
    val hFps = history.map(h => fpOf(h._2)).toSet
    val expected = batch.filter(b => hFps.contains(fpOf(b._2))).map(_._1).toSet
    val got = TextOps.dedupAgainstHistory(hDF, bDF, "doc_id", "text",
        mBits = mBits, k = k)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must contain true dups")
  }
}
