package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-code correctness and the actual payoff — a
  * box predicate on EITHER key skips most files of a z-ordered layout,
  * measured against a single-column-sorted layout of the same data. */
class ZOrderSpec extends SparkTestBase {

  test("zValue interleaves bits (driver model check)") {
    import spark.implicits._
    def model(a: Long, b: Long): Long = {
      var out = 0L
      for (i <- 0 until 32)
        out |= ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      out
    }
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(200)((rnd.nextInt(Int.MaxValue).toLong,
      rnd.nextInt(Int.MaxValue).toLong)) :+ (0L, 0L) :+
      (0xffffffffL, 0L) :+ (0L, 0xffffffffL)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) == model(a, b), s"z($a, $b)")
    }
  }

  test("z-ordered layout prunes files for box predicates on either key") {
    import spark.implicits._
    val n = 40000
    val rnd = new scala.util.Random(17)
    val data = (0 until n).map(_ =>
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong,
        rnd.nextLong())).toDF("x", "y", "payload")
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    val sDir = java.nio.file.Files.createTempDirectory("sorted").toString
    ZOrder.writeZOrdered(data, "x", "y", zDir, numFiles = 64)
    // control layout: sorted by x only, same file count
    data.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sDir)

    // count FILES whose [min,max] of the filter column admit the box —
    // the same statistic parquet row-group/file skipping uses
    def filesAdmitting(dir: String, c: String, lo: Long, hi: Long): Int = {
      val perFile = spark.read.parquet(dir)
        .select(col(c), input_file_name().as("f"))
        .groupBy("f").agg(min(c).as("mn"), max(c).as("mx"))
        .collect()
      perFile.count(r => r.getLong(1) <= hi && r.getLong(2) >= lo)
    }
    // a 1/16-wide slice in each dimension
    val w = (1 << 16) / 16
    val zx = filesAdmitting(zDir, "x", 0, w - 1)
    val zy = filesAdmitting(zDir, "y", 0, w - 1)
    val sx = filesAdmitting(sDir, "x", 0, w - 1)
    val sy = filesAdmitting(sDir, "y", 0, w - 1)
    info(s"files admitting slice: zorder x=$zx y=$zy of 64; sorted x=$sx y=$sy")
    // sorted-by-x: perfect on x, hopeless on y (every file spans all y)
    assert(sx <= 8 && sy >= 56)
    // z-order: BOTH dimensions prune to a fraction of the files
    assert(zx <= 24, s"z-layout did not prune on x: $zx/64")
    assert(zy <= 24, s"z-layout did not prune on y: $zy/64")

    // and the data round-trips completely
    assert(spark.read.parquet(zDir).count() == n)
  }
}
