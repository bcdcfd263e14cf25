package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch profiling probe for the sf1 scale rehearsal (not part of CI —
  * flipped to ignore once the investigation closes). */
class LshProbeSpec extends SparkTestBase {

  ignore("occupancy histogram at deeper bit depths on sf1") {
    val dir = "/tmp/graft_sf1"
    val df = graft.T.embeddings(spark, dir)
    val dim = 64
    val base = df.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val bands = 64; val maxBits = 28
    val nPlanes = bands * maxBits
    val planes: Array[Array[Double]] =
      (0 until nPlanes).map(i => AnnOps.hyperplane(i, dim).toArray).toArray
    val sigSchema = StructType(StructField("id", LongType) +:
      (0 until bands).map(j => StructField(s"b$j", StringType)))
    val sigRdd = base.rdd.mapPartitions { rows =>
      rows.map { r =>
        val emb = r.getSeq[Float](1)
        val keys = new Array[Any](bands + 1)
        keys(0) = r.getLong(0)
        var j = 0
        while (j < bands) {
          val sb = new StringBuilder(maxBits)
          var b = 0
          while (b < maxBits) {
            val w = planes(j * maxBits + b)
            var d = 0.0; var k = 0
            while (k < dim) { d += emb(k).toDouble * w(k); k += 1 }
            sb.append(if (d >= 0) '1' else '0')
            b += 1
          }
          keys(j + 1) = sb.toString
          j += 1
        }
        org.apache.spark.sql.Row(keys: _*)
      }
    }
    val banded = spark.createDataFrame(sigRdd, sigSchema).localCheckpoint()
    val bandLong = banded.select(col("id"),
      posexplode(array((0 until bands).map(j => col(s"b$j")): _*))
        .as(Seq("band", "key"))).localCheckpoint()
    for (bits <- Seq(12, 16, 20, 24, 28)) {
      val occ = bandLong.groupBy(col("band"), substring(col("key"), 1, bits).as("k"))
        .count()
      val stats = occ.agg(max("count").as("mx"),
        sum(when(col("count") > 64, col("count") * (col("count") - 1) / 2)
          .otherwise(0)).as("hotPairs"),
        sum(col("count") * (col("count") - 1) / 2).as("allPairs"),
        sum(when(col("count") > 64, col("count")).otherwise(0)).as("hotRows"))
        .head()
      println(s"bits=$bits maxOcc=${stats.get(0)} " +
        s"pairsFromHot=${stats.get(1)} allPairs=${stats.get(2)} hotRows=${stats.get(3)}")
    }
  }
}
