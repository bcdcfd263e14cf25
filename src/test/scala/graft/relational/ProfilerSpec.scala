package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Single-pass profiler: metric correctness incl. nulls, and the one-scan
  * plan contract. */
class ProfilerSpec extends SparkTestBase {

  test("metrics match hand computation, nulls counted not aggregated") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, String)](
      (1.25, "a"), (2.50, "b"), (null, "b"), (1.25, null), (10.00, "c"))
      .toDF("v", "s")
    val got = Profiler.profile(df, numeric = Seq("v"), strings = Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = got("v")
    assert(v.getLong(1) == 5)          // n_rows
    assert(v.getLong(2) == 1)          // n_nulls
    assert(v.getLong(3) == 3)          // n_distinct (nulls excluded)
    assert(v.getLong(4) == 125)        // min ×100
    assert(v.getLong(5) == 1000)       // max ×100
    assert(v.getLong(6) == 1500)       // sum ×100
    assert(v.isNullAt(7) && v.isNullAt(8))
    val s = got("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 3)
    assert(s.isNullAt(4) && s.isNullAt(5) && s.isNullAt(6))
    assert(s.getString(7) == "a" && s.getString(8) == "c")
  }

  test("plan: exactly the two documented aggregations, no per-column jobs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prof").toString
    (1 to 100).map(i => (i.toDouble, (i % 7).toString)).toDF("v", "s")
      .write.mode("overwrite").parquet(dir)
    val out = Profiler.profile(spark.read.parquet(dir),
      numeric = Seq("v"), strings = Seq("s"))
    val plan = out.queryExecution.executedPlan.toString
    // one scan per aggregation — the measured-faster split (Profiler
    // scaladoc), NOT one scan per column/metric
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 2, s"expected the two documented scans, plan:\n$plan")
    assert(plan.contains("Expand"), "multi-count-distinct should plan one Expand")
    assert(out.count() == 2)
  }
}
