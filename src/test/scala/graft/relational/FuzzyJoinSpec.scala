package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Blocked levenshtein fuzzy join (q119): reference-model equality,
  * blocking-recall contract, and the no-cross-product plan shape. */
class FuzzyJoinSpec extends SparkTestBase {

  test("pairs match a brute-force reference within blocks") {
    import spark.implicits._
    val rows = Seq(
      (1L, "kettle", "A"), (2L, "kettlf", "A"), (3L, "kettle", "A"),
      (4L, "kettle", "B"),            // same string, different block: no pair
      (5L, "saucepan", "A"), (6L, "saucepan!", "A"),
      (7L, "completely", "A"))
    val df = rows.toDF("id", "name", "blk")
    val got = FuzzyJoin.blockedLevenshtein(df, "id", "name",
        Seq("blk"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa, ba) <- rows; (ib, sb, bb) <- rows
      if ba == bb && ia < ib && lev(sa, sb) <= 2
    } yield (ia, ib, lev(sa, sb))).toSet
    assert(got == want)
    // the cross-block identical pair (1,4)/(3,4) is absent by design
    assert(!got.exists(p => p._2 == 4L))
  }

  test("graft_lev equals full levenshtein when <= k, k+1 beyond; codegen == kernel") {
    import spark.implicits._
    graft.functions.BoundedLevenshtein.register(spark)
    val rnd = new scala.util.Random(31)
    def randStr(): String =
      (0 until rnd.nextInt(14)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val rows = (0 until 400).map(_ => (randStr(), randStr())) ++
      Seq(("", ""), ("", "abc"), ("kettle", "kettle"),
        ("café", "cafe"), ("😀ab", "ab")) // é, emoji (surrogate pair)
    for (k <- Seq(0, 1, 2, 3)) {
      val got = rows.toDF("a", "b")
        .select(col("a"), col("b"),
          expr(s"graft_lev(a, b, $k)").as("d"), levenshtein($"a", $"b").as("full"))
        .collect()
      got.foreach { r =>
        val (a, b, d, full) = (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))
        val want = math.min(full, k + 1)
        assert(d == want, s"graft_lev('$a','$b',$k): got $d, want $want")
        // the driver-side kernel agrees with the codegen'd path
        assert(graft.functions.BoundedLevenshtein.compute(a, b, k) == want)
      }
    }
  }

  test("the banded DP evaluates exactly ONCE, above the cheap join " +
      "conditions (r16: the explode barrier keeps dist<=k out of the join)") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"name$i", i % 7))
      .toDF("id", "name", "blk")
    val out = FuzzyJoin.blockedLevenshtein(df, "id", "name", Seq("blk"), 2)
    out.collect() // finalize the adaptive plan
    // AQE's toString prints the Final AND Initial plans — count in the
    // final section only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val n = "boundedlevenshtein".r.findAllIn(plan).size
    assert(n == 1, s"expected exactly one boundedlevenshtein evaluation " +
      s"in the plan (pre-r16: once per raw join pair in the condition + " +
      s"once in the output projection), got $n:\n$plan")
  }

  test("plan is a blocked equi-join, never a cross product") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"name$i", i % 7)).toDF("id", "name", "blk")
    val plan = FuzzyJoin.blockedLevenshtein(df, "id", "name", Seq("blk"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"expected an equi-join on the blocking key:\n$plan")
  }
}
