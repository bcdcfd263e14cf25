package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Skew-mitigation utilities (SURVEY §0 "salting for skew, AQE for runtime
  * re-plan").
  *
  * AQE's skew-join handles skew it can SEE (post-shuffle partition sizes).
  * Salting is for skew known a priori — a handful of hot keys (default
  * tenants, null-like sentinels, celebrity entities) that would pin one
  * task per hot key regardless of partition splitting, e.g. when the hot
  * key's rows must co-locate for a following stateful op. The trade is
  * explicit: the small side is replicated `factor`×, the big side's hot
  * keys spread over `factor` tasks.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with `big`'s rows scattered across
    * `factor` salt buckets and `small` replicated once per bucket — so a
    * hot key occupies `factor` tasks instead of one. Supports "inner" and
    * "left" (each unmatched big-side row survives exactly once, because its
    * single salt value matches exactly one replica group). The salt is
    * internal and dropped from the result.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int = 8, how: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    require(how == "inner" || how == "left", s"unsupported join type $how")
    val salted = big.withColumn("__salt",
      (rand(42) * factor).cast(IntegerType))
    val salts = big.sparkSession.range(factor.toLong)
      .select(col("id").cast(IntegerType).as("__salt"))
    val replicated = small.crossJoin(salts)
    salted.join(replicated, Seq(key, "__salt"), how).drop("__salt")
  }
}
