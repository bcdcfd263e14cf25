package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal tooling (VERDICT r6 #4): the provisioned testdata stops
  * at sf0.1, but the scale arguments in this repo claim every operator
  * survives orders of magnitude more. [[MakeScaledData]] manufactures a
  * larger deterministic dataset by replicating a source scale factor K
  * times with key-space offsets (dimension tables stay fixed, fact/corpus
  * tables grow, text is re-tokenized per replica so the dedup family sees
  * a genuinely larger corpus rather than K exact copies of every
  * document); [[ScaleRehearsal]] then times selected catalog entries once
  * on each of two directories in one JVM and prints the ratio table that
  * STATUS.md records. Anything super-linear against the expected
  * data-growth ratio is a named issue for the next round.
  */
object MakeScaledData {

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1 && factor <= 64, "factor in [1, 64]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1
    def rep(df: DataFrame)(tx: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => tx(df, r)).reduce(_ unionByName _)

    // dimensions stay fixed — scaling up multiplies facts per dimension
    // row, exactly what a bigger real deployment looks like
    write(read("region"), "region")
    write(read("nation"), "nation")

    // names re-derive from the offset key (TPC-H's own Customer#%09d
    // scheme): a 10× customer table has 10× DISTINCT names — replicating
    // the name strings verbatim would hand the fuzzy-match family 10
    // exact copies of every entity, a pathological workload, not scale
    val cust = read("customer"); val cS = stride(cust, "c_custkey")
    write(rep(cust)((d, r) => d
      .withColumn("c_custkey", col("c_custkey") + lit(r * cS))
      .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))),
      "customer")

    val supp = read("supplier"); val sS = stride(supp, "s_suppkey")
    write(rep(supp)((d, r) => d
      .withColumn("s_suppkey", col("s_suppkey") + lit(r * sS))
      .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))),
      "supplier")

    val part = read("part"); val pS = stride(part, "p_partkey")
    write(rep(part)((d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * pS))), "part")

    val ord = read("orders"); val oS = stride(ord, "o_orderkey")
    write(rep(ord)((d, r) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(r * oS))
      .withColumn("o_custkey", col("o_custkey") + lit(r * cS))), "orders")

    val li = read("lineitem")
    write(rep(li)((d, r) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(r * oS))
      .withColumn("l_partkey", col("l_partkey") + lit(r * pS))
      .withColumn("l_suppkey", col("l_suppkey") + lit(r * sS))), "lineitem")

    // events: same series ids (each series gets factor× denser, the real
    // shape of a longer-running fleet); ts nudged +r µs so no two replicas
    // collide on an exact (series, ts) pair
    val ev = read("events")
    val eS = stride(ev, "event_id"); val uS = stride(ev, "user_id")
    write(rep(ev)((d, r) => d
      .withColumn("event_id", col("event_id") + lit(r * eS))
      .withColumn("user_id", col("user_id") + lit(r * uS))
      .withColumn("ts", expr(s"timestampadd(MICROSECOND, $r, ts)"))),
      "events")

    // documents: every replica's tokens get a replica prefix, so replicas
    // share no shingles with the original — the corpus is factor× larger
    // for the dedup/similarity family, not factor× exact duplicates of
    // itself (which would measure a pathological workload, not scale)
    val docs = read("documents"); val dS = stride(docs, "doc_id")
    write(rep(docs)((d, r) =>
      if (r == 0) d
      else d
        .withColumn("doc_id", col("doc_id") + lit(r * dS))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), t => concat(lit(s"r$r"), t)),
          " "))), "documents")

    // embeddings: rotate each replica's vector by r positions — norms and
    // pairwise structure preserved within a replica, decorrelated across
    val emb = read("embeddings"); val vS = stride(emb, "vec_id")
    write(rep(emb)((d, r) =>
      if (r == 0) d
      else d
        .withColumn("vec_id", col("vec_id") + lit(r * vS))
        .withColumn("embedding",
          expr(s"concat(slice(embedding, ${r + 1}, ${64 - r}), " +
            s"slice(embedding, 1, $r))"))), "embeddings")

    println(s"""{"scaled": "$outDir", "factor": $factor}""")
    spark.stop()
  }
}

/** Time selected catalog entries once on each of two sf directories in one
  * JVM (shared JIT/codegen warmup on the small dir) and print a ratio
  * table. One sample per (entry, dir): the rehearsal asks "is anything
  * super-linear?", not "what is the precise cost" — Bench owns that.
  *
  * `SPARK_GRAFT_REHEARSE_BIG_PASSES` (default 1) times the big dir that
  * many consecutive times and prints every pass: the first big pass pays
  * one-time costs a long-lived cluster does not (page-cache first touch,
  * Spark file-listing, per-(JVM, dir) index builds), so for entries with a
  * build/serve split the LAST pass is the steady-state serve cost — the
  * r11 protocol finding (q90 measured 99–117 s cold but 21 s warm). */
object ScaleRehearsal {

  def main(args: Array[String]): Unit = {
    val Array(dirA, dirB, namesCsv) = args
    val bigPasses = sys.env.getOrElse("SPARK_GRAFT_REHEARSE_BIG_PASSES", "1").toInt
    require(bigPasses >= 1 && bigPasses <= 5, "big passes in [1, 5]")
    val wanted = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val entries = graft.SparkEntry.catalog.filter(q => wanted.contains(q.name))
    val missing = wanted.toSet -- entries.map(_.name).toSet
    require(missing.isEmpty, s"unknown entries: $missing")
    def runOnce(q: graft.Q, dir: String): Double = {
      val t0 = System.nanoTime()
      q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    val bigCols = (1 to bigPasses).map(i => f"${s"big${i}_s"}%8s").mkString(" ")
    println(f"${"entry"}%-28s ${"small_s"}%8s $bigCols ${"ratio"}%6s")
    entries.foreach { q =>
      runOnce(q, dirA) // warmup (JIT + listing caches), untimed
      val a = runOnce(q, dirA)
      val bs = (1 to bigPasses).map(_ => runOnce(q, dirB))
      val bCols = bs.map(b => f"$b%8.2f").mkString(" ")
      // ratio from the LAST big pass: steady-state serve vs small
      println(f"${q.name}%-28s $a%8.2f $bCols ${bs.last / a}%6.1f")
      Console.out.flush()
    }
    spark.stop()
  }
}
