package graft.graph

import graft.SparkTestBase
import graft.exec.SparqlExecutor

/** Persisted vertical-partitioned graph storage: save → load must be
  * query-equivalent to the derived graph, and a constant-predicate scan
  * over the loaded graph must be partition pruning, not a full scan. */
class GraphStorageSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("saved graph reloads query-equivalent with partition-pruned scans") {
    val derived = graft.sparql.TpchGraph.graph(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft-graph").toString
    derived.save(path)
    val loaded = TriplesGraph.load(spark, path, derived.ts)

    val queries = Seq(
      // BGP join across two predicates
      """SELECT ?nname ?rname WHERE {
        |  ?n g:inRegion ?r . ?n g:name ?nname . ?r g:name ?rname .
        |} ORDER BY ?nname ?rname""".stripMargin,
      // typed literal slice + filter + arithmetic
      """SELECT ?sname ?b WHERE {
        |  ?s g:acctbal ?b . ?s g:name ?sname . FILTER(?b > 5000)
        |} ORDER BY ?sname""".stripMargin,
      // class-pruned NPS over the loaded byClass branches
      """SELECT DISTINCT ?n ?o WHERE {
        |  ?n rdf:type g:Nation . ?n !(g:name|g:key) ?o .
        |} ORDER BY ?n ?o""".stripMargin)
    val prologue =
      s"""PREFIX g:<${graft.sparql.TpchGraph.ns}>
         |PREFIX rdf:<http://www.w3.org/1999/02/22-rdf-syntax-ns#>
         |""".stripMargin
    for (q <- queries) {
      val a = new SparqlExecutor(derived).execute(prologue + q).collect()
        .map(_.toSeq.mkString("|")).toSeq
      val b = new SparqlExecutor(loaded).execute(prologue + q).collect()
        .map(_.toSeq.mkString("|")).toSeq
      assert(a.nonEmpty && a == b, s"derived vs loaded diverge for:\n$q")
    }

    // scan discipline: a single-predicate query over the loaded graph prunes
    // to its p=… partitions (PartitionFilters on p, not a full-dataset scan)
    val plan = new SparqlExecutor(loaded).execute(
      prologue + "SELECT ?s ?b WHERE { ?s g:acctbal ?b }")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p#"),
      "constant-predicate scan must carry a partition filter on p")

    // and the class-pruned NPS over the loaded graph skips the sensor
    // partitions entirely (byClass survived the round-trip)
    val loadedTyp = loaded.slice(graft.rdf.Rdf.typ).get
    assert(loadedTyp.subjectClasses.contains(graft.sparql.TpchGraph.typeNation))
    assert(loadedTyp.byClass.keySet.contains(graft.sparql.TpchGraph.typeSensor))
  }

  test("DESCRIBE on a persisted graph prunes by subject bucket") {
    val derived = graft.sparql.TpchGraph.graph(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft-graph-sb").toString
    derived.save(path)
    val loaded = TriplesGraph.load(spark, path, derived.ts)
    val prologue =
      s"""PREFIX g:<${graft.sparql.TpchGraph.ns}>
         |""".stripMargin
    val describe =
      """DESCRIBE ?n WHERE { ?n g:inRegion ?r . ?r g:name "ASIA" }"""
    def rows(g: TriplesGraph) =
      new SparqlExecutor(g).executeDescribe(prologue + describe)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    // same answer either way...
    assert(rows(derived).nonEmpty && rows(derived) == rows(loaded))
    // ...but the persisted path must prune the store scan by subject
    // bucket: with only (p, kind, cls) partitioning a DESCRIBE reads the
    // whole lake to answer a point lookup
    val plan = new SparqlExecutor(loaded).executeDescribe(prologue + describe)
      .queryExecution.executedPlan.toString
    val storeScans = plan.split("FileScan parquet").toSeq.tail
      .filter(_.contains("graft-graph-sb"))
    assert(storeScans.nonEmpty, "expected a store scan in the DESCRIBE plan")
    assert(storeScans.forall(s =>
      s.contains("PartitionFilters") && !s.contains("PartitionFilters: []") &&
        s.contains("sb#")),
      "DESCRIBE store scan must carry a subject-bucket partition filter")
    // wrong bucket count at load is a loud failure, not silent missing rows
    val bad = intercept[IllegalArgumentException] {
      TriplesGraph.load(spark, path, derived.ts, nBuckets = 8)
    }
    assert(bad.getMessage.contains("bucket"))
  }

  test("full SPARQL catalog through a save/load round-trip: equal results, every store scan pruned") {
    val derived = graft.sparql.TpchGraph.graph(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft-graph-cat").toString
    derived.save(path)
    val loaded = TriplesGraph.load(spark, path, derived.ts)
    val storeToken = path.split("/").last // identifies store scans in plan text

    for (name <- graft.sparql.SparqlQueries.sparqlTexts.keys) {
      val fromDerived = graft.sparql.SparqlQueries.executeOn(derived, name)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      val q = graft.sparql.SparqlQueries.executeOn(loaded, name)
      val fromLoaded = q.collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      assert(fromDerived == fromLoaded, s"$name diverges on the loaded graph")

      // scan discipline: every scan of the persisted store must carry a
      // non-empty partition filter — a store scan with PartitionFilters: []
      // is reading the whole lake for one predicate
      val plan = q.queryExecution.executedPlan.toString
      val storeScans = plan.split("FileScan parquet").toSeq.tail
        .filter(_.contains(storeToken))
      assert(storeScans.forall(!_.contains("PartitionFilters: []")),
        s"$name has an unpruned store scan")
    }
  }
}
