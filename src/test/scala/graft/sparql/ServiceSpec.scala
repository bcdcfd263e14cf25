package graft.sparql

import graft.SparkTestBase
import graft.exec.SparqlExecutor
import graft.graph.TriplesGraph
import graft.rdf.{Iri, Lit, Term, Xsd}

/** SERVICE (SPARQL 1.1 Federated Query) — in-process federation against a
  * registered second TriplesGraph; the reference `todo!()`s the SERVICE
  * node outright (hybrid/src/combiner.rs:453-455). SILENT failure follows
  * §2.2: the pattern evaluates to a single empty solution mapping, leaving
  * the rest of the query untouched. */
class ServiceSpec extends SparkTestBase {

  private val ex = "http://example.net/ns#"
  private val ep = s"${ex}remoteService"

  private def triple(s: String, p: String, o: Term) =
    (Iri(ex + s): Term, ex + p, o)

  // local graph: people with names
  private lazy val local: TriplesGraph = TriplesGraph.fromTerms(spark, Seq(
    triple("alice", "name", Lit("Alice", Xsd.string)),
    triple("bob", "name", Lit("Bob", Xsd.string)),
    triple("carol", "name", Lit("Carol", Xsd.string))))

  // remote graph: ages for SOME of the same subjects, plus a stranger
  private lazy val remote: TriplesGraph = TriplesGraph.fromTerms(spark, Seq(
    triple("alice", "age", Lit("30", Xsd.integer)),
    triple("bob", "age", Lit("40", Xsd.integer)),
    triple("dave", "age", Lit("50", Xsd.integer))))

  private def run(q: String, services: Map[String, TriplesGraph] =
      Map(ep -> remote)) =
    new SparqlExecutor(local, services = services)
      .execute(s"PREFIX ex:<$ex>\n" + q)

  test("SERVICE joins remote bindings on shared variables") {
    val got = run(
      s"""SELECT ?name ?age WHERE {
         |  ?p ex:name ?name .
         |  SERVICE <$ep> { ?p ex:age ?age }
         |} ORDER BY ?name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("Alice", 30L), ("Bob", 40L)),
      "carol has no remote age; dave has no local name")
  }

  test("SERVICE pattern filters evaluate remotely") {
    val got = run(
      s"""SELECT ?name WHERE {
         |  ?p ex:name ?name .
         |  SERVICE <$ep> { ?p ex:age ?a . FILTER(?a > 35) }
         |} ORDER BY ?name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Bob"))
  }

  test("SERVICE sees the remote dataset, not the local one") {
    // name triples exist only locally: inside SERVICE the pattern is empty
    val got = run(
      s"""SELECT ?name WHERE {
         |  SERVICE <$ep> { ?p ex:name ?name }
         |}""".stripMargin)
    assert(got.count() == 0L)
  }

  test("SERVICE SILENT on an unknown endpoint is the unit solution") {
    // §2.2: failure under SILENT = a single empty solution mapping — the
    // outer pattern's results pass through unchanged
    val got = run(
      s"""SELECT ?name WHERE {
         |  ?p ex:name ?name .
         |  SERVICE SILENT <${ex}nowhere> { ?p ex:age ?age }
         |} ORDER BY ?name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Alice", "Bob", "Carol"))
  }

  test("SERVICE without SILENT fails loudly on an unknown endpoint") {
    val e = intercept[IllegalArgumentException] {
      run(s"SELECT ?a WHERE { SERVICE <${ex}nowhere> { ?p ex:age ?a } }")
    }
    assert(e.getMessage.contains("nowhere") && e.getMessage.contains(ep))
  }

  test("prefixed endpoint names and SILENT keyword parse") {
    val got = run(
      s"""SELECT ?name ?age WHERE {
         |  ?p ex:name ?name .
         |  SERVICE SILENT ex:remoteService { ?p ex:age ?age }
         |} ORDER BY ?name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("Alice", 30L), ("Bob", 40L)),
      "a registered endpoint under SILENT behaves exactly as without")
  }

  test("unbound variable endpoints need SILENT; with it they are the unit solution") {
    intercept[IllegalArgumentException] {
      run(s"SELECT ?a WHERE { SERVICE ?svc { ?p ex:age ?a } }")
    }
    val got = run(
      s"""SELECT ?name WHERE {
         |  ?p ex:name ?name .
         |  SERVICE SILENT ?svc { ?p ex:age ?age }
         |} ORDER BY ?name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Alice", "Bob", "Carol"))
  }

  // fixture for BOUND endpoint variables: each person names their service;
  // both remotes hold a val for every person, with different numbers, so a
  // cross-endpoint leak is detectable (alice via B would read 91, not 1)
  private val epB = s"${ex}remoteB"
  private lazy val localRouted: TriplesGraph = TriplesGraph.fromTerms(spark, Seq(
    triple("alice", "name", Lit("Alice", Xsd.string)),
    triple("bob", "name", Lit("Bob", Xsd.string)),
    triple("carol", "name", Lit("Carol", Xsd.string)),
    triple("alice", "svc", Iri(ep)),
    triple("bob", "svc", Iri(epB)),
    triple("carol", "svc", Iri(ex + "nowhere"))))
  private lazy val remoteA2: TriplesGraph = TriplesGraph.fromTerms(spark, Seq(
    triple("alice", "value", Lit("1", Xsd.integer)),
    triple("bob", "value", Lit("92", Xsd.integer))))
  private lazy val remoteB2: TriplesGraph = TriplesGraph.fromTerms(spark, Seq(
    triple("alice", "value", Lit("91", Xsd.integer)),
    triple("bob", "value", Lit("2", Xsd.integer))))

  test("bound variable endpoint routes each solution to ITS endpoint") {
    val got = new SparqlExecutor(localRouted,
      services = Map(ep -> remoteA2, epB -> remoteB2))
      .execute(s"""PREFIX ex:<$ex>
        |SELECT ?name ?v WHERE {
        |  ?p ex:name ?name . ?p ex:svc ?svc .
        |  SERVICE SILENT ?svc { ?p ex:value ?v }
        |} ORDER BY ?name""".stripMargin)
      .collect().map(r =>
        (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    // alice reads A's 1 (not B's 91), bob reads B's 2 (not A's 92), and
    // carol's unknown endpoint passes through under SILENT with ?v unbound
    assert(got == Seq(("Alice", 1L), ("Bob", 2L), ("Carol", -1L)))
  }

  test("bound variable endpoint without SILENT fails loudly on an unknown one") {
    val e = intercept[IllegalArgumentException] {
      new SparqlExecutor(localRouted,
        services = Map(ep -> remoteA2, epB -> remoteB2))
        .execute(s"""PREFIX ex:<$ex>
          |SELECT ?name ?v WHERE {
          |  ?p ex:name ?name . ?p ex:svc ?svc .
          |  SERVICE ?svc { ?p ex:value ?v }
          |} ORDER BY ?name""".stripMargin).collect()
    }
    assert(e.getMessage.contains("nowhere"))
  }

  test("two SERVICE clauses federate three datasets in one query") {
    val remote2 = TriplesGraph.fromTerms(spark, Seq(
      triple("alice", "city", Lit("Oslo", Xsd.string)),
      triple("bob", "city", Lit("Bergen", Xsd.string))))
    val got = run(
      s"""SELECT ?name ?age ?city WHERE {
         |  ?p ex:name ?name .
         |  SERVICE <$ep> { ?p ex:age ?age }
         |  SERVICE <${ex}cities> { ?p ex:city ?city }
         |} ORDER BY ?name""".stripMargin,
      services = Map(ep -> remote, s"${ex}cities" -> remote2))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(("Alice", 30L, "Oslo"), ("Bob", 40L, "Bergen")))
  }
}
