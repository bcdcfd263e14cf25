package graft.sparql

import graft.SparkTestBase
import graft.exec.SparqlExecutor
import graft.graph.TriplesGraph
import graft.rdf.{Iri, Lit, Term, Xsd}

/** Named-graph (quad) semantics — beyond both engines (the reference parses
  * default-graph SELECT only): standard RDF dataset rules, where
  * default-graph matching sees only untagged triples, GRAPH <iri> scopes to
  * one named graph, and GRAPH ?g enumerates named graphs with the shared
  * variable enforcing same-graph co-location across the pattern. */
class NamedGraphSpec extends SparkTestBase {

  private val ex = "http://example.net/ns#"
  private val g1 = s"${ex}graph1"
  private val g2 = s"${ex}graph2"

  private def quad(s: String, p: String, o: Term, g: Option[String]) =
    (Iri(ex + s): Term, ex + p, o, g)

  private lazy val graph: TriplesGraph = TriplesGraph.fromQuads(spark, Seq(
    // default graph: one untagged triple
    quad("a", "name", Lit("DefaultA", Xsd.string), None),
    // graph1: a full little subgraph
    quad("a", "name", Lit("G1A", Xsd.string), Some(g1)),
    quad("a", "knows", Iri(s"${ex}b"), Some(g1)),
    quad("b", "name", Lit("G1B", Xsd.string), Some(g1)),
    // graph2: same subjects, different facts
    quad("a", "name", Lit("G2A", Xsd.string), Some(g2)),
    quad("c", "name", Lit("G2C", Xsd.string), Some(g2))))

  private def run(q: String) =
    new SparqlExecutor(graph).execute(s"PREFIX ex:<$ex>\n" + q)

  test("default-graph matching sees only untagged triples") {
    val got = run("SELECT ?n WHERE { ex:a ex:name ?n }")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("DefaultA"))
  }

  test("GRAPH <iri> scopes the pattern to one named graph") {
    val got = run(s"SELECT ?n WHERE { GRAPH <$g1> { ex:a ex:name ?n } }")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("G1A"))
    val other = run(s"SELECT ?n WHERE { GRAPH <$g2> { ex:b ex:name ?n } }")
    assert(other.count() == 0L, "b has no name in graph2")
  }

  test("GRAPH ?g enumerates named graphs and binds the variable") {
    val got = run("SELECT ?g ?n WHERE { GRAPH ?g { ex:a ex:name ?n } }")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set((g1, "G1A"), (g2, "G2A")),
      "named graphs only — the default triple must not leak in")
    // SELECT * expansion includes the graph variable (boundVars)
    val star = run("SELECT * WHERE { GRAPH ?g { ex:a ex:name ?n } }")
    assert(star.columns.toSet == Set("g", "n"))
    assert(star.count() == 2L)
  }

  test("shared graph variable enforces same-graph co-location") {
    // a knows b only in graph1, and b's name exists only in graph1: the
    // conjunction inside one GRAPH ?g must stay within a single graph
    val got = run(
      """SELECT ?g ?n WHERE {
        |  GRAPH ?g { ex:a ex:knows ?x . ?x ex:name ?n }
        |}""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set((g1, "G1B")))
  }

  test("GRAPH composes with default-graph patterns outside it") {
    val got = run(
      """SELECT ?dn ?g ?gn WHERE {
        |  ex:a ex:name ?dn .
        |  GRAPH ?g { ex:a ex:name ?gn }
        |} ORDER BY ?g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("DefaultA", g1, "G1A"), ("DefaultA", g2, "G2A")))
  }

  test("variable predicates and NPS work inside GRAPH") {
    val vp = run(s"SELECT ?p ?o WHERE { GRAPH <$g1> { ex:a ?p ?o } }")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(vp == Set((s"${ex}name", "G1A"), (s"${ex}knows", s"${ex}b")))
    val nps = run(s"SELECT ?o WHERE { GRAPH <$g1> { ex:a !(ex:name) ?o } }")
      .collect().map(_.getString(0)).toSeq
    assert(nps == Seq(s"${ex}b"))
    // default-context NPS must NOT see named-graph triples
    val npsDefault = run("SELECT ?o WHERE { ex:a !(ex:nothing) ?o }")
      .collect().map(_.getString(0)).toSeq
    assert(npsDefault == Seq("DefaultA"))
  }

  test("property paths run inside GRAPH against that graph only") {
    val got = run(s"SELECT ?x WHERE { GRAPH <$g1> { ex:a ex:knows+ ?x } }")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(s"${ex}b"))
    val empty = run(s"SELECT ?x WHERE { GRAPH <$g2> { ex:a ex:knows+ ?x } }")
    assert(empty.count() == 0L)
  }

  test("FROM replaces the default graph with the merge of named graphs") {
    // single FROM: only graph1's triples are the default graph now — the
    // store's untagged triple disappears
    val one = run(s"SELECT ?n FROM <$g1> WHERE { ex:a ex:name ?n }")
      .collect().map(_.getString(0)).toSeq
    assert(one == Seq("G1A"))
    // two FROM graphs merge (set union): both names, bag-correct
    val two = run(s"SELECT ?n FROM <$g1> FROM <$g2> WHERE { ex:a ex:name ?n }")
      .collect().map(_.getString(0)).toSet
    assert(two == Set("G1A", "G2A"))
    // merge dedups a triple present in BOTH graphs
    val dupQuads = TriplesGraph.fromQuads(spark, Seq(
      quad("x", "name", Lit("Same", Xsd.string), Some(g1)),
      quad("x", "name", Lit("Same", Xsd.string), Some(g2))))
    val merged = new SparqlExecutor(dupQuads).execute(
      s"PREFIX ex:<$ex>\nSELECT ?n FROM <$g1> FROM <$g2> WHERE { ex:x ex:name ?n }")
      .collect().map(_.getString(0)).toSeq
    assert(merged == Seq("Same"), s"merge must be a set union, got $merged")
  }

  test("FROM NAMED restricts what GRAPH ranges over") {
    val got = run(
      s"SELECT ?g ?n FROM NAMED <$g1> WHERE { GRAPH ?g { ex:a ex:name ?n } }")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set((g1, "G1A")), "graph2 must be outside the dataset")
    // a constant GRAPH outside FROM NAMED matches nothing
    val outside = run(
      s"SELECT ?n FROM NAMED <$g1> WHERE { GRAPH <$g2> { ex:a ex:name ?n } }")
    assert(outside.count() == 0L)
    // FROM NAMED without FROM leaves the default graph EMPTY (§13.2)
    val noDefault = run(
      s"SELECT ?n FROM NAMED <$g1> WHERE { ex:a ex:name ?n }")
    assert(noDefault.count() == 0L)
  }

  test("closures under GRAPH ?g stay per-graph: paths never cross graphs") {
    // g1: a→b→c ; g2: c→d. A graph-blind fixpoint would derive a→d by
    // crossing from g1 into g2 — the per-graph closure must not.
    val chains = TriplesGraph.fromQuads(spark, Seq(
      quad("a", "knows", Iri(s"${ex}b"), Some(g1)),
      quad("b", "knows", Iri(s"${ex}c"), Some(g1)),
      quad("c", "knows", Iri(s"${ex}d"), Some(g2))))
    def runc(q: String) =
      new SparqlExecutor(chains).execute(s"PREFIX ex:<$ex>\n" + q)
        .collect().map(r => (0 until r.length).map(i =>
          r.getString(i).stripPrefix(ex)).mkString(",")).toSet
    assert(runc("SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x ex:knows+ ?y } }") ==
      Set("graph1,a,b", "graph1,a,c", "graph1,b,c", "graph2,c,d"))
    // zero-or-more: identity per named graph (c is in both graphs)
    assert(runc("SELECT ?g ?y WHERE { GRAPH ?g { ex:c ex:knows* ?y } }") ==
      Set("graph1,c", "graph2,c", "graph2,d"))
  }

  test("GRAPH variable reused inside the pattern keeps the equality") {
    // the graph IRI is also the subject: only graphs containing a triple
    // about THEMSELVES match — dropping the constraint would return every
    // named triple (r6 ADVICE)
    val selfg = TriplesGraph.fromQuads(spark, Seq(
      (Iri(g1): Term, s"${ex}label", Lit("self", Xsd.string), Some(g1)),
      (Iri(g1): Term, s"${ex}label", Lit("crossed", Xsd.string), Some(g2)),
      quad("a", "label", Lit("other", Xsd.string), Some(g1))))
    val got = new SparqlExecutor(selfg)
      .execute(s"PREFIX ex:<$ex>\nSELECT ?g ?v WHERE { GRAPH ?g { ?g ex:label ?v } }")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set((g1, "self")),
      "graph var bound in the triple must constrain g equality")
    // object position: GRAPH ?g { ?s ex:ref ?g } — only in-graph self-refs
    val refg = TriplesGraph.fromQuads(spark, Seq(
      quad("a", "ref", Iri(g1), Some(g1)),
      quad("b", "ref", Iri(g2), Some(g1))))
    val got2 = new SparqlExecutor(refg)
      .execute(s"PREFIX ex:<$ex>\nSELECT ?s WHERE { GRAPH ?g { ?s ex:ref ?g } }")
      .collect().map(_.getString(0).stripPrefix(ex)).toSet
    assert(got2 == Set("a"))
    // variable predicate equal to the graph var
    val predg = TriplesGraph.fromQuads(spark, Seq(
      (Iri(s"${ex}x"): Term, g1, Lit("hit", Xsd.string), Some(g1)),
      (Iri(s"${ex}y"): Term, g1, Lit("miss", Xsd.string), Some(g2))))
    val got3 = new SparqlExecutor(predg)
      .execute(s"SELECT ?v WHERE { GRAPH ?g { ?s ?g ?v } }")
      .collect().map(_.getString(0)).toSet
    assert(got3 == Set("hit"))
  }

  test("default-graph zero-length paths exclude named-graph-only nodes") {
    // d occurs ONLY in graph1; the default graph holds a→b. A default-graph
    // `knows?`/`knows*` identity must not self-match d (r6 ADVICE: the
    // identity base was the graph-blind node set).
    val mixed = TriplesGraph.fromQuads(spark, Seq(
      quad("a", "knows", Iri(s"${ex}b"), None),
      quad("d", "knows", Iri(s"${ex}e"), Some(g1))))
    def runm(q: String) =
      new SparqlExecutor(mixed).execute(s"PREFIX ex:<$ex>\n" + q)
        .collect().map(r => (0 until r.length).map(i =>
          r.getString(i).stripPrefix(ex)).mkString(",")).toSet
    assert(runm("SELECT ?x ?y WHERE { ?x ex:knows? ?y }") ==
      Set("a,a", "b,b", "a,b"),
      "d and e live only in graph1 — no default-graph self-match")
    assert(runm("SELECT ?y WHERE { ex:d ex:knows* ?y }") == Set.empty[String],
      "anchored zero-or-more on a named-graph-only node yields nothing")
  }
}
