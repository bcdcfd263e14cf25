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
}
