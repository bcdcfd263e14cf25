package graft.sparql

import graft.SparkTestBase
import graft.exec.SparqlExecutor
import graft.graph.TriplesGraph
import graft.rdf.{Iri, Lit, Term, Xsd}

/** Unit coverage for the expression-layer corners not exercised by the
  * golden or catalog suites: language tags, REGEX flags, the otit nanos
  * conversions, nestAggregation, SAMPLE, NOT IN, REDUCED, negation. */
class ExprSpec extends SparkTestBase {

  private val ex = "http://example.org/ns#"
  private def iri(s: String) = Iri(ex + s)

  private lazy val graph = TriplesGraph.fromTerms(spark, Seq[(Term, String, Term)](
    (iri("a"), s"${ex}label", Lit("Hello", Xsd.langString, Some("en"))),
    (iri("b"), s"${ex}label", Lit("Hallo", Xsd.langString, Some("de"))),
    (iri("c"), s"${ex}label", Lit("plain", Xsd.string)),
    (iri("a"), s"${ex}num", Lit("1", Xsd.integer)),
    (iri("b"), s"${ex}num", Lit("2", Xsd.integer)),
    (iri("c"), s"${ex}num", Lit("3", Xsd.integer)),
    (iri("a"), s"${ex}when", Lit("2022-06-01T08:00:00", Xsd.dateTime)),
    (iri("a"), s"${ex}group", iri("g1")),
    (iri("b"), s"${ex}group", iri("g1")),
    (iri("c"), s"${ex}group", iri("g2"))))

  private def run(q: String) =
    new SparqlExecutor(graph).execute(s"PREFIX ex:<$ex>\nPREFIX otit_swt:<${graft.rdf.Otit.ns}>\n" + q)

  test("LANG over language-tagged and plain literals") {
    val got = run(
      """SELECT ?s ?l WHERE { ?s ex:label ?v . BIND(LANG(?v) AS ?l) } ORDER BY ?s""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set((s"${ex}a", "en"), (s"${ex}b", "de"), (s"${ex}c", "")))
  }

  test("REGEX with case-insensitive flag") {
    val got = run(
      """SELECT ?s WHERE { ?s ex:label ?v . FILTER(REGEX(?v, "^h", "i")) } ORDER BY ?s""")
      .collect().map(_.getString(0)).toSet
    assert(got == Set(s"${ex}a", s"${ex}b"))
  }

  test("DateTimeAsNanos / NanosAsDateTime round-trip") {
    val rows = run(
      """SELECT ?n ?t2 WHERE {
        |  ?s ex:when ?t .
        |  BIND(otit_swt:DateTimeAsNanos(?t) AS ?n)
        |  BIND(otit_swt:NanosAsDateTime(?n) AS ?t2)
        |}""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 1654070400L * 1000000000L)
    assert(rows(0).getTimestamp(1).toInstant.getEpochSecond == 1654070400L)
  }

  test("nestAggregation collects group values; SAMPLE picks one") {
    val got = run(
      s"""SELECT ?g (otit_swt:nestAggregation(?n) AS ?ns) (SAMPLE(?n) AS ?one) WHERE {
         |  ?s ex:group ?g . ?s ex:num ?n .
         |} GROUP BY ?g ORDER BY ?g""".stripMargin).collect()
    assert(got.length == 2)
    assert(got(0).getSeq[Long](1) == Seq(1L, 2L))
    assert(Seq(1L, 2L).contains(got(0).getLong(2)))
    assert(got(1).getSeq[Long](1) == Seq(3L))
  }

  test("NOT IN and REDUCED") {
    val got = run(
      """SELECT REDUCED ?g WHERE {
        |  ?s ex:group ?g . ?s ex:num ?n . FILTER(?n NOT IN (3))
        |} ORDER BY ?g""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(got == Seq(s"${ex}g1"))
  }

  test("unary minus and != comparison") {
    val got = run(
      """SELECT ?s WHERE { ?s ex:num ?n . FILTER(-?n != -2) } ORDER BY ?s""")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(s"${ex}a", s"${ex}c"))
  }
}
