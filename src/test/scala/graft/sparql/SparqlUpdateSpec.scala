package graft.sparql

import graft.SparkTestBase
import graft.exec.{SparqlExecutor, SparqlUpdate}
import graft.graph.TriplesGraph
import graft.rdf.{Iri, Lit, Term, Xsd}

/** SPARQL 1.1 Update — beyond both engines (the reference is read-only).
  * Updates are functional: each op maps the graph to a new one; the
  * original graph object must stay intact (immutability is the Spark
  * contract, not an implementation detail). */
class SparqlUpdateSpec extends SparkTestBase {

  private val ex = "http://example.net/ns#"
  private val g1 = s"${ex}graph1"

  private def t(s: String, p: String, o: Term) = (Iri(ex + s): Term, ex + p, o)

  private def base: TriplesGraph = TriplesGraph.fromTerms(spark, Seq(
    t("a", "name", Lit("Alice", Xsd.string)),
    t("b", "name", Lit("Bob", Xsd.string)),
    t("a", "age", Lit("30", Xsd.integer)),
    t("b", "age", Lit("40", Xsd.integer)),
    t("a", "knows", Iri(s"${ex}b"))))

  private def names(g: TriplesGraph): Seq[String] =
    new SparqlExecutor(g)
      .execute(s"PREFIX ex:<$ex> SELECT ?n WHERE { ?s ex:name ?n } ORDER BY ?n")
      .collect().map(_.getString(0)).toSeq

  private def upd(g: TriplesGraph, s: String): TriplesGraph =
    SparqlUpdate.execute(g, s"PREFIX ex:<$ex>\n" + s)

  test("INSERT DATA adds triples; original graph untouched") {
    val g0 = base
    val g2 = upd(g0, """INSERT DATA { ex:c ex:name "Cara" . ex:c ex:age 25 }""")
    assert(names(g2) == Seq("Alice", "Bob", "Cara"))
    assert(names(g0) == Seq("Alice", "Bob"))
    // typed insert landed in the long-kind slice, not a string overflow
    val ages = new SparqlExecutor(g2)
      .execute(s"PREFIX ex:<$ex> SELECT ?a WHERE { ex:c ex:age ?a }")
      .collect().map(_.getLong(0)).toSeq
    assert(ages == Seq(25L))
  }

  test("INSERT DATA is set-semantic: re-inserting an existing triple is a no-op") {
    val g2 = upd(base, """INSERT DATA { ex:a ex:name "Alice" }""")
    assert(names(g2) == Seq("Alice", "Bob"))
  }

  test("DELETE DATA removes exactly the matching typed triple") {
    val g2 = upd(base, """DELETE DATA { ex:a ex:age 30 . ex:zz ex:age 99 }""")
    val left = new SparqlExecutor(g2)
      .execute(s"PREFIX ex:<$ex> SELECT ?s ?a WHERE { ?s ex:age ?a } ORDER BY ?a")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(left == Seq((s"${ex}b", 40L)))
  }

  test("DELETE WHERE removes all pattern matches") {
    val g2 = upd(base, "DELETE WHERE { ?s ex:name ?n }")
    assert(names(g2).isEmpty)
    // other predicates untouched
    assert(!new SparqlExecutor(g2)
      .execute(s"PREFIX ex:<$ex> SELECT ?a WHERE { ex:a ex:age ?a }").isEmpty)
  }

  test("DELETE/INSERT WHERE rewrites derived values, one WHERE evaluation") {
    val g2 = upd(base,
      """DELETE { ?s ex:name ?n }
        |INSERT { ?s ex:name ?u }
        |WHERE { ?s ex:name ?n . BIND(UCASE(?n) AS ?u) }""".stripMargin)
    assert(names(g2) == Seq("ALICE", "BOB"))
  }

  test("INSERT WHERE derives new triples from joins") {
    val g2 = upd(base,
      """INSERT { ?x ex:knowsName ?n }
        |WHERE { ?x ex:knows ?y . ?y ex:name ?n }""".stripMargin)
    val got = new SparqlExecutor(g2)
      .execute(s"PREFIX ex:<$ex> SELECT ?n WHERE { ex:a ex:knowsName ?n }")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Bob"))
  }

  test("untouched predicates keep their slice object (surgical delta)") {
    val g0 = base
    val g2 = upd(g0, """DELETE DATA { ex:a ex:age 30 }""")
    assert(g2.slices("http://example.net/ns#knows").df eq
      g0.slices("http://example.net/ns#knows").df)
    assert(g2.slices("http://example.net/ns#name").df eq
      g0.slices("http://example.net/ns#name").df)
  }

  test("insert of an uncastable lexical into a typed slice fails loudly") {
    val e = intercept[IllegalArgumentException] {
      upd(base, """INSERT DATA { ex:c ex:age "not-a-number" }""")
    }
    assert(e.getMessage.contains("does not cast"))
  }

  test("GRAPH blocks in DATA ops + CLEAR GRAPH") {
    val g2 = upd(base,
      s"""INSERT DATA { GRAPH <$g1> { ex:a ex:name "G1Alice" } }""")
    // default graph unchanged
    assert(names(g2) == Seq("Alice", "Bob"))
    val inG1 = new SparqlExecutor(g2).execute(
      s"PREFIX ex:<$ex> SELECT ?n WHERE { GRAPH <$g1> { ex:a ex:name ?n } }")
      .collect().map(_.getString(0)).toSeq
    assert(inG1 == Seq("G1Alice"))
    val g3 = upd(g2, s"CLEAR GRAPH <$g1>")
    assert(new SparqlExecutor(g3).execute(
      s"PREFIX ex:<$ex> SELECT ?n WHERE { GRAPH <$g1> { ?s ex:name ?n } }")
      .isEmpty)
    assert(names(g3) == Seq("Alice", "Bob"))
  }

  // ---- ADD / COPY / MOVE / CREATE (§3.2.1, §3.2.3–3.2.5) ----

  private val g2iri = s"${ex}graph2"

  private def graphNames(g: TriplesGraph, iri: String): Seq[String] =
    new SparqlExecutor(g).execute(
      s"PREFIX ex:<$ex> SELECT ?n WHERE { GRAPH <$iri> { ?s ex:name ?n } } ORDER BY ?n")
      .collect().map(_.getString(0)).toSeq

  test("ADD copies default into a named graph, set-semantic, src kept") {
    val g0 = upd(base,
      s"""INSERT DATA { GRAPH <$g1> { ex:z ex:name "Zoe" . ex:a ex:name "Alice" } }""")
    val g = upd(g0, s"ADD DEFAULT TO GRAPH <$g1>")
    assert(names(g) == Seq("Alice", "Bob")) // source intact
    // "Alice" was already in g1: set union, no duplicate row
    assert(graphNames(g, g1) == Seq("Alice", "Bob", "Zoe"))
    val aliceRows = new SparqlExecutor(g).execute(
      s"""PREFIX ex:<$ex> SELECT ?s WHERE { GRAPH <$g1> { ?s ex:name "Alice" } }""")
      .collect()
    assert(aliceRows.length == 1)
  }

  test("COPY replaces the destination graph entirely") {
    val g0 = upd(base,
      s"""INSERT DATA { GRAPH <$g1> { ex:z ex:name "Zoe" . ex:z ex:age 9 } }""")
    val g = upd(g0, s"COPY DEFAULT TO <$g1>")
    assert(graphNames(g, g1) == Seq("Alice", "Bob")) // Zoe gone
    assert(new SparqlExecutor(g).execute(
      s"PREFIX ex:<$ex> SELECT ?a WHERE { GRAPH <$g1> { ?s ex:age ?a } } ORDER BY ?a")
      .collect().map(_.getLong(0)).toSeq == Seq(30L, 40L))
    assert(names(g) == Seq("Alice", "Bob")) // source intact
  }

  test("MOVE between named graphs drops the source") {
    val g0 = upd(base,
      s"""INSERT DATA { GRAPH <$g1> { ex:z ex:name "Zoe" } .
         |  GRAPH <$g2iri> { ex:q ex:name "Quinn" } }""".stripMargin)
    val g = upd(g0, s"MOVE GRAPH <$g1> TO GRAPH <$g2iri>")
    assert(graphNames(g, g1).isEmpty)
    assert(graphNames(g, g2iri) == Seq("Zoe")) // Quinn replaced
    assert(names(g) == Seq("Alice", "Bob"))    // default untouched
  }

  test("MOVE a named graph to DEFAULT replaces the default graph") {
    val g0 = upd(base,
      s"""INSERT DATA { GRAPH <$g1> { ex:z ex:name "Zoe" } }""")
    val g = upd(g0, s"MOVE <$g1> TO DEFAULT")
    assert(names(g) == Seq("Zoe"))
    assert(graphNames(g, g1).isEmpty)
    // non-name default triples are gone too (COPY-then-drop semantics)
    assert(new SparqlExecutor(g).execute(
      s"PREFIX ex:<$ex> SELECT ?a WHERE { ?s ex:age ?a }").isEmpty)
  }

  test("ADD/COPY/MOVE with src = dst are no-ops; CREATE GRAPH accepted") {
    val g0 = upd(base,
      s"""INSERT DATA { GRAPH <$g1> { ex:z ex:name "Zoe" } }""")
    for (op <- Seq(s"ADD <$g1> TO <$g1>", s"COPY DEFAULT TO DEFAULT",
        s"MOVE <$g1> TO GRAPH <$g1>", s"CREATE GRAPH <${ex}fresh>",
        s"CREATE SILENT GRAPH <$g1>")) {
      val g = upd(g0, op)
      assert(names(g) == Seq("Alice", "Bob"), s"op: $op")
      assert(graphNames(g, g1) == Seq("Zoe"), s"op: $op")
    }
  }

  test("USING matches the WHERE against a named graph; templates hit default") {
    val g0 = upd(base,
      s"""INSERT DATA { GRAPH <$g1> { ex:a ex:flag "y" } }""")
    // WHERE matches in g1 (USING makes it the WHERE's default graph);
    // the DELETE template still targets the real default graph
    val g = upd(g0,
      s"""DELETE { ?s ex:name ?n }
         |USING <$g1>
         |WHERE { ?s ex:flag "y" . ?s ex:name ?n }""".stripMargin)
    // the WHERE can only bind ?n if ex:name is visible THROUGH the USING
    // dataset — it is not (names live in the default graph), so nothing
    // matches and nothing is deleted
    assert(names(g) == Seq("Alice", "Bob"))
    // now put the name into g1 as well: the join completes inside g1 and
    // the default-graph row for Alice is deleted
    val g2b = upd(g0,
      s"""INSERT DATA { GRAPH <$g1> { ex:a ex:name "Alice" } }""")
    val g3 = upd(g2b,
      s"""DELETE { ?s ex:name ?n }
         |USING <$g1>
         |WHERE { ?s ex:flag "y" . ?s ex:name ?n }""".stripMargin)
    assert(names(g3) == Seq("Bob"))
    // g1's own copy of the name is untouched (template had no GRAPH block)
    assert(graphNames(g3, g1) == Seq("Alice"))
  }

  test("USING NAMED scopes GRAPH ?g in the WHERE; USING overrides WITH") {
    val g0 = upd(base,
      s"""INSERT DATA { GRAPH <$g1> { ex:a ex:tag "t1" } .
         |  GRAPH <$g2iri> { ex:b ex:tag "t2" } }""".stripMargin)
    // GRAPH ?g ranges over USING NAMED graphs only → only g1's tag matches
    val g = upd(g0,
      s"""DELETE { ?s ex:name ?n }
         |USING NAMED <$g1>
         |WHERE { GRAPH ?g { ?s ex:tag ?t } . ?s ex:name ?n }""".stripMargin)
    // ?s ex:name ?n matches the USING default graph — with only USING
    // NAMED present the default is EMPTY, so nothing joins, nothing deleted
    assert(names(g) == Seq("Alice", "Bob"))
    // WITH is overridden by USING for the WHERE: WITH g2 would scope the
    // WHERE to g2 (no ex:flag there), but USING g1 wins and the templates
    // still go to WITH's graph
    val g2b = upd(g0,
      s"""INSERT DATA { GRAPH <$g1> { ex:a ex:name "Alice" . ex:a ex:flag "y" } .
         |  GRAPH <$g2iri> { ex:a ex:name "Alice" } }""".stripMargin)
    val g3 = upd(g2b,
      s"""WITH <$g2iri>
         |DELETE { ?s ex:name ?n }
         |USING <$g1>
         |WHERE { ?s ex:flag "y" . ?s ex:name ?n }""".stripMargin)
    assert(graphNames(g3, g2iri).isEmpty, "template must hit WITH's graph")
    assert(graphNames(g3, g1) == Seq("Alice"), "USING graph is read-only here")
    assert(names(g3) == Seq("Alice", "Bob"), "default graph untouched")
  }

  test("WITH routes templates and WHERE to the named graph") {
    val g2 = upd(base,
      s"""INSERT DATA { GRAPH <$g1> { ex:a ex:name "G1Alice" } }""")
    val g3 = upd(g2,
      s"""WITH <$g1> DELETE { ?s ex:name ?n } INSERT { ?s ex:name "Renamed" }
         |WHERE { ?s ex:name ?n }""".stripMargin)
    // default-graph names untouched (WITH scoped the WHERE to g1)
    assert(names(g3) == Seq("Alice", "Bob"))
    val inG1 = new SparqlExecutor(g3).execute(
      s"PREFIX ex:<$ex> SELECT ?n WHERE { GRAPH <$g1> { ?s ex:name ?n } }")
      .collect().map(_.getString(0)).toSeq
    assert(inG1 == Seq("Renamed"))
  }

  test("sequenced ops: the second sees the first's effects") {
    val g2 = upd(base,
      """INSERT DATA { ex:c ex:name "Cara" } ;
        |DELETE WHERE { ?s ex:name "Alice" }""".stripMargin)
    assert(names(g2) == Seq("Bob", "Cara"))
  }

  test("INSERT of a new predicate creates a string-kind slice") {
    val g2 = upd(base, """INSERT DATA { ex:a ex:nickname "Al" }""")
    val got = new SparqlExecutor(g2)
      .execute(s"PREFIX ex:<$ex> SELECT ?n WHERE { ex:a ex:nickname ?n }")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Al"))
  }

  test("blank nodes rejected in DELETE templates, minted in INSERT templates") {
    intercept[IllegalArgumentException] {
      upd(base, "DELETE { ?s ex:name _:b } WHERE { ?s ex:name ?n }")
    }
    val g2 = upd(base,
      """INSERT { ?s ex:addr _:a . _:a ex:city "Oslo" }
        |WHERE { ?s ex:name "Alice" }""".stripMargin)
    val got = new SparqlExecutor(g2).execute(
      s"""PREFIX ex:<$ex>
         |SELECT ?c WHERE { ex:a ex:addr ?b . ?b ex:city ?c }""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Oslo"))
  }

  test("CLEAR DEFAULT / NAMED / ALL") {
    val g2 = upd(base,
      s"""INSERT DATA { GRAPH <$g1> { ex:a ex:name "G1Alice" } }""")
    val noDefault = upd(g2, "CLEAR DEFAULT")
    assert(names(noDefault).isEmpty)
    assert(!new SparqlExecutor(noDefault).execute(
      s"PREFIX ex:<$ex> SELECT ?n WHERE { GRAPH <$g1> { ?s ex:name ?n } }")
      .isEmpty)
    val noNamed = upd(g2, "CLEAR NAMED")
    assert(names(noNamed) == Seq("Alice", "Bob"))
    assert(new SparqlExecutor(noNamed).execute(
      s"PREFIX ex:<$ex> SELECT ?n WHERE { GRAPH <$g1> { ?s ex:name ?n } }")
      .isEmpty)
    val empty = upd(g2, "CLEAR ALL")
    assert(empty.slices.isEmpty)
  }

  test("lang-tagged literals round-trip and delete precisely") {
    val g0 = TriplesGraph.fromTerms(spark, Seq(
      t("a", "label", Lit("colour", Xsd.langString, Some("en"))),
      t("a", "label", Lit("farge", Xsd.langString, Some("no")))))
    val g2 = upd(g0, """DELETE DATA { ex:a ex:label "farge"@no }""")
    val left = new SparqlExecutor(g2)
      .execute(s"PREFIX ex:<$ex> SELECT ?l WHERE { ex:a ex:label ?l }")
      .collect().map(_.getString(0)).toSeq
    assert(left == Seq("colour"))
  }

  test("lang-tagged delete matches nothing on a lang-free slice") {
    // "x"@en and "x" are distinct RDF terms: deleting the tagged one must
    // not remove the plain literal from a slice that carries no lang column
    val g2 = upd(base, """DELETE DATA { ex:a ex:name "Alice"@en }""")
    assert(names(g2) == Seq("Alice", "Bob"))
  }

  test("DELETE WHERE with a bound object variable removes lang-tagged rows") {
    val g0 = TriplesGraph.fromTerms(spark, Seq(
      t("a", "label", Lit("colour", Xsd.langString, Some("en"))),
      t("a", "label", Lit("farge", Xsd.langString, Some("no"))),
      t("b", "label", Lit("plain", Xsd.string))))
    val g2 = upd(g0,
      """DELETE { ?s ex:label ?l } WHERE { ?s ex:label ?l . FILTER(LANG(?l) = "no") }""")
    val left = new SparqlExecutor(g2)
      .execute(s"PREFIX ex:<$ex> SELECT ?l WHERE { ?s ex:label ?l } ORDER BY ?l")
      .collect().map(_.getString(0)).toSeq
    assert(left == Seq("colour", "plain"))
  }

  test("INSERT WHERE of a bound lang literal keeps its language tag") {
    val g0 = TriplesGraph.fromTerms(spark, Seq(
      t("a", "label", Lit("colour", Xsd.langString, Some("en")))))
    val g2 = upd(g0,
      """INSERT { ?s ex:alias ?l } WHERE { ?s ex:label ?l }""")
    val tags = new SparqlExecutor(g2)
      .execute(s"PREFIX ex:<$ex> SELECT ?t WHERE { ?s ex:alias ?l . BIND(LANG(?l) AS ?t) }")
      .collect().map(_.getString(0)).toSeq
    assert(tags == Seq("en"))
  }

  test("blank nodes are rejected in DELETE DATA but allowed in INSERT DATA") {
    val e = intercept[IllegalArgumentException] {
      upd(base, """DELETE DATA { _:b ex:name "Alice" }""")
    }
    assert(e.getMessage.contains("DELETE DATA"))
    // INSERT DATA keeps the skolem-label allowance
    val g2 = upd(base, """INSERT DATA { _:b ex:name "Cara" }""")
    assert(names(g2) == Seq("Alice", "Bob", "Cara"))
  }
}
