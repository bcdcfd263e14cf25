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

  test("same var in subject and object over an absent predicate is empty, not ambiguous") {
    // regression: EnginePropertySpec found `?a <absent> ?a` crashing with
    // AMBIGUOUS_REFERENCE (emptyScanSol built a two-`a` schema)
    val got = run("""SELECT ?a WHERE { ?a ex:absentPredicate ?a }""").collect()
    assert(got.isEmpty)
    val selfMatch = run("""SELECT ?a WHERE { ?a ex:group ?a }""").collect()
    assert(selfMatch.isEmpty) // no node is its own group
  }

  test("DATATYPE over typed, plain and lang-tagged literals") {
    val got = run(
      """SELECT ?s ?dt WHERE { ?s ex:num ?n . BIND(DATATYPE(?n) AS ?dt) } ORDER BY ?s""")
      .collect().map(_.getString(1)).toSet
    assert(got == Set(Xsd.integer))
    val lang = run(
      """SELECT ?s ?dt WHERE { ?s ex:label ?v . BIND(DATATYPE(?v) AS ?dt) } ORDER BY ?s""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(lang == Set(
      (s"${ex}a", Xsd.langString), (s"${ex}b", Xsd.langString),
      (s"${ex}c", Xsd.string)))
  }

  test("LANGMATCHES basic filtering incl. wildcard and subtag prefix") {
    val got = run(
      """SELECT ?s WHERE { ?s ex:label ?v . FILTER(LANGMATCHES(LANG(?v), "en")) }""")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(s"${ex}a"))
    val any = run(
      """SELECT ?s WHERE { ?s ex:label ?v . FILTER(LANGMATCHES(LANG(?v), "*")) } ORDER BY ?s""")
      .collect().map(_.getString(0)).toSeq
    assert(any == Seq(s"${ex}a", s"${ex}b")) // plain literal has no tag
    // range is a prefix of the full tag: "de" matches "de-AT"-style tags
    val prefix = run(
      """SELECT ?m WHERE { ?s ex:label ?v . BIND(LANGMATCHES("de-at", "DE") AS ?m) FILTER(?m) }""")
      .collect()
    assert(prefix.length == 3) // constant true per row
  }

  test("IRI() and STRDT construct terms") {
    val got = run(
      s"""PREFIX xsd:<${Xsd.ns}>
         |SELECT ?i ?n WHERE {
         |  ?s ex:num ?x . FILTER(?x = 1)
         |  BIND(IRI(CONCAT("$ex", "minted")) AS ?i)
         |  BIND(STRDT("42", xsd:integer) AS ?n)
         |}""".stripMargin)
      .collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == s"${ex}minted")
    assert(got(0).getLong(1) == 42L)
  }

  test("BNODE() mints per-row ids; BNODE(str) is stable per lexical") {
    val rows = run(
      """SELECT ?f ?s1 ?s2 WHERE {
        |  ?x ex:num ?n .
        |  BIND(BNODE() AS ?f)
        |  BIND(BNODE("k") AS ?s1)
        |  BIND(BNODE(STR(?n)) AS ?s2)
        |}""".stripMargin).collect()
    assert(rows.length == 3)
    val fresh = rows.map(_.getString(0))
    assert(fresh.distinct.length == 3 && fresh.forall(_.startsWith("_:")))
    assert(rows.map(_.getString(1)).distinct.length == 1) // same lexical -> same id
    assert(rows.map(_.getString(2)).distinct.length == 3) // distinct lexicals
  }

  test("STRBEFORE / STRAFTER incl. empty and absent separators") {
    val rows = run(
      """SELECT ?b ?af ?b0 ?a0 ?miss WHERE {
        |  ex:a ex:num ?n .
        |  BIND(STRBEFORE("abc", "b") AS ?b)
        |  BIND(STRAFTER("abc", "b") AS ?af)
        |  BIND(STRBEFORE("abc", "") AS ?b0)
        |  BIND(STRAFTER("abc", "") AS ?a0)
        |  BIND(STRAFTER("abc", "z") AS ?miss)
        |}""".stripMargin).collect()
    val r = rows.head
    assert((r.getString(0), r.getString(1), r.getString(2), r.getString(3),
      r.getString(4)) == (("a", "c", "", "abc", "")))
  }

  test("STRBEFORE/STRAFTER match the spec model on seeded random inputs") {
    val rnd = new scala.util.Random(4)
    def word(max: Int) = (1 to rnd.nextInt(max + 1)).map(_ =>
      ('a' + rnd.nextInt(4)).toChar).mkString // tiny alphabet → real overlaps
    val pairs = (1 to 80).map { _ =>
      val a = word(6)
      val b = if (rnd.nextBoolean() && a.nonEmpty) {
        val st = rnd.nextInt(a.length)
        a.substring(st, st + 1 + rnd.nextInt(a.length - st))
      } else word(2)
      (a, b)
    }.distinct
    val values = pairs.map { case (x, y) => s"""("$x" "$y")""" }.mkString(" ")
    val rows = run(
      s"""SELECT ?a ?b ?pre ?post WHERE {
         |  VALUES (?a ?b) { $values }
         |  BIND(STRBEFORE(?a, ?b) AS ?pre)
         |  BIND(STRAFTER(?a, ?b) AS ?post)
         |}""".stripMargin).collect()
    assert(rows.length == pairs.length)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val i = a.indexOf(b)
      val expPre = if (b.isEmpty) "" else if (i >= 0) a.substring(0, i) else ""
      val expPost = if (b.isEmpty) a else if (i >= 0) a.substring(i + b.length) else ""
      assert(r.getString(2) == expPre, s"STRBEFORE($a, $b)")
      assert(r.getString(3) == expPost, s"STRAFTER($a, $b)")
    }
  }

  test("ENCODE_FOR_URI and hash functions") {
    val r = run(
      """SELECT ?e ?m ?s WHERE {
        |  ex:a ex:num ?n .
        |  BIND(ENCODE_FOR_URI("Los Angeles") AS ?e)
        |  BIND(MD5("abc") AS ?m)
        |  BIND(SHA256("abc") AS ?s)
        |}""".stripMargin).collect().head
    assert(r.getString(0) == "Los%20Angeles")
    assert(r.getString(1) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getString(2) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("STRLANG binds a language-tagged literal LANG() can read") {
    val got = run(
      """SELECT ?v ?l WHERE {
        |  ex:a ex:num ?n .
        |  BIND(STRLANG("chat", "en") AS ?v)
        |  BIND(LANG(?v) AS ?l)
        |}""".stripMargin).collect().head
    assert(got.getString(0) == "chat" && got.getString(1) == "en")
  }

  test("isIRI / isBlank / isLiteral over the canonical term forms") {
    val r = run(
      """SELECT ?ii ?il ?ib ?ln WHERE {
        |  ex:a ex:group ?g . ex:a ex:num ?n .
        |  BIND(isIRI(?g) AS ?ii)
        |  BIND(isLiteral(?g) AS ?il)
        |  BIND(isBlank(BNODE("x")) AS ?ib)
        |  BIND(isLiteral(?n) AS ?ln)
        |}""".stripMargin).collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
  }

  test("UUID / STRUUID / NOW / RAND are well-formed and row-scoped") {
    val rows = run(
      """SELECT ?u ?su ?now ?rnd WHERE {
        |  ?x ex:num ?n .
        |  BIND(UUID() AS ?u)
        |  BIND(STRUUID() AS ?su)
        |  BIND(NOW() AS ?now)
        |  BIND(RAND() AS ?rnd)
        |}""".stripMargin).collect()
    assert(rows.length == 3)
    val hex = "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    assert(rows.forall(_.getString(0).matches(s"urn:uuid:$hex")))
    assert(rows.map(_.getString(1)).distinct.length == 3) // fresh per row
    assert(rows.map(_.getTimestamp(2)).distinct.length == 1) // query-constant
    assert(rows.forall { r => val d = r.getDouble(3); d >= 0.0 && d < 1.0 })
  }

  test("VALUES with UNDEF binds null") {
    val rows = run(
      """SELECT ?s ?v WHERE {
        |  VALUES (?s ?v) { (ex:a UNDEF) (ex:b "x") }
        |} ORDER BY ?s""".stripMargin).collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(1) && rows(1).getString(1) == "x")
  }

  test("blank nodes in query syntax rename to variables") {
    // [] in subject position + _:labeled shared across patterns
    val anon = run(
      """SELECT ?n WHERE { [ ex:num ?n ; ex:group ex:g1 ] } ORDER BY ?n""")
      .collect().map(_.getLong(0)).toSeq
    assert(anon == Seq(1L, 2L))
    val labeled = run(
      """SELECT ?n WHERE { _:x ex:num ?n . _:x ex:group ex:g2 . }""")
      .collect().map(_.getLong(0)).toSeq
    assert(labeled == Seq(3L))
  }

  test("negated property sets: forward, set, and inverse members") {
    // everything reachable from ?s by a predicate other than label/num
    val got = run(
      """SELECT ?s ?o WHERE { ?s !(ex:label|ex:num) ?o } ORDER BY ?s""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      (s"${ex}a", s"${ex}g1"), (s"${ex}b", s"${ex}g1"), (s"${ex}c", s"${ex}g2"),
      (s"${ex}a", "2022-06-01 08:00:00")))
    val single = run(
      """SELECT ?o WHERE { ex:c !ex:label ?o }""")
      .collect().map(_.getString(0)).toSet
    assert(single == Set("3", s"${ex}g2"))
    // inverse member: ?x !(^ex:group) ?y == triples y p x with p != group
    val inv = run(
      """SELECT ?x WHERE { ?x !(^ex:num) ex:a }""")
      .collect().map(_.getString(0)).toSet
    assert(inv == Set("Hello", "2022-06-01 08:00:00", s"${ex}g1"))
  }

  test("REPLACE honours the flags argument") {
    val got = run(
      """SELECT ?s ?r WHERE {
        |  ?s ex:label ?v . BIND(REPLACE(?v, "^h", "J", "i") AS ?r)
        |} ORDER BY ?s""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // case-insensitive: both "Hello" and "Hallo" rewrite; without the flag
    // only lowercase h would
    assert(got == Set((s"${ex}a", "Jello"), (s"${ex}b", "Jallo"),
      (s"${ex}c", "plain")))
    val noFlag = run(
      """SELECT ?r WHERE { ex:a ex:label ?v . BIND(REPLACE(?v, "^h", "J") AS ?r) }""")
      .collect().map(_.getString(0)).toSeq
    assert(noFlag == Seq("Hello"))
  }

  test("timezone-offset datetime literals convert to UTC instants") {
    // ex:when = 2022-06-01T08:00:00 (UTC). 09:00:01+01:00 == 08:00:01Z,
    // so `<` matches; a naive zone-stripping parse (09:00:01) would too —
    // the distinguishing case is 09:00:01+02:00 == 07:00:01Z, which only
    // matches under correct offset conversion.
    val lt = run(
      s"""SELECT ?s WHERE {
         |  ?s ex:when ?t . FILTER(?t < "2022-06-01T09:00:01+01:00"^^<${Xsd.dateTime}>)
         |}""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(lt == Seq(s"${ex}a"))
    val gt = run(
      s"""SELECT ?s WHERE {
         |  ?s ex:when ?t . FILTER(?t > "2022-06-01T09:00:01+02:00"^^<${Xsd.dateTime}>)
         |}""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(gt == Seq(s"${ex}a"))
  }

  test("ASK: existence with and without matches") {
    val exec = new SparqlExecutor(graph)
    val pro = s"PREFIX ex:<$ex>\n"
    assert(exec.executeAsk(pro +
      """ASK { ?s ex:num ?n . FILTER(?n > 2) }"""))
    assert(!exec.executeAsk(pro +
      """ASK WHERE { ?s ex:num ?n . FILTER(?n > 99) }"""))
  }

  test("CONSTRUCT: template instantiation, unbound-var drop, set semantics") {
    val exec = new SparqlExecutor(graph)
    val pro = s"PREFIX ex:<$ex>\n"
    val got = exec.executeConstruct(pro +
      """CONSTRUCT {
        |  ?s ex:tag "big" .
        |  ?s ex:ofGroup ?g .
        |} WHERE {
        |  ?s ex:num ?n . FILTER(?n >= 2)
        |  OPTIONAL { ?s ex:group ?g . FILTER(?n = 2) }
        |}""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // b (n=2): both triples; c (n=3): unbound ?g drops the ofGroup triple
    assert(got == Set(
      (s"${ex}b", s"${ex}tag", "big"),
      (s"${ex}c", s"${ex}tag", "big"),
      (s"${ex}b", s"${ex}ofGroup", s"${ex}g1")))
    // variable predicate in the template + dedup across solutions
    val vp = exec.executeConstruct(pro +
      """CONSTRUCT { ex:all ?p ?o } WHERE { ?s ?p ?o . ?s ex:num 1 }""")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(vp == Set((s"${ex}label", "Hello"), (s"${ex}num", "1"),
      (s"${ex}when", "2022-06-01 08:00:00"), (s"${ex}group", s"${ex}g1")))
  }

  test("CONSTRUCT template blank nodes: fresh per solution, shared per label") {
    val exec = new SparqlExecutor(graph)
    val pro = s"PREFIX ex:<$ex>\n"
    // one bnode per solution, shared by both triples of that solution
    val got = exec.executeConstruct(pro +
      """CONSTRUCT { _:m ex:of ?s . _:m ex:n ?n } WHERE { ?s ex:num ?n }""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val byBnode = got.groupBy(_._1)
    // ids look like blank nodes and there is exactly one per solution
    assert(byBnode.keySet.forall(_.startsWith("_:")))
    assert(byBnode.size == 3, s"expected 3 minted bnodes, got ${byBnode.keySet}")
    // each bnode carries exactly its solution's (of, n) pair — structure
    // compare with ids normalized away
    val pairs = byBnode.values.map { ts =>
      (ts.collectFirst { case (_, p, o) if p == s"${ex}of" => o }.get,
        ts.collectFirst { case (_, p, o) if p == s"${ex}n" => o }.get)
    }.toSet
    assert(pairs == Set((s"${ex}a", "1"), (s"${ex}b", "2"), (s"${ex}c", "3")))
    // ids are deterministic across two executions of the same query
    // (content-hash minting, not a nondeterministic counter)
    val again = exec.executeConstruct(pro +
      """CONSTRUCT { _:m ex:of ?s . _:m ex:n ?n } WHERE { ?s ex:num ?n }""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSet == again.toSet)
    // distinct labels in one solution mint distinct nodes; [] works too
    val two = exec.executeConstruct(pro +
      """CONSTRUCT { _:x ex:of ?s . _:y ex:alsoOf ?s } WHERE { ?s ex:num 1 }""")
      .collect().map(_.getString(0)).toSet
    assert(two.size == 2, s"distinct labels must mint distinct nodes: $two")
  }

  test("BNODE() ids are stable across two executions of the same plan") {
    val exec = new SparqlExecutor(graph)
    val pro = s"PREFIX ex:<$ex>\n"
    def ids = exec.execute(pro +
      """SELECT ?s ?b WHERE { ?s ex:num ?n . BIND(BNODE() AS ?b) }""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val first = ids
    assert(first.map(_._2).forall(_.startsWith("_:b")))
    assert(first.map(_._2).size == 3, "BNODE() must be unique per row")
    assert(ids == first, "BNODE() ids must be deterministic across executions")
  }

  test("DESCRIBE: constant resources and pattern-bound variables") {
    val exec = new SparqlExecutor(graph)
    val pro = s"PREFIX ex:<$ex>\n"
    val byConst = exec.executeDescribe(pro + "DESCRIBE ex:c")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(byConst == Set((s"${ex}label", "plain"), (s"${ex}num", "3"),
      (s"${ex}group", s"${ex}g2")))
    // variable form: describe every subject in group g1 (a and b)
    val byVar = exec.executeDescribe(pro +
      "DESCRIBE ?s WHERE { ?s ex:group ex:g1 }")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(byVar.map(_._1) == Set(s"${ex}a", s"${ex}b"))
    assert(byVar.contains((s"${ex}a", s"${ex}when")))
    intercept[IllegalArgumentException] {
      exec.executeDescribe(pro + "DESCRIBE ?nope")
    }
  }
}
