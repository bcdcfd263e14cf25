package graft.sources

import graft.SparkTestBase
import graft.exec.{SparqlExecutor, SparqlUpdate}
import graft.graph.OKind
import graft.rdf.Xsd
import org.apache.spark.sql.functions._

/** Distributed N-Triples/N-Quads source: line parser unit cases, writer
  * round-trip, typed toGraph slices, named-graph quads, and SPARQL LOAD. */
class NTriplesSpec extends SparkTestBase {

  private val ex = "http://example.org/"

  private def tmpFile(lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("nt", ".nt")
    java.nio.file.Files.writeString(f, lines.mkString("\n") + "\n")
    f.toString
  }

  test("parseLine covers the term grammar") {
    import NTriples.{parseLine, Parsed}
    assert(parseLine("") == None)
    assert(parseLine("   # a comment") == None)
    assert(parseLine(s"<${ex}s> <${ex}p> <${ex}o> .") ==
      Some(Parsed(s"${ex}s", s"${ex}p", s"${ex}o", None, None, None)))
    assert(parseLine(s"_:b1 <${ex}p> _:b2 .") ==
      Some(Parsed("_:b1", s"${ex}p", "_:b2", None, None, None)))
    assert(parseLine(s"""<${ex}s> <${ex}p> "plain" .""") ==
      Some(Parsed(s"${ex}s", s"${ex}p", "plain", Some(Xsd.string), None, None)))
    assert(parseLine(s"""<${ex}s> <${ex}p> "bonjour"@fr .""") ==
      Some(Parsed(s"${ex}s", s"${ex}p", "bonjour", None, Some("fr"), None)))
    assert(parseLine(s"""<${ex}s> <${ex}p> "5"^^<${Xsd.long}> .""") ==
      Some(Parsed(s"${ex}s", s"${ex}p", "5", Some(Xsd.long), None, None)))
    // escapes: ECHAR + \u + \U (astral plane)
    assert(parseLine(s"""<${ex}s> <${ex}p> "a\\tb\\n\\"q\\"\\\\ \\u00e9 \\U0001F600" .""") ==
      Some(Parsed(s"${ex}s", s"${ex}p", "a\tb\n\"q\"\\ é 😀",
        Some(Xsd.string), None, None)))
    // N-Quads graph term
    assert(parseLine(s"""<${ex}s> <${ex}p> "x" <${ex}g> .""") ==
      Some(Parsed(s"${ex}s", s"${ex}p", "x", Some(Xsd.string), None,
        Some(s"${ex}g"))))
    // malformed lines fail loudly, quoting the line
    for (bad <- Seq(s"<${ex}s> <${ex}p>", s"<${ex}s <${ex}p> <${ex}o> .",
        s"""<${ex}s> <${ex}p> "unterminated .""",
        s"""<${ex}s> <${ex}p> "x\\q" .""")) {
      val e = intercept[IllegalArgumentException](parseLine(bad))
      assert(e.getMessage.contains("N-Triples parse error"))
    }
  }

  test("sink output round-trips through the reader bit-for-bit") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:T [xsd:anyURI ?subj , ?name , ?score] :: {
         |    ottr:Triple(?subj, ex:hasName, ?name) ,
         |    ottr:Triple(?subj, ex:hasScore, ?score)
         |} .""".stripMargin
    val df = Seq(
      ("K1", s"${ex}p1", "line\nbreak \"and\" tab\t\\slash", 10L),
      ("K2", s"${ex}p2", "plain é ünïcode", 3L)).toDF("Key", "subj", "name", "score")
    val m = graft.mapper.Mapping.fromString(t, spark)
    m.expand(s"${ex}T", df)
    val dir = java.nio.file.Files.createTempDirectory("ntrt").toString
    m.writeNTriplesDistributed(dir)

    val parsed = NTriples.read(spark, dir)
    val got = parsed.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3), r.getString(4))).toSet
    val want = Set(
      (s"${ex}p1", s"${ex}hasName", "line\nbreak \"and\" tab\t\\slash", Xsd.string, null),
      (s"${ex}p2", s"${ex}hasName", "plain é ünïcode", Xsd.string, null),
      (s"${ex}p1", s"${ex}hasScore", "10", Xsd.long, null),
      (s"${ex}p2", s"${ex}hasScore", "3", Xsd.long, null))
    assert(got == want)
  }

  test("toGraph types slices like fromQuads and queries run over them") {
    val path = tmpFile(Seq(
      s"""<${ex}a> <${ex}score> "10"^^<${Xsd.integer}> .""",
      s"""<${ex}b> <${ex}score> "3"^^<${Xsd.integer}> .""",
      s"""<${ex}a> <${ex}label> "hi"@en .""",
      s"""<${ex}a> <${ex}label> "salut"@fr .""",
      s"""<${ex}a> <${ex}knows> <${ex}b> .""",
      // mixed datatypes under one predicate fall back to string kind
      s"""<${ex}a> <${ex}misc> "5"^^<${Xsd.integer}> .""",
      s"""<${ex}b> <${ex}misc> "x" ."""))
    val g = NTriples.toGraph(spark, NTriples.read(spark, path))
    assert(g.slices(s"${ex}score").kind == OKind.KLong)
    assert(g.slices(s"${ex}label").kind == OKind.KStr)
    assert(g.slices(s"${ex}label").hasLang)
    assert(g.slices(s"${ex}knows").kind == OKind.KIri)
    assert(g.slices(s"${ex}misc").kind == OKind.KStr)
    val rows = new SparqlExecutor(g).execute(
      s"""PREFIX ex:<$ex>
         |SELECT ?n ?l WHERE {
         |  ?s ex:score ?n . ?s ex:label ?l .
         |  FILTER(?n > 5) FILTER(lang(?l) = "en")
         |}""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((10L, "hi")))
  }

  test("N-Quads graph terms give standard dataset semantics") {
    val path = tmpFile(Seq(
      s"""<${ex}a> <${ex}p> "default" .""",
      s"""<${ex}a> <${ex}p> "tagged" <${ex}g1> ."""))
    val g = NTriples.toGraph(spark, NTriples.read(spark, path))
    val ex0 = new SparqlExecutor(g)
    val dflt = ex0.execute(s"PREFIX ex:<$ex> SELECT ?o WHERE { ?s ex:p ?o }")
      .collect().map(_.getString(0)).toSeq
    assert(dflt == Seq("default"))
    val named = ex0.execute(
      s"PREFIX ex:<$ex> SELECT ?o WHERE { GRAPH <${ex}g1> { ?s ex:p ?o } }")
      .collect().map(_.getString(0)).toSeq
    assert(named == Seq("tagged"))
  }

  test("TriplesGraph export round-trips typed slices and quads") {
    import graft.rdf.{Iri, Lit}
    val quads = Seq(
      (Iri(s"${ex}a"), s"${ex}n", Lit("42", Xsd.long), None),
      (Iri(s"${ex}b"), s"${ex}n", Lit("7", Xsd.long), None),
      (Iri(s"${ex}a"), s"${ex}f", Lit("true", Xsd.boolean), None),
      (Iri(s"${ex}a"), s"${ex}t",
        Lit("2021-03-04T05:06:07Z", Xsd.dateTime), None),
      (Iri(s"${ex}a"), s"${ex}knows", Iri(s"${ex}b"), None),
      (Iri(s"${ex}a"), s"${ex}tag", Lit("x", Xsd.string), Some(s"${ex}g1")),
      (Iri(s"${ex}a"), s"${ex}tag", Lit("y", Xsd.string), None))
    val g0 = graft.graph.TriplesGraph.fromQuads(spark, quads.map {
      case (s0, p, o, gr) => (s0: graft.rdf.Term, p, o: graft.rdf.Term, gr)
    })
    val dir = java.nio.file.Files.createTempDirectory("ntgraph").toString
    g0.writeNTriplesDistributed(dir, withGraph = true)
    val g1 = NTriples.toGraph(spark, NTriples.read(spark, dir))
    assert(g1.slices(s"${ex}n").kind == OKind.KLong)
    assert(g1.slices(s"${ex}f").kind == OKind.KBool)
    assert(g1.slices(s"${ex}t").kind == OKind.KTs)
    assert(g1.slices(s"${ex}knows").kind == OKind.KIri)
    val ex1 = new SparqlExecutor(g1)
    val n = ex1.execute(
      s"PREFIX ex:<$ex> SELECT ?v WHERE { ?s ex:n ?v FILTER(?v > 10) }")
      .collect().map(_.getLong(0)).toSeq
    assert(n == Seq(42L))
    // timestamp lexical round-trips to the same instant
    val t = ex1.execute(
      s"PREFIX ex:<$ex> SELECT ?v WHERE { ?s ex:t ?v }")
      .collect().map(_.getTimestamp(0).toInstant.toString).toSeq
    assert(t == Seq("2021-03-04T05:06:07Z"))
    // quad tag survives; default graph sees only the untagged row
    val tagged = ex1.execute(
      s"PREFIX ex:<$ex> SELECT ?o WHERE { GRAPH <${ex}g1> { ?s ex:tag ?o } }")
      .collect().map(_.getString(0)).toSeq
    assert(tagged == Seq("x"))
    val dflt = ex1.execute(
      s"PREFIX ex:<$ex> SELECT ?o WHERE { ?s ex:tag ?o }")
      .collect().map(_.getString(0)).toSeq
    assert(dflt == Seq("y"))
    // triples-only export of the same graph drops the tagged row entirely
    val dir2 = java.nio.file.Files.createTempDirectory("ntgraph2").toString
    g0.writeNTriplesDistributed(dir2)
    val g2 = NTriples.toGraph(spark, NTriples.read(spark, dir2))
    assert(new SparqlExecutor(g2).execute(
      s"PREFIX ex:<$ex> SELECT ?o WHERE { ?s ex:tag ?o }")
      .collect().map(_.getString(0)).toSeq == Seq("y"))
  }

  test("SPARQL LOAD inserts the document; INTO GRAPH retargets; SILENT swallows") {
    val path = tmpFile(Seq(
      s"""<${ex}n1> <${ex}name> "alice" .""",
      s"""<${ex}n1> <${ex}age> "30"^^<${Xsd.integer}> ."""))
    val empty = graft.graph.TriplesGraph.fromQuads(spark,
      Seq((graft.rdf.Iri(s"${ex}seed"), s"${ex}name",
        graft.rdf.Lit("seed", Xsd.string), None)))
    val loaded = SparqlUpdate.execute(empty, s"LOAD <file://$path>")
    val names = new SparqlExecutor(loaded).execute(
      s"PREFIX ex:<$ex> SELECT ?n WHERE { ?s ex:name ?n } ORDER BY ?n")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("alice", "seed"))

    val intoG = SparqlUpdate.execute(empty,
      s"LOAD <file://$path> INTO GRAPH <${ex}g2>")
    val inG = new SparqlExecutor(intoG).execute(
      s"PREFIX ex:<$ex> SELECT ?n WHERE { GRAPH <${ex}g2> { ?s ex:name ?n } }")
      .collect().map(_.getString(0)).toSeq
    assert(inG == Seq("alice"))
    // default graph must NOT see the retargeted triples
    val dflt = new SparqlExecutor(intoG).execute(
      s"PREFIX ex:<$ex> SELECT ?n WHERE { ?s ex:name ?n }")
      .collect().map(_.getString(0)).toSeq
    assert(dflt == Seq("seed"))

    // SILENT: missing file → unchanged graph; non-silent → loud error
    val silent = SparqlUpdate.execute(empty,
      "LOAD SILENT <file:///nonexistent/nope.nt>")
    assert(new SparqlExecutor(silent).execute(
      s"PREFIX ex:<$ex> SELECT ?n WHERE { ?s ex:name ?n }")
      .collect().map(_.getString(0)).toSeq == Seq("seed"))
    intercept[Exception] {
      SparqlUpdate.execute(empty, "LOAD <file:///nonexistent/nope.nt>")
    }
  }
}
