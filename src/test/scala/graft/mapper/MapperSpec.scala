package graft.mapper

import graft.SparkTestBase
import graft.rdf.{Iri, Lit, Term, Xsd}
import graft.sources.RdfData

/** Golden tests mirroring the reference mapper suite
  * (/root/reference/mapper/tests/test_mapper.rs:30,74,124,187,261). */
class MapperSpec extends SparkTestBase {

  private val ex = "http://example.net/ns#"

  private def tripleSet(m: Mapping): Set[(Term, String, Term)] =
    m.exportTriples.toSet

  test("easy case: two int columns -> typed triples (test_mapper.rs:30)") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate [?myVar1 , ?myVar2]
         |  :: {
         |    ottr:Triple(ex:anObject, ex:hasNumber, ?myVar1) ,
         |    ottr:Triple(ex:anObject, ex:hasOtherNumber, ?myVar2)
         |  } .""".stripMargin
    val df = Seq(("KeyOne", 1, 3), ("KeyTwo", 2, 4)).toDF("Key", "myVar1", "myVar2")
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}ExampleTemplate", df)
    // golden file check via our N-Triples writer + ground parser round-trip
    val expected = RdfData.parseInsertData(java.nio.file.Files.readString(
      java.nio.file.Paths.get(
        "/root/reference/mapper/tests/mapper_testdata/expected_easy_case.ttl")))
      .toSet
    val actual = RdfData.parseInsertData(m.toNTriples.mkString("\n")).toSet
    assert(actual == expected)
  }

  test("all-IRI case: xsd:anyURI parameter binds IRIs (test_mapper.rs:74)") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate [xsd:anyURI ?myVar1]
         |  :: {
         |    ottr:Triple(ex:anObject, ex:relatesTo, ?myVar1)
         |  } .""".stripMargin
    val df = Seq(("KeyOne", s"${ex}OneThing"), ("KeyTwo", s"${ex}AnotherThing"))
      .toDF("Key", "myVar1")
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}ExampleTemplate", df)
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${ex}anObject"), s"${ex}relatesTo", Iri(s"${ex}OneThing")),
      (Iri(s"${ex}anObject"), s"${ex}relatesTo", Iri(s"${ex}AnotherThing"))))
  }

  test("language tags: option-tagged column + constant tagged literal (test_mapper.rs:124)") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate [?myString]
         |  :: {
         |    ottr:Triple(ex:anObject, ex:hasString, ?myString) ,
         |    ottr:Triple(ex:anotherObject, ex:hasString, ""@ar-SA)
         |  } .""".stripMargin
    val df = Seq(("KeyOne", "one"), ("KeyTwo", "two")).toDF("Key", "myString")
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}ExampleTemplate", df, languageTags = Map("myString" -> "bn-BD"))
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${ex}anObject"), s"${ex}hasString", Lit("one", Xsd.langString, Some("bn-BD"))),
      (Iri(s"${ex}anObject"), s"${ex}hasString", Lit("two", Xsd.langString, Some("bn-BD"))),
      (Iri(s"${ex}anotherObject"), s"${ex}hasString", Lit("", Xsd.langString, Some("ar-SA")))))
  }

  test("const list + cross expander (test_mapper.rs:187)") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate [xsd:anyURI ?var1]
         |  :: {
         |    cross | ottr:Triple(?var1, ex:hasNumber, ++(1,2))
         |  } .""".stripMargin
    val df = Seq(("KeyOne", s"${ex}OneThing"), ("KeyTwo", s"${ex}AnotherThing"))
      .toDF("Key", "var1")
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}ExampleTemplate", df)
    val int = Xsd.integer
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${ex}OneThing"), s"${ex}hasNumber", Lit("1", int)),
      (Iri(s"${ex}OneThing"), s"${ex}hasNumber", Lit("2", int)),
      (Iri(s"${ex}AnotherThing"), s"${ex}hasNumber", Lit("1", int)),
      (Iri(s"${ex}AnotherThing"), s"${ex}hasNumber", Lit("2", int))))
  }

  test("nested templates (test_mapper.rs:261)") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate [?myVar1 , ?myVar2] :: {
         |    ex:Nested(?myVar1),
         |    ottr:Triple(ex:anObject, ex:hasOtherNumber, ?myVar2)
         |  } .
         |ex:Nested [?myVar] :: {
         |    ottr:Triple(ex:anObject, ex:hasNumber, ?myVar)
         |} .""".stripMargin
    val df = Seq(("KeyOne", 1, 3), ("KeyTwo", 2, 4)).toDF("Key", "myVar1", "myVar2")
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}ExampleTemplate", df)
    val int = Xsd.int
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${ex}anObject"), s"${ex}hasNumber", Lit("1", int)),
      (Iri(s"${ex}anObject"), s"${ex}hasNumber", Lit("2", int)),
      (Iri(s"${ex}anObject"), s"${ex}hasOtherNumber", Lit("3", int)),
      (Iri(s"${ex}anObject"), s"${ex}hasOtherNumber", Lit("4", int))))
  }

  test("IRI minting for absent parameters (test_mapper.rs:330)") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate [?myIRI1, ?myIRI2] :: {
         |  ottr:Triple(?myIRI1, ex:relatesTo, ?myIRI2)
         |} .""".stripMargin
    val things = "http://example.net/things#"
    val df = Seq(("KeyOne", s"${things}subject1"), ("KeyTwo", s"${things}subject2"))
      .toDF("Key", "myIRI1")
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}ExampleTemplate", df,
      mintIris = Map("myIRI2" -> m.MintingOptions(things, 3L)))
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${things}subject1"), s"${ex}relatesTo", Iri(s"${things}3")),
      (Iri(s"${things}subject2"), s"${ex}relatesTo", Iri(s"${things}4"))))
    val minted = m.mintedIris("myIRI2").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(minted == Map("KeyOne" -> s"${things}3", "KeyTwo" -> s"${things}4"))
  }

  test("list-column argument with cross expander (test_mapper.rs:926)") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:AnotherExampleTemplate [?object, ?predicate, ?myList] :: {
         |    cross | ottr:Triple(?object, ?predicate, ++?myList)
         |  } .""".stripMargin
    val df = Seq(
      ("KeyOne", s"${ex}obj1", s"${ex}hasNumberFromList1", Seq(1, 2)),
      ("KeyTwo", s"${ex}obj2", s"${ex}hasNumberFromList2", Seq(3, 4)))
      .toDF("Key", "object", "predicate", "myList")
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}AnotherExampleTemplate", df)
    val int = Xsd.int
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${ex}obj1"), s"${ex}hasNumberFromList1", Lit("1", int)),
      (Iri(s"${ex}obj1"), s"${ex}hasNumberFromList1", Lit("2", int)),
      (Iri(s"${ex}obj2"), s"${ex}hasNumberFromList2", Lit("3", int)),
      (Iri(s"${ex}obj2"), s"${ex}hasNumberFromList2", Lit("4", int))))
  }

  test("two list-column arguments: zipMin pairs positionally") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:T [?subject, ?l1, ?l2] :: {
         |    zipMin | ex:Nested(?subject, ++?l1, ++?l2)
         |  } .
         |ex:Nested [?subject, ?a, ?b] :: {
         |    ottr:Triple(?subject, ex:hasNumber, ?a),
         |    ottr:Triple(?subject, ex:hasOtherNumber, ?b)
         |} .""".stripMargin
    val df = Seq((s"${ex}obj1", Seq(1, 2), Seq(5, 6, 7)))
      .toDF("subject", "l1", "l2")
      // subject must resolve as an IRI: declare via anyURI-typed param? the
      // template has no type, so pass IRIs as plain strings (subject
      // position is taken verbatim)
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}T", df)
    val int = Xsd.int
    // zipMin: (1,5), (2,6) — the unmatched 7 is dropped
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${ex}obj1"), s"${ex}hasNumber", Lit("1", int)),
      (Iri(s"${ex}obj1"), s"${ex}hasNumber", Lit("2", int)),
      (Iri(s"${ex}obj1"), s"${ex}hasOtherNumber", Lit("5", int)),
      (Iri(s"${ex}obj1"), s"${ex}hasOtherNumber", Lit("6", int))))
  }

  test("distributed N-Triples sink round-trips (file sink == driver path)") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:T [xsd:anyURI ?subj , ?name , ?score] :: {
         |    ottr:Triple(?subj, ex:hasName, ?name) ,
         |    ottr:Triple(?subj, ex:hasScore, ?score)
         |} .""".stripMargin
    val df = Seq(
      ("KeyOne", s"${ex}p1", "line\nbreak \"and\" tab\t\\slash", 10L),
      ("KeyTwo", s"${ex}p2", "plain", 3L)).toDF("Key", "subj", "name", "score")
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}T", df)
    val dir = java.nio.file.Files.createTempDirectory("ntriples").toString
    m.writeNTriplesDistributed(dir)
    val fromSink = spark.read.text(dir).collect().map(_.getString(0)).sorted.toSeq
    assert(fromSink == m.toNTriples.sorted)
    assert(fromSink.forall(_.endsWith(" .")))
  }

  test("mapper output is queryable: expand then SPARQL over toGraph") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:T [xsd:anyURI ?subj , ?name , ?score] :: {
         |    ottr:Triple(?subj, ex:hasName, ?name) ,
         |    ottr:Triple(?subj, ex:hasScore, ?score)
         |} .""".stripMargin
    val df = Seq(("KeyOne", s"${ex}p1", "alice", 10L), ("KeyTwo", s"${ex}p2", "bob", 3L))
      .toDF("Key", "subj", "name", "score")
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}T", df)
    val exec = new graft.exec.SparqlExecutor(m.toGraph)
    val rows = exec.execute(
      s"""PREFIX ex:<$ex>
         |SELECT ?n WHERE { ?o ex:hasName ?n . ?o ex:hasScore ?s . FILTER(?s > 5) }""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(rows == Set("alice"))
  }
}
