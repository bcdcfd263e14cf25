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
    // minted frames are keyed by template (the reference's minted_iris)
    val minted = m.mintedIris(s"${ex}ExampleTemplate")
      .select("Key", "myIRI2").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(minted == Map("KeyOne" -> s"${things}3", "KeyTwo" -> s"${things}4"))
  }

  test("IRI resolution across templates by foreign key (test_mapper.rs:401)") {
    import spark.implicits._
    val t1 =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate1 [?myIRI1, ?myIRI2] :: {
         |  ottr:Triple(?myIRI1, ex:relatesTo, ?myIRI2)
         |} .""".stripMargin
    val t2 =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate2 [?myIRI1, ?myIRI2] :: {
         |  ottr:Triple(?myIRI1, ex:relatesDifferentlyTo, ?myIRI2)
         |} .""".stripMargin
    val things = "http://example.net/things#"
    val m = Mapping.fromStrings(Seq(t1, t2), spark)
    val df1 = Seq(("KeyOne", s"${things}subject1"), ("KeyTwo", s"${things}subject2"))
      .toDF("Key", "myIRI1")
    m.expand(s"${ex}ExampleTemplate1", df1,
      mintIris = Map("myIRI2" -> m.MintingOptions(things, 3L)))
    val df2 = Seq(
      ("KeyOne2", s"${things}otherSubject1", "KeyOne"),
      ("KeyTwo2", s"${things}otherSubject2", "KeyTwo"))
      .toDF("Key", "myIRI1", "myIRI2ForeignKey")
    m.expand(s"${ex}ExampleTemplate2", df2,
      resolveIris = Map("myIRI2" ->
        m.ResolveIri("myIRI2ForeignKey", s"${ex}ExampleTemplate1", "myIRI2")))
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${things}subject1"), s"${ex}relatesTo", Iri(s"${things}3")),
      (Iri(s"${things}subject2"), s"${ex}relatesTo", Iri(s"${things}4")),
      (Iri(s"${things}otherSubject1"), s"${ex}relatesDifferentlyTo", Iri(s"${things}3")),
      (Iri(s"${things}otherSubject2"), s"${ex}relatesDifferentlyTo", Iri(s"${things}4"))))
  }

  test("IRI resolution with list-valued foreign key (test_mapper.rs:509)") {
    import spark.implicits._
    val t1 =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate1 [?myIRI1, ?myIRI2] :: {
         |  ottr:Triple(?myIRI1, ex:relatesTo, ?myIRI2)
         |} .""".stripMargin
    val t2 =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate2 [?myIRI1, ?myIRI2] :: {
         |  cross | ottr:Triple(?myIRI1, ex:relatesDifferentlyTo, ++?myIRI2)
         |} .""".stripMargin
    val things = "http://example.net/things#"
    val m = Mapping.fromStrings(Seq(t1, t2), spark)
    val df1 = Seq(("KeyOne", s"${things}subject1"), ("KeyTwo", s"${things}subject2"))
      .toDF("Key", "myIRI1")
    m.expand(s"${ex}ExampleTemplate1", df1,
      mintIris = Map("myIRI2" -> m.MintingOptions(things, 3L)))
    val df2 = Seq(
      ("KeyOne2", s"${things}otherSubject1", Seq("KeyOne", "KeyTwo")),
      ("KeyTwo2", s"${things}otherSubject2", Seq("KeyOne", "KeyTwo")))
      .toDF("Key", "myIRI1", "myIRI2ForeignKey")
    m.expand(s"${ex}ExampleTemplate2", df2,
      resolveIris = Map("myIRI2" ->
        m.ResolveIri("myIRI2ForeignKey", s"${ex}ExampleTemplate1", "myIRI2")))
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${things}subject1"), s"${ex}relatesTo", Iri(s"${things}3")),
      (Iri(s"${things}subject2"), s"${ex}relatesTo", Iri(s"${things}4")),
      (Iri(s"${things}otherSubject1"), s"${ex}relatesDifferentlyTo", Iri(s"${things}3")),
      (Iri(s"${things}otherSubject1"), s"${ex}relatesDifferentlyTo", Iri(s"${things}4")),
      (Iri(s"${things}otherSubject2"), s"${ex}relatesDifferentlyTo", Iri(s"${things}3")),
      (Iri(s"${things}otherSubject2"), s"${ex}relatesDifferentlyTo", Iri(s"${things}4"))))
  }

  test("derived datatypes incl. datetime lexical forms (test_mapper.rs:643)") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:ExampleTemplate [?Boolean, ?Int32, ?Int64, ?Float32, ?Float64,
         |                    ?Utf8, ?Instant, ?Naive] :: {
         |    ottr:Triple(ex:anObject, ex:hasVal, ?Boolean),
         |    ottr:Triple(ex:anObject, ex:hasVal, ?Int32),
         |    ottr:Triple(ex:anObject, ex:hasVal, ?Int64),
         |    ottr:Triple(ex:anotherObject, ex:hasValVal, ?Float32),
         |    ottr:Triple(ex:anotherObject, ex:hasValVal, ?Float64),
         |    ottr:Triple(ex:yetAnotherObject, ex:hasString, ?Utf8),
         |    ottr:Triple(ex:yetAnotherObject, ex:hasDateTime, ?Instant),
         |    ottr:Triple(ex:yetAnotherObject, ex:hasDateTime, ?Naive)
         |  } .""".stripMargin
    // Instants chosen so the Oslo lexicals equal the reference goldens
    // (2022-07-03T10:06:20.123+02:00 = epoch 1656835580123 ms). Documented
    // divergence: the reference's hack_format_timestamp_with_timezone stamps
    // the UTC wall-clock with the zone's offset WITHOUT shifting (its golden
    // denotes a different instant than its input); we render the true
    // instant in the serialization zone — same policy as the BOUND bug fix.
    val df = Seq(
      ("KeyOne", true, -13, -15L, 17.18f, 21.22, "abcde",
        new java.sql.Timestamp(1656835580123L),
        java.time.LocalDateTime.parse("2022-07-03T10:06:30.789")),
      ("KeyTwo", false, -14, -16L, 19.20f, 23.24, "fghij",
        new java.sql.Timestamp(1656835581456L),
        java.time.LocalDateTime.parse("2022-07-03T10:06:31.101")))
      .toDF("Key", "Boolean", "Int32", "Int64", "Float32", "Float64", "Utf8",
        "Instant", "Naive")
    val m = new Mapping(Stottr.parse(t), spark, serializationZone = "Europe/Oslo")
    m.expand(s"${ex}ExampleTemplate", df)
    val an = Iri(s"${ex}anObject"); val another = Iri(s"${ex}anotherObject")
    val yet = Iri(s"${ex}yetAnotherObject")
    val expected = Set[(Term, String, Term)](
      (an, s"${ex}hasVal", Lit("true", Xsd.boolean)),
      (an, s"${ex}hasVal", Lit("false", Xsd.boolean)),
      (an, s"${ex}hasVal", Lit("-13", Xsd.int)),
      (an, s"${ex}hasVal", Lit("-14", Xsd.int)),
      (an, s"${ex}hasVal", Lit("-15", Xsd.long)),
      (an, s"${ex}hasVal", Lit("-16", Xsd.long)),
      (another, s"${ex}hasValVal", Lit("17.18", Xsd.float)),
      (another, s"${ex}hasValVal", Lit("19.2", Xsd.float)),
      (another, s"${ex}hasValVal", Lit("21.22", Xsd.double)),
      (another, s"${ex}hasValVal", Lit("23.24", Xsd.double)),
      (yet, s"${ex}hasString", Lit("abcde", Xsd.string)),
      (yet, s"${ex}hasString", Lit("fghij", Xsd.string)),
      (yet, s"${ex}hasDateTime", Lit("2022-07-03T10:06:20.123+02:00", Xsd.dateTimeStamp)),
      (yet, s"${ex}hasDateTime", Lit("2022-07-03T10:06:21.456+02:00", Xsd.dateTimeStamp)),
      (yet, s"${ex}hasDateTime", Lit("2022-07-03T10:06:30.789", Xsd.dateTime)),
      (yet, s"${ex}hasDateTime", Lit("2022-07-03T10:06:31.101", Xsd.dateTime)))
    assert(tripleSet(m) == expected)
  }

  test("LUB type inference propagates callee types to callers (templates.rs:173)") {
    val t =
      s"""@prefix ex:<$ex>.
         |ex:Outer [?x, ?xs] :: {
         |    ex:TakesIri(?x),
         |    cross | ex:TakesInt(++?xs)
         |} .
         |ex:TakesIri [xsd:anyURI ?i] :: {
         |    ottr:Triple(?i, ex:touched, true)
         |} .
         |ex:TakesInt [xsd:int ?n] :: {
         |    ottr:Triple(ex:thing, ex:hasNumber, ?n)
         |} .""".stripMargin
    val doc = Stottr.parse(t)
    val outer = doc.templates(s"${ex}Outer")
    assert(outer.params.find(_.name == "x").flatMap(_.ptype)
      .contains(Stottr.PBasic(Xsd.anyURI)))
    assert(outer.params.find(_.name == "xs").flatMap(_.ptype)
      .contains(Stottr.PNEList(Stottr.PBasic(Xsd.int))))
    // inferred anyURI makes the nested call bind IRIs end-to-end
    import spark.implicits._
    val m = new Mapping(doc, spark)
    m.expand(s"${ex}Outer",
      Seq(("K1", s"${ex}someThing", Seq(4, 5))).toDF("Key", "x", "xs"))
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${ex}someThing"), s"${ex}touched", Lit("true", Xsd.boolean)),
      (Iri(s"${ex}thing"), s"${ex}hasNumber", Lit("4", Xsd.int)),
      (Iri(s"${ex}thing"), s"${ex}hasNumber", Lit("5", Xsd.int))))
  }

  test("grammar: modes, list types, defaults, annotations, blank nodes, none") {
    val t =
      s"""@prefix ex:<$ex>.
         |ex:T [!xsd:anyURI ?s, ? xsd:string ?opt = "fallback",
         |      List<xsd:int> ?nums, ? ?unused = none]
         |  @@ ex:Audit(ex:T, "v1")
         |  :: {
         |    ottr:Triple(?s, ex:hasOpt, ?opt),
         |    cross | ottr:Triple(?s, ex:hasNum, ++?nums),
         |    ottr:Triple(_:b1, ex:anon, [])
         |} .""".stripMargin
    val doc = Stottr.parse(t)
    val tpl = doc.templates(s"${ex}T")
    val byName = tpl.params.map(p => p.name -> p).toMap
    assert(byName("s").nonBlank && !byName("s").optional)
    assert(byName("opt").optional &&
      byName("opt").default.contains(Stottr.ALit(graft.rdf.Lit("fallback", Xsd.string))))
    assert(byName("nums").ptype.contains(Stottr.PList(Stottr.PBasic(Xsd.int))))
    assert(byName("unused").default.contains(Stottr.ANone))
    assert(tpl.annotations.size == 1 &&
      tpl.annotations.head.template == s"${ex}Audit")
    // blank nodes flow through expansion and exports keep the _: form
    import spark.implicits._
    val m = new Mapping(doc, spark)
    m.expand(s"${ex}T",
      Seq(("K1", s"${ex}thing", "given", Seq(1))).toDF("Key", "s", "opt", "nums"))
    val triples = tripleSet(m)
    assert(triples.contains(
      (Iri(s"${ex}thing"), s"${ex}hasOpt", Lit("given", Xsd.string))))
    assert(triples.contains(
      (Iri(s"${ex}thing"), s"${ex}hasNum", Lit("1", Xsd.int))))
    assert(triples.exists {
      case (graft.rdf.Blank("b1"), p, graft.rdf.Blank(_)) => p == s"${ex}anon"
      case _ => false
    })
    val nt = m.toNTriples.find(_.startsWith("_:b1"))
    assert(nt.exists(l => l.contains(s"<${ex}anon>") && l.contains(" _:Anonymous")))
  }

  test("default fills absent column; explicit column wins over default") {
    import spark.implicits._
    val t =
      s"""@prefix ex:<$ex>.
         |ex:T [xsd:anyURI ?s, ?score = 42] :: {
         |    ottr:Triple(?s, ex:hasScore, ?score)
         |} .""".stripMargin
    val m = Mapping.fromString(t, spark)
    m.expand(s"${ex}T", Seq(("K1", s"${ex}a")).toDF("Key", "s"))
    assert(tripleSet(m) == Set[(Term, String, Term)](
      (Iri(s"${ex}a"), s"${ex}hasScore", Lit("42", Xsd.integer))))
  }

  test("validation negatives: nulls, type mismatch, blank in non-blank, empty NEList") {
    import spark.implicits._
    // non-optional null
    val t1 =
      s"""@prefix ex:<$ex>.
         |ex:T [xsd:anyURI ?s, ?v] :: { ottr:Triple(?s, ex:p, ?v) } .""".stripMargin
    val m1 = Mapping.fromString(t1, spark)
    val withNull = Seq(("K1", s"${ex}a", Some("x")), ("K2", s"${ex}b", None))
      .toDF("Key", "s", "v")
    val e1 = intercept[IllegalArgumentException] {
      m1.expand(s"${ex}T", withNull)
    }
    assert(e1.getMessage.contains("non-optional"))
    // declared-type vs column-type mismatch (xsd:long needs LongType)
    val t2 =
      s"""@prefix ex:<$ex>.
         |ex:T [xsd:anyURI ?s, xsd:long ?v] :: { ottr:Triple(?s, ex:p, ?v) } .""".stripMargin
    val m2 = Mapping.fromString(t2, spark)
    val e2 = intercept[IllegalArgumentException] {
      m2.expand(s"${ex}T", Seq(("K1", s"${ex}a", 1)).toDF("Key", "s", "v"))
    }
    assert(e2.getMessage.contains("incompatible"))
    // blank node in a non-blank (!) parameter
    val t3 =
      s"""@prefix ex:<$ex>.
         |ex:T [!xsd:anyURI ?s, ?v] :: { ottr:Triple(?s, ex:p, ?v) } .""".stripMargin
    val m3 = Mapping.fromString(t3, spark)
    val e3 = intercept[IllegalArgumentException] {
      m3.expand(s"${ex}T", Seq(("K1", "_:blanky", "x")).toDF("Key", "s", "v"))
    }
    assert(e3.getMessage.contains("non-blank"))
    // empty list in an NEList parameter
    val t4 =
      s"""@prefix ex:<$ex>.
         |ex:T [xsd:anyURI ?s, NEList<xsd:int> ?xs] :: {
         |  cross | ottr:Triple(?s, ex:p, ++?xs)
         |} .""".stripMargin
    val m4 = Mapping.fromString(t4, spark)
    val e4 = intercept[IllegalArgumentException] {
      m4.expand(s"${ex}T", Seq(("K1", s"${ex}a", Seq.empty[Int])).toDF("Key", "s", "xs"))
    }
    assert(e4.getMessage.contains("NEList"))
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
