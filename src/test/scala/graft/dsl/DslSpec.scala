package graft.dsl

import graft.SparkTestBase
import graft.exec.SparqlExecutor
import graft.graph.{TriplesGraph, TsSource}
import graft.rdf.{Iri, Lit, Otit, Rdf, Term, Xsd}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSL → SPARQL-algebra → engine, end-to-end over a fixture graph shaped
  * like the reference DSL test setup (dsl/tests/ts_translation.rs fixtures:
  * hasName/type-name templates + connective mapping) and the reference's
  * ts1/ts2 series. */
class DslSpec extends SparkTestBase {

  private val types = "http://example.org/types#"
  private val caseNs = "http://example.org/case#"

  private val config = Dsl.TranslatorConfig(
    connectiveMapping = Map(
      "." -> s"${types}hasOnePeriodRelation",
      ".." -> s"${types}hasTwoPeriodRelation",
      "-" -> s"${types}hasOneDashRelation"),
    namePredicate = s"${types}hasName",
    typeNamePredicate = s"${types}hasName")

  private def iri(n: String) = Iri(caseNs + n)
  private def str(s: String) = Lit(s, Xsd.string)

  private lazy val graph: TriplesGraph = {
    val dataDir = "/root/reference/hybrid/tests/query_execution_testdata"
    val t = Seq[(Term, String, Term)](
      // site of type ABC, dash-connected to a valve named HLV
      (iri("site1"), Rdf.typ, iri("SiteType")),
      (iri("SiteType"), s"${types}hasName", str("ABC")),
      (iri("site1"), s"${types}hasOneDashRelation", iri("valve1")),
      (iri("valve1"), s"${types}hasName", str("HLV")),
      // valve1 . Mvm . stVal -> series ts1
      (iri("valve1"), s"${types}hasOnePeriodRelation", iri("mvm1")),
      (iri("mvm1"), s"${types}hasName", str("Mvm")),
      (iri("mvm1"), s"${types}hasOnePeriodRelation", iri("stval1")),
      (iri("stval1"), s"${types}hasName", str("stVal")),
      (iri("stval1"), Otit.hasTimeseries, iri("series1")),
      (iri("series1"), Otit.hasExternalId, str("ts1")),
      // valve1 . PosPct . mag -> series ts2
      (iri("valve1"), s"${types}hasOnePeriodRelation", iri("pos1")),
      (iri("pos1"), s"${types}hasName", str("PosPct")),
      (iri("pos1"), s"${types}hasOnePeriodRelation", iri("mag1")),
      (iri("mag1"), s"${types}hasName", str("mag")),
      (iri("mag1"), Otit.hasTimeseries, iri("series2")),
      (iri("series2"), Otit.hasExternalId, str("ts2")))
    val schema = StructType(Seq(
      StructField("timestamp", TimestampType), StructField("value", LongType)))
    def tsCsv(name: String) =
      spark.read.option("header", "true").schema(schema).csv(s"$dataDir/$name.csv")
        .select(lit(name).as("id"), col("timestamp").as("ts"), col("value"))
    TriplesGraph.fromTerms(spark, t, Some(TsSource(tsCsv("ts1").unionByName(tsCsv("ts2")))))
  }

  test("parser: reference basic multiline query shape (ts_queries.rs:13)") {
    val q = Dsl.parse(
      """ABC-[valve]"HLV"."Mvm"."stVal"
        |[valve]."PosPct"."mag"
        |from 2021-12-01T00:00:01+01:00
        |to 2021-12-02T00:00:01+01:00
        |group valve
        |aggregate mean 10min""".stripMargin)
    assert(q.paths.size == 2)
    assert(q.paths.head.path.elements.map(_.typeName) ==
      Seq(Some("ABC"), None, None, None))
    assert(q.paths.head.path.elements.map(_.name) ==
      Seq(None, Some("HLV"), Some("Mvm"), Some("stVal")))
    assert(q.paths.head.path.elements(1).glue.contains("valve"))
    assert(q.paths.head.path.connectives == Seq("-", ".", "."))
    assert(q.group == Seq("valve"))
    assert(q.aggregation.contains(("mean", 600L)))
    assert(q.from.contains(java.time.Instant.parse("2021-11-30T23:00:01Z")))
  }

  test("conditioned paths parse ops and literals (ts_queries.rs:73)") {
    val q = Dsl.parse(
      """ABC-[valve]"HLV"."Mvm"."stVal" = true
        |[valve]."PosPct"."mag" > 0.7""".stripMargin)
    assert(q.paths.map(_.op) == Seq(Some("="), Some(">")))
    assert(q.paths(1).literal.contains(Lit("0.7", Xsd.double)))
  }

  test("end-to-end: two glued paths synchronize on timestamp") {
    val q = Dsl.parse(
      """ABC-[valve]"HLV"."Mvm"."stVal"
        |[valve]."PosPct"."mag"""".stripMargin)
    val algebra = new Dsl.Translator(config).translate(q)
    val df = new SparqlExecutor(graph).execute(algebra)
    assert(df.columns.toSeq == Seq("valve", "value_0", "value_1", "timestamp"))
    val rows = df.collect()
    assert(rows.length == 8) // ts1 x ts2 share all 8 timestamps
    assert(rows.forall(_.getString(0) == s"${caseNs}valve1"))
    // first synchronized pair: ts1=1, ts2=2 at 08:46:52
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).contains((1L, 2L)))
  }

  test("end-to-end: optional path keeps unmatched rows with null values") {
    val q = Dsl.parse(
      """ABC-[valve]"HLV"."Mvm"."stVal"
        |[valve]."PosPct"."mag" > 200 ?""".stripMargin)
    assert(q.paths(1).optional)
    val algebra = new Dsl.Translator(config).translate(q)
    val df = new SparqlExecutor(graph).execute(algebra)
    val rows = df.collect()
    // all 8 stVal points survive; value_1 only bound where ts2 > 200 at the
    // same timestamp (201,202,203,204,206 at :55-:59)
    assert(rows.length == 8)
    val bound = rows.count(!_.isNullAt(df.columns.indexOf("value_1")))
    assert(bound == 5, s"expected 5 matched optional values, got $bound")
  }

  test("LIKE condition lowers to the otit_swt#like function and filters") {
    val q = Dsl.parse("""ABC-[valve]"HLV"."Mvm"."stVal" like "^10"""")
    assert(q.paths.head.op.contains("like"))
    val algebra = new Dsl.Translator(config).translate(q)
    val df = new SparqlExecutor(graph).execute(algebra)
    // ts1 values starting with "10": 10, 100, 102, 105
    val vals = df.collect().map(r => r.getLong(df.columns.indexOf("value_0"))).sorted
    assert(vals.toSeq == Seq(10L, 100L, 102L, 105L))
  }

  test("end-to-end: condition + aggregation buckets") {
    val q = Dsl.parse(
      """ABC-[valve]"HLV"."Mvm"."stVal" < 300
        |group valve
        |aggregate sum 5s""".stripMargin)
    val algebra = new Dsl.Translator(config).translate(q)
    val df = new SparqlExecutor(graph).execute(algebra)
    assert(df.columns.toSeq == Seq("valve", "ts_bucket", "value_0_sum"))
    val byBucket = df.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // ts1 values < 300 in 5s buckets: :50-:54 -> 1+10+100, :55-:59 -> 102+105
    assert(byBucket.values.toSeq.sorted == Seq(111L, 207L))
  }
}
