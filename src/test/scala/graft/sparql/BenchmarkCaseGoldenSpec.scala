package graft.sparql

import graft.SparkTestBase
import graft.exec.SparqlExecutor
import graft.graph.{TriplesGraph, TsSource}
import graft.sources.RdfData
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's wind-power benchmark case
  * (/root/reference/hybrid/tests/query_execution_benchmark_case.rs): a
  * 321-triple RDS asset graph + 24 series × ~26k points, with golden CSVs.
  * The heaviest end-to-end exercise in the suite: deep static BGP, series
  * selection by label, three-way timestamp synchronization, time-range
  * filter, 10-minute bucketed AVG.
  */
class BenchmarkCaseGoldenSpec extends SparkTestBase {

  private val dataDir = "/root/reference/hybrid/tests/query_execution_benchmark_case"

  private lazy val graph: TriplesGraph = {
    val triples = RdfData.parseInsertData(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dataDir/testdata.sparql")))
    val schema = StructType(Seq(
      StructField("value", DoubleType), StructField("timestamp", TimestampType)))
    val series = for (kind <- Seq("ep", "wsp", "wdir"); i <- 1 to 8) yield s"$kind$i"
    val ts = series.map { name =>
      spark.read.option("header", "true").schema(schema).csv(s"$dataDir/$name.csv")
        .select(lit(name).as("id"), col("timestamp").as("ts"), col("value"))
    }.reduce(_.unionByName(_))
    TriplesGraph.fromTerms(spark, triples, Some(TsSource(ts)))
  }

  private val prologue =
    """PREFIX xsd:<http://www.w3.org/2001/XMLSchema#>
      |PREFIX otit:<https://github.com/magbak/otit_swt#>
      |PREFIX wp:<https://github.com/magbak/otit_swt/windpower_example#>
      |PREFIX rdfs:<http://www.w3.org/2000/01/rdf-schema#>
      |PREFIX rdf:<http://www.w3.org/1999/02/22-rdf-syntax-ns#>
      |PREFIX rds:<https://github.com/magbak/otit_swt/rds_power#>
      |""".stripMargin

  private def run(q: String): DataFrame =
    new SparqlExecutor(graph).execute(prologue + q)

  // query_execution_benchmark_case.rs:82 — single-series bucketed AVG
  test("wind-power: production 10-minute averages (should_pushdown)") {
    val df = run(
      """SELECT ?site_label ?wtur_label ?year ?month ?day ?hour ?minute_10 (AVG(?val) as ?avg_val) WHERE {
        |    ?site a rds:Site .
        |    ?site rdfs:label ?site_label .
        |    ?site rds:hasFunctionalAspect ?wtur_asp .
        |    ?wtur_asp rdfs:label ?wtur_label .
        |    ?wtur rds:hasFunctionalAspectNode ?wtur_asp .
        |    ?wtur rds:hasFunctionalAspect ?gensys_asp .
        |    ?wtur a rds:A .
        |    ?gensys rds:hasFunctionalAspectNode ?gensys_asp .
        |    ?gensys a rds:RA .
        |    ?gensys rds:hasFunctionalAspect ?generator_asp .
        |    ?generator rds:hasFunctionalAspectNode ?generator_asp .
        |    ?generator a rds:GAA .
        |    ?generator otit:hasTimeseries ?ts .
        |    ?ts rdfs:label "Production" .
        |    ?ts otit:hasDataPoint ?dp .
        |    ?dp otit:hasValue ?val .
        |    ?dp otit:hasTimestamp ?t .
        |    BIND(10 * FLOOR(minutes(?t) / 10.0) as ?minute_10)
        |    BIND(hours(?t) AS ?hour)
        |    BIND(day(?t) AS ?day)
        |    BIND(month(?t) AS ?month)
        |    BIND(year(?t) AS ?year)
        |    FILTER(?site_label = "Wind Mountain"
        |        && ?wtur_label = "A1"
        |        && ?t >= "2022-08-30T08:46:53"^^xsd:dateTime
        |        && ?t <= "2022-08-30T21:46:53"^^xsd:dateTime) .
        |}
        |GROUP BY ?site_label ?wtur_label ?year ?month ?day ?hour ?minute_10""".stripMargin)
    GoldenCompare.assertMatchesGolden(df, s"$dataDir/expected_should_pushdown.csv",
      approxCols = Set("avg_val"))
  }

  // query_execution_benchmark_case.rs:160 — three series synchronized on ?t
  test("wind-power: production/direction/speed synchronized averages (multi)") {
    val df = run(
      """SELECT ?site_label ?wtur_label ?year ?month ?day ?hour ?minute_10 (AVG(?val_prod) as ?val_prod_avg) (AVG(?val_dir) as ?val_dir_avg) (AVG(?val_speed) as ?val_speed_avg) WHERE {
        |    ?site a rds:Site .
        |    ?site rdfs:label ?site_label .
        |    ?site rds:hasFunctionalAspect ?wtur_asp .
        |    ?wtur_asp rdfs:label ?wtur_label .
        |    ?wtur rds:hasFunctionalAspectNode ?wtur_asp .
        |    ?wtur a rds:A .
        |    ?wtur rds:hasFunctionalAspect ?gensys_asp .
        |    ?gensys rds:hasFunctionalAspectNode ?gensys_asp .
        |    ?gensys a rds:RA .
        |    ?gensys rds:hasFunctionalAspect ?generator_asp .
        |    ?generator rds:hasFunctionalAspectNode ?generator_asp .
        |    ?generator a rds:GAA .
        |    ?wtur rds:hasFunctionalAspect ?weather_asp .
        |    ?weather rds:hasFunctionalAspectNode ?weather_asp .
        |    ?weather a rds:LE .
        |    ?weather otit:hasTimeseries ?ts_speed .
        |    ?ts_speed otit:hasDataPoint ?dp_speed .
        |    ?dp_speed otit:hasValue ?val_speed .
        |    ?dp_speed otit:hasTimestamp ?t .
        |    ?ts_speed rdfs:label "Windspeed" .
        |    ?weather otit:hasTimeseries ?ts_dir .
        |    ?ts_dir otit:hasDataPoint ?dp_dir .
        |    ?dp_dir otit:hasValue ?val_dir .
        |    ?dp_dir otit:hasTimestamp ?t .
        |    ?ts_dir rdfs:label "WindDirection" .
        |    ?generator otit:hasTimeseries ?ts_prod .
        |    ?ts_prod rdfs:label "Production" .
        |    ?ts_prod otit:hasDataPoint ?dp_prod .
        |    ?dp_prod otit:hasValue ?val_prod .
        |    ?dp_prod otit:hasTimestamp ?t .
        |    BIND(10 * FLOOR(minutes(?t) / 10.0) as ?minute_10)
        |    BIND(hours(?t) AS ?hour)
        |    BIND(day(?t) AS ?day)
        |    BIND(month(?t) AS ?month)
        |    BIND(year(?t) AS ?year)
        |    FILTER(?t >= "2022-08-30T08:46:53"^^xsd:dateTime && ?t <= "2022-08-30T21:46:53"^^xsd:dateTime) .
        |}
        |GROUP BY ?site_label ?wtur_label ?year ?month ?day ?hour ?minute_10""".stripMargin)
    GoldenCompare.assertMatchesGolden(df,
      s"$dataDir/expected_multi_should_pushdown.csv",
      approxCols = Set("val_prod_avg", "val_dir_avg", "val_speed_avg"))
  }
}
