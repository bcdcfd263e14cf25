package graft

/** Catalog-wide output-schema lint: every entry's result schema must be
  * scalar-only (no array/map/struct/binary), because the driver harness
  * canonicalizes rows with a pandas sort that dies on nested values — the
  * r6 q95_feature_hash gate failure. Running the lint here means a
  * nested-typed entry fails `sbt test` at build time, not a driver round.
  */
class CatalogSchemaLintSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("every catalog entry emits a scalar-only schema") {
    Catalog.all.foreach { q =>
      val schema = q.fn(spark, sf).schema
      Verify.assertScalarSchema(q.name, schema)
    }
  }

  test("the lint itself rejects nested and binary columns by name") {
    import org.apache.spark.sql.types._
    val bad = StructType(Seq(
      StructField("ok", LongType),
      StructField("arr", ArrayType(IntegerType)),
      StructField("bin", BinaryType)))
    val e = intercept[IllegalArgumentException] {
      Verify.assertScalarSchema("q_demo", bad)
    }
    assert(e.getMessage.contains("q_demo"))
    assert(e.getMessage.contains("arr"))
    assert(e.getMessage.contains("bin"))
    // and passes a scalar schema untouched
    Verify.assertScalarSchema("q_ok",
      StructType(Seq(StructField("a", StringType), StructField("b", DoubleType))))
  }
}
