package graft.sparql

import graft.parser.SparqlParser
import org.scalatest.funsuite.AnyFunSuite

/** The parser must accept every SPARQL query in the reference's rewriter
  * test corpus (/root/reference/hybrid/tests/rewrites.rs — 26 SELECT
  * queries covering the shapes its engine is exercised with). Extracted at
  * test time from the Rust raw strings; no Spark needed. */
class ParserCorpusSpec extends AnyFunSuite {

  test("parses all rewrites.rs corpus queries") {
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/hybrid/tests/rewrites.rs"))
    val raw = """(?s)r#"(.*?)"#""".r
    val queries = raw.findAllMatchIn(src).map(_.group(1))
      .filter(_.contains("SELECT")).toSeq
    assert(queries.size >= 20, s"expected the full corpus, got ${queries.size}")
    val failures = queries.zipWithIndex.flatMap { case (q, i) =>
      try { SparqlParser.parse(q); None }
      catch { case e: Exception => Some(s"query #$i: ${e.getMessage}\n${q.take(300)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n\n"))
  }
}
