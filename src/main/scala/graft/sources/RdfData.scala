package graft.sources

import graft.parser.SparqlParser
import graft.parser.SparqlParser._
import graft.rdf.{Iri, Lit, Rdf, Term, Xsd}

import scala.collection.mutable.ArrayBuffer

/** Parser for ground RDF data in the SPARQL-ish fixture syntaxes the
  * reference tests use: `INSERT DATA { ... }` documents
  * (hybrid/tests/query_execution_testdata/testdata.sparql) and plain
  * Turtle-style triple blocks (prefixes + `s p o ; p2 o2 , o3 .`).
  * Ground terms only — no variables.
  */
object RdfData {

  def parseInsertData(text: String): Seq[(Term, String, Term)] = {
    val toks = SparqlParser.tokenize(text)
    new GroundTripleParser(toks).parse()
  }

  private final class GroundTripleParser(tokens: Vector[Tok]) {
    private var pos = 0
    private val prefixes = scala.collection.mutable.Map.empty[String, String]
    private def cur: Tok = tokens(pos)
    private def advance(): Tok = { val t = cur; pos += 1; t }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"fixture parse error at $pos ($cur): $msg")
    private def isWord(w: String) = cur match {
      case TWord(v) => v.equalsIgnoreCase(w); case _ => false
    }
    private def tryPunct(p: String): Boolean = cur match {
      case TPunct(v) if v == p => pos += 1; true
      case _ => false
    }
    private def eatPunct(p: String): Unit = if (!tryPunct(p)) fail(s"expected '$p'")

    def parse(): Seq[(Term, String, Term)] = {
      val acc = ArrayBuffer.empty[(Term, String, Term)]
      while (isWord("PREFIX") || isWord("@prefix")) {
        advance()
        val p = cur match {
          case TPName(pr, l) if l.isEmpty => advance(); pr
          case _ => fail("prefix name")
        }
        cur match {
          case TIri(v) => advance(); prefixes(p) = v
          case _ => fail("prefix IRI")
        }
        tryPunct(".")
      }
      if (isWord("INSERT")) { advance(); if (isWord("DATA")) advance() else fail("DATA") }
      tryPunct("{")
      var done = false
      while (!done) {
        cur match {
          case TEof => done = true
          case TPunct("}") => advance(); done = true
          case _ =>
            val s = term()
            var moreP = true
            while (moreP) {
              val p = predicate()
              var moreO = true
              while (moreO) {
                acc += ((s, p, term()))
                moreO = tryPunct(",")
              }
              moreP = tryPunct(";") && !isPunctNext("}") && !isTermEnd
            }
            tryPunct(".")
        }
      }
      acc.toSeq
    }

    private def isPunctNext(p: String) = cur match {
      case TPunct(v) => v == p; case _ => false
    }
    private def isTermEnd = cur match {
      case TPunct(".") | TEof => true; case _ => false
    }

    private def predicate(): String = cur match {
      case TWord(w) if w == "a" => advance(); Rdf.typ
      case TIri(v) => advance(); v
      case TPName(p, l) => advance(); resolve(p, l)
      case t => fail(s"expected predicate, got $t")
    }

    private def resolve(p: String, l: String): String =
      prefixes.get(p).map(_ + l).getOrElse(fail(s"unknown prefix $p:"))

    private def term(): Term = cur match {
      case TIri(v) => advance(); Iri(v)
      case TPName(p, l) => advance(); Iri(resolve(p, l))
      case TStr(v) =>
        advance()
        if (tryPunct("^^")) {
          val dt = cur match {
            case TIri(x) => advance(); x
            case TPName(p, l) => advance(); resolve(p, l)
            case _ => fail("datatype IRI")
          }
          Lit(v, dt)
        } else if (tryPunct("@")) {
          val lang = cur match { case TWord(w) => advance(); w; case _ => fail("lang") }
          Lit(v, Xsd.langString, Some(lang))
        } else Lit(v, Xsd.string)
      case TNum(v, dt) => advance(); Lit(v, dt)
      case TWord(w) if w.equalsIgnoreCase("true") || w.equalsIgnoreCase("false") =>
        advance(); Lit(w.toLowerCase, Xsd.boolean)
      case t => fail(s"expected term, got $t")
    }
  }
}
