package graft.mapper

import graft.parser.SparqlParser
import graft.parser.SparqlParser._
import graft.rdf.{Lit, Xsd}

import scala.collection.mutable.ArrayBuffer

/** stOttr template-document model + parser.
  *
  * Covers the surface exercised by the reference mapper's golden tests
  * (/root/reference/mapper/tests/test_mapper.rs): prefixed template
  * signatures with optionally-typed parameters, instance bodies calling
  * `ottr:Triple` or other templates, list-expander instances
  * (`cross | tpl(...++(1,2))`), constant IRI/literal/list arguments.
  * Grammar reference: mapper/src/parsing/nom_parsing.rs:31-1023 (behavioral
  * reference only; this is a fresh recursive-descent implementation over the
  * same token shapes as our SPARQL lexer).
  */
object Stottr {

  val ottrTriple = "ottr:Triple" // resolved specially, ottr prefix implicit

  final case class Parameter(name: String, ptype: Option[String], optional: Boolean)

  trait Arg // open: the expander adds internal typed-element args
  final case class AVar(name: String) extends Arg
  /** `++?v` — a list-typed column to be expanded (cross/zipMin/zipMax). */
  final case class AListVar(name: String) extends Arg
  final case class AIri(iri: String) extends Arg
  final case class ALit(lit: Lit) extends Arg
  final case class AList(items: Seq[Arg]) extends Arg

  final case class Instance(template: String, args: Seq[Arg],
      expander: Option[String])

  final case class Template(iri: String, params: Seq[Parameter],
      instances: Seq[Instance])

  final case class Document(templates: Map[String, Template])

  def parse(text: String): Document = new StottrParser(SparqlParser.tokenize(text)).parse()

  private final class StottrParser(tokens: Vector[Tok]) {
    private var pos = 0
    private val prefixes = scala.collection.mutable.Map[String, String](
      "ottr" -> "http://ns.ottr.xyz/0.4/",
      "xsd" -> Xsd.ns)
    private def cur: Tok = tokens(pos)
    private def advance(): Tok = { val t = cur; pos += 1; t }
    private def fail(m: String): Nothing =
      throw new IllegalArgumentException(s"stOttr parse error at $pos ($cur): $m")
    private def tryPunct(p: String): Boolean = cur match {
      case TPunct(v) if v == p => pos += 1; true
      case _ => false
    }
    private def eatPunct(p: String): Unit = if (!tryPunct(p)) fail(s"expected '$p'")
    // ':' tokens surface as empty PNames from the shared lexer
    private def isColon: Boolean = cur match {
      case TPName("", "") => true
      case _ => false
    }

    def parse(): Document = {
      val templates = ArrayBuffer.empty[Template]
      while (cur != TEof) {
        if (tryPunct("@")) {
          cur match {
            case TWord(w) if w.equalsIgnoreCase("prefix") =>
              advance()
              val p = cur match {
                case TPName(pr, l) if l.isEmpty => advance(); pr
                case _ => fail("prefix name")
              }
              val iri = cur match { case TIri(v) => advance(); v; case _ => fail("prefix IRI") }
              prefixes(p) = iri
              tryPunct(".")
            case _ => fail("expected @prefix")
          }
        } else templates += parseTemplate()
      }
      Document(templates.map(t => t.iri -> t).toMap)
    }

    private def resolve(p: String, l: String): String =
      prefixes.get(p).map(_ + l).getOrElse(fail(s"unknown prefix $p:"))

    private def parseIriRef(): String = cur match {
      case TIri(v) => advance(); v
      case TPName(p, l) => advance(); resolve(p, l)
      case t => fail(s"expected IRI, got $t")
    }

    private def parseTemplate(): Template = {
      val iri = parseIriRef()
      eatPunct("[")
      val params = ArrayBuffer.empty[Parameter]
      if (!tryPunct("]")) {
        var more = true
        while (more) {
          params += parseParameter()
          more = tryPunct(",")
        }
        eatPunct("]")
      }
      // '::'
      if (!isColon) fail("expected '::'"); advance()
      if (!isColon) fail("expected '::'"); advance()
      eatPunct("{")
      val instances = ArrayBuffer.empty[Instance]
      if (!tryPunct("}")) {
        var more = true
        while (more) {
          instances += parseInstance()
          more = tryPunct(",")
        }
        eatPunct("}")
      }
      tryPunct(".")
      Template(iri, params.toSeq, instances.toSeq)
    }

    private def parseParameter(): Parameter = {
      var optional = false
      var done = false
      while (!done) {
        if (tryPunct("?") || tryPunct("!")) optional = true else done = true
      }
      val ptype = cur match {
        case TPName(_, l) if l.nonEmpty => Some(parseIriRef())
        case TIri(_) => Some(parseIriRef())
        case _ => None
      }
      cur match {
        case TVar(v) => advance(); Parameter(v, ptype, optional)
        case t => fail(s"expected parameter var, got $t")
      }
    }

    private def parseInstance(): Instance = {
      // optional expander: cross | zipMin | zipMax followed by '|'
      var expander: Option[String] = None
      cur match {
        case TWord(w) if Set("cross", "zipmin", "zipmax").contains(w.toLowerCase) =>
          advance(); eatPunct("|"); expander = Some(w)
        case _ =>
      }
      val tpl = parseIriRef()
      eatPunct("(")
      val args = ArrayBuffer.empty[Arg]
      if (!tryPunct(")")) {
        var more = true
        while (more) {
          args += parseArg()
          more = tryPunct(",")
        }
        eatPunct(")")
      }
      Instance(tpl, args.toSeq, expander)
    }

    private def parseArg(): Arg = cur match {
      case TVar(v) => advance(); AVar(v)
      case TIri(_) => AIri(parseIriRef())
      case TPName(_, _) => AIri(parseIriRef())
      case TNum(v, dt) => advance(); ALit(Lit(v, dt))
      case TStr(v) =>
        advance()
        if (tryPunct("^^")) ALit(Lit(v, parseIriRef()))
        else if (tryPunct("@")) {
          val lang = cur match {
            case TWord(w) => advance()
              // lang tags like ar-SA tokenize as a single word (dash allowed)
              w
            case _ => fail("language tag")
          }
          ALit(Lit(v, Xsd.langString, Some(lang)))
        } else ALit(Lit(v, Xsd.string))
      case TPunct("+") =>
        advance(); eatPunct("+")
        cur match {
          case TVar(v) => advance(); AListVar(v)
          case _ =>
            eatPunct("(")
            val items = ArrayBuffer.empty[Arg]
            if (!tryPunct(")")) {
              var more = true
              while (more) { items += parseArg(); more = tryPunct(",") }
              eatPunct(")")
            }
            AList(items.toSeq)
        }
      case TWord(w) if w.equalsIgnoreCase("true") || w.equalsIgnoreCase("false") =>
        advance(); ALit(Lit(w.toLowerCase, Xsd.boolean))
      case t => fail(s"unexpected argument token $t")
    }
  }
}
