package graft.mapper

import graft.parser.SparqlParser
import graft.parser.SparqlParser._
import graft.rdf.{Lit, Xsd}

import scala.collection.mutable.ArrayBuffer

/** stOttr template-document model + parser.
  *
  * Covers the reference mapper's grammar surface
  * (mapper/src/parsing/nom_parsing.rs:31-1023 — behavioral reference only;
  * this is a fresh recursive-descent implementation over the same token
  * shapes as our SPARQL lexer): prefixed template signatures with parameter
  * modes (`?` optional, `!` non-blank), parameter types (basic, `List<…>`,
  * `NEList<…>`, `LUB<…>`), default values (`= constant`), annotation lists
  * (`@@ instance`), instance bodies calling `ottr:Triple` or other
  * templates, list-expander instances (`cross | tpl(++?xs)`), constant
  * IRI / literal / list / blank-node / `none` arguments.
  *
  * [[inferTypes]] adds the reference's LUB template type inference
  * (mapper/src/templates.rs:173-344): parameter types propagate from callee
  * signatures to caller parameters until fixpoint.
  */
object Stottr {

  val ottrTriple = "ottr:Triple" // resolved specially, ottr prefix implicit

  // ------------------------------------------------------- parameter types
  /** Parameter type (reference ast::PType). */
  sealed trait PType
  final case class PBasic(iri: String) extends PType
  final case class PList(inner: PType) extends PType
  final case class PNEList(inner: PType) extends PType
  final case class PLub(inner: PType) extends PType

  object PType {
    /** The basic XSD/IRI type at the leaf of a (possibly nested) type. */
    def leaf(t: PType): String = t match {
      case PBasic(i) => i
      case PList(i) => leaf(i)
      case PNEList(i) => leaf(i)
      case PLub(i) => leaf(i)
    }
    def render(t: PType): String = t match {
      case PBasic(i) => i
      case PList(i) => s"List<${render(i)}>"
      case PNEList(i) => s"NEList<${render(i)}>"
      case PLub(i) => s"LUB<${render(i)}>"
    }
  }

  final case class Parameter(name: String, ptype: Option[PType],
      optional: Boolean, nonBlank: Boolean = false, default: Option[Arg] = None)

  trait Arg // open: the expander adds internal typed-element args
  final case class AVar(name: String) extends Arg
  /** `++?v` — a list-typed column to be expanded (cross/zipMin/zipMax). */
  final case class AListVar(name: String) extends Arg
  final case class AIri(iri: String) extends Arg
  final case class ALit(lit: Lit) extends Arg
  final case class AList(items: Seq[Arg]) extends Arg
  final case class ABlank(id: String) extends Arg
  case object ANone extends Arg

  final case class Instance(template: String, args: Seq[Arg],
      expander: Option[String])

  final case class Template(iri: String, params: Seq[Parameter],
      instances: Seq[Instance], annotations: Seq[Instance] = Nil)

  final case class Document(templates: Map[String, Template])

  def parse(text: String): Document =
    inferTypes(new StottrParser(SparqlParser.tokenize(text)).parse())

  /** Parse several stOttr documents into one (reference Mapping::from_strs). */
  def parseAll(texts: Seq[String]): Document =
    inferTypes(Document(texts.map(t =>
      new StottrParser(SparqlParser.tokenize(t)).parse())
      .flatMap(_.templates).toMap))

  // ------------------------------------------------- LUB type inference
  /** Least-upper-bound template type inference
    * (reference mapper/src/templates.rs:173-344): repeatedly propagate
    * callee parameter types onto caller parameters bound by variable
    * arguments, unifying with LUB, until no template changes. A variable
    * passed list-expanded (`++?v`) to a parameter of type T implies
    * `NEList<T>` (or `List<T>` when the callee parameter is optional).
    */
  def inferTypes(doc: Document): Document = {
    var templates = doc.templates
    var changed = true
    var rounds = 0
    while (changed) {
      changed = false
      rounds += 1
      if (rounds > 100) throw new IllegalArgumentException(
        "template type inference did not converge (cyclic incompatible types?)")
      templates = templates.map { case (iri, t) =>
        var params = t.params
        t.instances.foreach { inst =>
          templates.get(inst.template).foreach { callee =>
            if (inst.args.size != callee.params.size)
              throw new IllegalArgumentException(
                s"${t.iri} calls ${callee.iri} with ${inst.args.size} args, " +
                  s"expected ${callee.params.size}")
            inst.args.zip(callee.params).foreach {
              case (arg, calleeParam) if calleeParam.ptype.isDefined =>
                val (varName, implied) = arg match {
                  case AVar(v) => (Some(v), calleeParam.ptype.get)
                  case AListVar(v) =>
                    val inner = calleeParam.ptype.get
                    (Some(v),
                      if (calleeParam.optional) PList(inner) else PNEList(inner))
                  case _ => (None, calleeParam.ptype.get)
                }
                varName.foreach { v =>
                  params = params.map { p =>
                    if (p.name != v) p
                    else p.ptype match {
                      case None => changed = true; p.copy(ptype = Some(implied))
                      case Some(cur0) =>
                        val l = lub(t.iri, v, cur0, implied)
                        if (l != cur0) { changed = true; p.copy(ptype = Some(l)) }
                        else p
                    }
                  }
                }
              case _ =>
            }
          }
        }
        iri -> t.copy(params = params)
      }
    }
    Document(templates)
  }

  /** LUB of two parameter types (reference templates.rs lub()): equal types
    * join trivially; List/NEList of joinable inners join (NEList wins);
    * anything else is a typing error. */
  def lub(template: String, variable: String, left: PType, right: PType): PType =
    (left, right) match {
      case (l, r) if l == r => l
      case (PNEList(li), PList(ri)) => PNEList(lub(template, variable, li, ri))
      case (PNEList(li), PNEList(ri)) => PNEList(lub(template, variable, li, ri))
      case (PList(li), PNEList(ri)) => PNEList(lub(template, variable, li, ri))
      case (PList(li), PList(ri)) => PList(lub(template, variable, li, ri))
      case (l, r) => throw new IllegalArgumentException(
        s"incompatible types for ?$variable in $template: " +
          s"${PType.render(l)} vs ${PType.render(r)}")
    }

  // ---------------------------------------------------------------- parser
  private final class StottrParser(tokens: Vector[Tok]) {
    private var pos = 0
    private var anonBlank = 0
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
    private def isPunct(p: String): Boolean = cur match {
      case TPunct(v) => v == p
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
      // annotation list: @@ instance (, @@ instance)* between ']' and '::'
      val annotations = ArrayBuffer.empty[Instance]
      var moreAnn = isPunct("@")
      while (moreAnn) {
        eatPunct("@"); eatPunct("@")
        annotations += parseInstance()
        moreAnn = tryPunct(",") // grammar: comma-separated annotation list
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
      Template(iri, params.toSeq, instances.toSeq, annotations.toSeq)
    }

    private def parseParameter(): Parameter = {
      // modes: '?' optional, '!' non-blank, in either order (nom_parsing.rs:234)
      var optional = false
      var nonBlank = false
      var done = false
      while (!done) {
        if (tryPunct("?")) optional = true
        else if (tryPunct("!")) nonBlank = true
        else done = true
      }
      val ptype = cur match {
        case TWord(w) if Set("List", "NEList", "LUB").contains(w) => Some(parsePType())
        case TPName(_, l) if l.nonEmpty => Some(parsePType())
        case TIri(_) => Some(parsePType())
        case _ => None
      }
      val name = cur match {
        case TVar(v) => advance(); v
        case t => fail(s"expected parameter var, got $t")
      }
      // default value: '=' constant term (nom_parsing.rs:315)
      val default = if (tryPunct("=")) Some(parseArg()) else None
      Parameter(name, ptype, optional, nonBlank, default)
    }

    /** `List<T>` / `NEList<T>` / `LUB<basic>` / prefixed-or-full basic IRI.
      * The shared lexer may fuse `<xsd:string>` into one TIri token (no
      * whitespace before '>'), so both spellings are handled. */
    private def parsePType(): PType = cur match {
      case TWord(w) if Set("List", "NEList", "LUB").contains(w) =>
        advance()
        val inner = cur match {
          case TPunct("<") => advance(); val i = parsePType(); eatPunct(">"); i
          case TIri(txt) => advance(); basicFromText(txt)
          case t => fail(s"expected <type> after $w, got $t")
        }
        w match {
          case "List" => PList(inner)
          case "NEList" => PNEList(inner)
          case "LUB" => PLub(inner)
        }
      case TPName(_, _) | TIri(_) => PBasic(parseIriRef())
      case t => fail(s"expected parameter type, got $t")
    }

    private def basicFromText(txt: String): PType =
      if (txt.startsWith("http://") || txt.startsWith("https://") || txt.startsWith("urn:"))
        PBasic(txt)
      else txt.split(":", 2) match {
        case Array(p, l) => PBasic(resolve(p, l))
        case _ => fail(s"cannot resolve type '$txt'")
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
      case TPName("_", l) => advance(); ABlank(l) // _:label blank node
      case TPunct("[") => // anonymous blank node '[]' (nom_parsing.rs:380)
        advance(); eatPunct("]")
        anonBlank += 1
        ABlank(s"AnonymousBlankNode$anonBlank")
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
      case TPunct("(") => // constant list without expansion marker
        advance()
        val items = ArrayBuffer.empty[Arg]
        if (!tryPunct(")")) {
          var more = true
          while (more) { items += parseArg(); more = tryPunct(",") }
          eatPunct(")")
        }
        AList(items.toSeq)
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
      case TWord(w) if w == "none" => advance(); ANone // explicit no-value
      case t => fail(s"unexpected argument token $t")
    }
  }
}
