package graft.dsl

import graft.algebra.Algebra._
import graft.rdf.{Iri, Lit, Otit, Rdf, Term, Xsd}

import scala.collection.mutable.ArrayBuffer

/** The reference's RDS/OPC-UA-style tag-path query language
  * (dsl/src/parser.rs, dsl/src/ast.rs — behavioral reference), re-built as a
  * small char-level parser plus a translator into our SPARQL algebra, so DSL
  * queries execute on the same engine (SURVEY §3.3: pure front-end).
  *
  * Example:
  * {{{
  * ABC-[valve]"HLV"."Mvm"."stVal" > 0.5
  * [valve]."PosPct"."mag"
  * from 2021-12-01T00:00:01+01:00
  * to 2021-12-02T00:00:01+01:00
  * group valve
  * aggregate mean 10min
  * }}}
  */
object Dsl {

  // ----------------------------------------------------------------- AST
  final case class PathElement(glue: Option[String], typeName: Option[String],
      name: Option[String])
  final case class DslPath(elements: Seq[PathElement], connectives: Seq[String])
  final case class ConditionedPath(path: DslPath, op: Option[String],
      literal: Option[Term], optional: Boolean = false)
  final case class TsDslQuery(paths: Seq[ConditionedPath], group: Seq[String],
      from: Option[java.time.Instant], to: Option[java.time.Instant],
      aggregation: Option[(String, Long)]) // (fn, bucketSeconds)

  // -------------------------------------------------------------- parser
  def parse(text: String): TsDslQuery = {
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    val paths = ArrayBuffer.empty[ConditionedPath]
    var group = Seq.empty[String]
    var from: Option[java.time.Instant] = None
    var to: Option[java.time.Instant] = None
    var agg: Option[(String, Long)] = None
    lines.foreach { line =>
      val lower = line.toLowerCase
      if (lower.startsWith("from ")) from = Some(parseInstant(line.drop(5).trim))
      else if (lower.startsWith("to ")) to = Some(parseInstant(line.drop(3).trim))
      else if (lower.startsWith("group ")) group = line.drop(6).trim.split("[,\\s]+").toSeq
      else if (lower.startsWith("aggregate ")) {
        val parts = line.drop(10).trim.split("\\s+")
        agg = Some((parts(0), parseDuration(parts(1))))
      } else paths += parseConditionedPath(line)
    }
    TsDslQuery(paths.toSeq, group, from, to, agg)
  }

  private def parseInstant(s: String): java.time.Instant =
    java.time.OffsetDateTime.parse(s).toInstant

  private def parseDuration(s: String): Long = {
    val m = "(\\d+)(s|sec|min|m|h|hour)".r
    s.toLowerCase match {
      case m(n, unit) => unit match {
        case "s" | "sec" => n.toLong
        case "min" | "m" => n.toLong * 60
        case _ => n.toLong * 3600
      }
      case other => throw new IllegalArgumentException(s"bad duration '$other'")
    }
  }

  private def parseConditionedPath(line0: String): ConditionedPath = {
    // a trailing '?' (reference questionable_path) marks the path OPTIONAL
    val (line, optional) =
      if (line0.trim.endsWith("?")) (line0.trim.dropRight(1).trim, true)
      else (line0.trim, false)
    // split off a trailing condition: <path> <op> <literal>; `like` needs
    // surrounding whitespace (it is a word, not a symbol — reference
    // dsl/src/parser.rs:163 boolean_operator)
    val likeRe = "(?i)(.*?)\\s+(like)\\s+(\\S+)\\s*$".r
    val condRe = "(.*?)\\s*(>=|<=|!=|=|>|<)\\s*(\\S+)\\s*$".r
    line match {
      case likeRe(p, op, litStr) =>
        ConditionedPath(parsePath(p.trim), Some(op.toLowerCase), Some(parseLiteral(litStr)), optional)
      case condRe(p, op, litStr) if !p.endsWith("\"") || litLike(litStr) =>
        ConditionedPath(parsePath(p.trim), Some(op), Some(parseLiteral(litStr)), optional)
      case _ => ConditionedPath(parsePath(line), None, None, optional)
    }
  }

  private def litLike(s: String): Boolean =
    s == "true" || s == "false" || s.headOption.exists(c => c.isDigit || c == '-' || c == '"')

  private def parseLiteral(s: String): Term =
    if (s == "true" || s == "false") Lit(s, Xsd.boolean)
    else if (s.startsWith("\"")) Lit(s.stripPrefix("\"").stripSuffix("\""), Xsd.string)
    else if (s.contains('.')) Lit(s, Xsd.double)
    else Lit(s, Xsd.integer)

  private val connectiveChars = Set('.', ';', '-', '/', '\\')

  def parsePath(s: String): DslPath = {
    val elements = ArrayBuffer.empty[PathElement]
    val connectives = ArrayBuffer.empty[String]
    var i = 0
    def parseElement(): PathElement = {
      var glue: Option[String] = None
      var typeName: Option[String] = None
      var name: Option[String] = None
      var more = true
      while (more && i < s.length) {
        val c = s(i)
        if (c == '[') {
          val j = s.indexOf(']', i)
          glue = Some(s.substring(i + 1, j)); i = j + 1
        } else if (c == '"') {
          val j = s.indexOf('"', i + 1)
          name = Some(s.substring(i + 1, j)); i = j + 1
        } else if (c.isLetterOrDigit || c == '_') {
          val start = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          typeName = Some(s.substring(start, i))
        } else more = false
      }
      PathElement(glue, typeName, name)
    }
    elements += parseElement()
    while (i < s.length && connectiveChars.contains(s(i))) {
      val c = s(i)
      val start = i
      while (i < s.length && s(i) == c) i += 1
      connectives += s.substring(start, i)
      elements += parseElement()
    }
    DslPath(elements.toSeq, connectives.toSeq)
  }

  // ---------------------------------------------------------- translator
  /** Maps a connective spelling (".", "--", "-", …) to the predicate IRI it
    * traverses (reference: dsl/src/connective_mapping.rs). */
  final case class TranslatorConfig(
      connectiveMapping: Map[String, String],
      namePredicate: String,
      typeNamePredicate: String)

  final class Translator(config: TranslatorConfig) {
    private var counter = 0
    private def fresh(prefix: String): String = { counter += 1; s"${prefix}_$counter" }

    /** Translate to our SPARQL algebra; executing the result on a
      * [[graft.exec.SparqlExecutor]] runs the DSL query end-to-end. */
    def translate(q: TsDslQuery): SelectQuery = {
      val filters = ArrayBuffer.empty[Expr]
      val valueVars = ArrayBuffer.empty[String]
      val glueVars = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val tsVar = "timestamp"

      // one triple buffer per path; optional paths become LeftJoins
      // (reference translator.rs:113-170 add_optional_parts)
      case class Part(triples: Seq[TriplePattern], cond: Option[Expr], optional: Boolean)
      val parts = q.paths.zipWithIndex.map { case (cp, pi) =>
        val triples = ArrayBuffer.empty[TriplePattern]
        var prev: Option[String] = None
        cp.path.elements.zipWithIndex.foreach { case (el, ei) =>
          val v = el.glue match {
            case Some(g) => glueVars.getOrElseUpdate(g, g)
            case None => fresh(s"p${pi}e$ei")
          }
          el.typeName.foreach { tn =>
            val tv = fresh(s"${v}_type")
            triples += TriplePattern(V(v), PLink(Rdf.typ), V(tv))
            triples += TriplePattern(V(tv), PLink(config.typeNamePredicate),
              T(Lit(tn, Xsd.string)))
          }
          el.name.foreach { n =>
            triples += TriplePattern(V(v), PLink(config.namePredicate),
              T(Lit(n, Xsd.string)))
          }
          prev.foreach { p =>
            val conn = cp.path.connectives(ei - 1)
            val pred = config.connectiveMapping.getOrElse(conn,
              throw new IllegalArgumentException(s"unmapped connective '$conn'"))
            triples += TriplePattern(V(p), PLink(pred), V(v))
          }
          prev = Some(v)
        }
        // terminal element carries the time series
        val last = prev.get
        val series = fresh(s"${last}_ts")
        val dp = fresh(s"${last}_dp")
        val value = s"value_$pi"
        valueVars += value
        triples += TriplePattern(V(last), PLink(Otit.hasTimeseries), V(series))
        triples += TriplePattern(V(series), PLink(Otit.hasDataPoint), V(dp))
        triples += TriplePattern(V(dp), PLink(Otit.hasTimestamp), V(tsVar))
        triples += TriplePattern(V(dp), PLink(Otit.hasValue), V(value))
        val cond = (cp.op, cp.literal) match {
          case (Some("like"), Some(lit)) =>
            // reference lowers LIKE to the custom otit_swt#like function
            // (dsl/src/translator/graph_pattern.rs:235); here it executes as
            // a regex match on the value
            Some(EFunc(Otit.like, Seq(EVar(value), ETerm(lit))))
          case (Some(op), Some(lit)) => Some(ECmp(op, EVar(value), ETerm(lit)))
          case _ => None
        }
        Part(triples.toSeq, cond, cp.optional)
      }
      val (optional, required) = parts.partition(_.optional)
      required.flatMap(_.cond).foreach(filters += _)
      q.from.foreach(f => filters += ECmp(">=", EVar(tsVar),
        ETerm(Lit(instantLex(f), Xsd.dateTime))))
      q.to.foreach(t => filters += ECmp("<=", EVar(tsVar),
        ETerm(Lit(instantLex(t), Xsd.dateTime))))

      val requiredBgp: Pattern = Bgp(required.flatMap(_.triples))
      val filtered: Pattern = filters.foldLeft(requiredBgp)((p, e) => Filter(e, p))
      val base: Pattern = optional.foldLeft(filtered)((acc, part) =>
        LeftJoin(acc, Bgp(part.triples), part.cond))

      q.aggregation match {
        case Some((fn, seconds)) =>
          // the reference's seconds-epoch floor-div bucket
          // (dsl/src/translator/aggregation.rs:12)
          val bucketExpr = EArith('*',
            EFunc(Xsd.integer, Seq(EFunc("floor", Seq(EArith('/',
              EFunc(Otit.dateTimeAsSeconds, Seq(EVar(tsVar))),
              ETerm(Lit(seconds.toString + ".0", Xsd.double))))))),
            ETerm(Lit(seconds.toString, Xsd.integer)))
          val aggFn = fn.toLowerCase match {
            case "mean" => "avg"
            case other => other
          }
          val proj = q.group.map(g => ProjItem(g, None)) ++
            Seq(ProjItem("ts_bucket", None)) ++
            valueVars.map(v => ProjItem(s"${v}_$aggFn",
              Some(EAgg(Aggregate(aggFn, Some(EVar(v)), distinct = false, None)))))
          SelectQuery(proj, distinct = false, reduced = false,
            where = Extend(base, "ts_bucket", bucketExpr),
            groupBy = q.group.map(g => ProjItem(g, None)) :+ ProjItem("ts_bucket", None),
            having = None,
            orderBy = (q.group :+ "ts_bucket").map(v => OrderKey(EVar(v), asc = true)),
            limit = None, offset = None)
        case None =>
          val proj = (q.group ++ glueVars.values.filterNot(q.group.contains)).distinct
            .map(g => ProjItem(g, None)) ++
            valueVars.map(v => ProjItem(v, None)) :+ ProjItem(tsVar, None)
          SelectQuery(proj, distinct = false, reduced = false, where = base,
            groupBy = Nil, having = None,
            orderBy = proj.map(p => OrderKey(EVar(p.v), asc = true)),
            limit = None, offset = None)
      }
    }

    private def instantLex(i: java.time.Instant): String =
      java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC).toString
  }
}
