package graft.algebra

import graft.rdf.Term

/** SPARQL SELECT algebra.
  *
  * The shape follows the spargebra algebra the reference engine walks
  * (/root/reference/hybrid/src/combiner.rs:33-86 dispatches on the same node
  * set: Bgp/Path/Join/LeftJoin/Filter/Union/Extend/Minus/Values/OrderBy/
  * Project/Distinct/Reduced/Slice/Group), but is our own minimal ADT —
  * the executor translates it to a single Spark DataFrame plan.
  */
object Algebra {

  // --------------------------------------------------------------- terms
  sealed trait VarOrTerm
  final case class V(name: String) extends VarOrTerm
  final case class T(term: Term) extends VarOrTerm

  // --------------------------------------------------------------- paths
  sealed trait Path
  final case class PLink(iri: String) extends Path
  /** Variable in predicate position (`?s ?p ?o`). */
  final case class PVar(name: String) extends Path
  final case class PInverse(p: Path) extends Path
  final case class PSeq(a: Path, b: Path) extends Path
  final case class PAlt(a: Path, b: Path) extends Path
  final case class PZeroOrMore(p: Path) extends Path
  final case class POneOrMore(p: Path) extends Path
  final case class PZeroOrOne(p: Path) extends Path
  /** Negated property set `!(iri1 | ^iri2 | …)`: matches any predicate NOT
    * in the forward set (s→o) plus any not in the inverse set (o→s). */
  final case class PNegatedPropSet(fwd: Seq[String], inv: Seq[String]) extends Path

  final case class TriplePattern(s: VarOrTerm, p: Path, o: VarOrTerm)

  // --------------------------------------------------------- expressions
  sealed trait Expr
  final case class EVar(name: String) extends Expr
  final case class ETerm(term: Term) extends Expr
  final case class ENot(e: Expr) extends Expr
  final case class EAnd(l: Expr, r: Expr) extends Expr
  final case class EOr(l: Expr, r: Expr) extends Expr
  final case class ECmp(op: String, l: Expr, r: Expr) extends Expr // = != < <= > >=
  final case class EArith(op: Char, l: Expr, r: Expr) extends Expr // + - * /
  final case class ENeg(e: Expr) extends Expr
  final case class EIn(e: Expr, list: Seq[Expr], negated: Boolean) extends Expr
  final case class EFunc(name: String, args: Seq[Expr]) extends Expr
  final case class EIf(c: Expr, t: Expr, f: Expr) extends Expr
  final case class ECoalesce(args: Seq[Expr]) extends Expr
  final case class EBound(v: String) extends Expr
  final case class EExists(pattern: Pattern, negated: Boolean) extends Expr
  /** An aggregate call inside a projection/HAVING/ORDER BY expression. */
  final case class EAgg(agg: Aggregate) extends Expr

  final case class Aggregate(
      fn: String, // count | sum | avg | min | max | group_concat | sample | nest
      expr: Option[Expr], // None = COUNT(*)
      distinct: Boolean,
      separator: Option[String])

  // ------------------------------------------------------------ patterns
  sealed trait Pattern
  final case class Bgp(triples: Seq[TriplePattern]) extends Pattern
  final case class Join(l: Pattern, r: Pattern) extends Pattern
  final case class LeftJoin(l: Pattern, r: Pattern, cond: Option[Expr]) extends Pattern
  final case class Filter(expr: Expr, inner: Pattern) extends Pattern
  final case class Union(l: Pattern, r: Pattern) extends Pattern
  final case class Minus(l: Pattern, r: Pattern) extends Pattern
  final case class Extend(inner: Pattern, v: String, expr: Expr) extends Pattern
  /** `GRAPH ?g { … }` / `GRAPH <iri> { … }` — evaluate `inner` against one
    * named graph (constant) or each named graph, binding the variable.
    * Beyond-parity: the reference parses SELECT over the default graph only. */
  final case class GraphPat(g: VarOrTerm, inner: Pattern) extends Pattern
  /** `SERVICE [SILENT] <endpoint> { … }` (SPARQL 1.1 Federated Query) —
    * evaluate `inner` against the endpoint's dataset and join on shared
    * variables. The reference `todo!()`s SERVICE outright
    * (hybrid/src/combiner.rs:453-455); this engine evaluates it in-process
    * against a registered second [[graft.graph.TriplesGraph]] — the
    * federation semantics without HTTP (the executor seam takes any
    * endpoint-IRI → graph registry). */
  final case class ServicePat(endpoint: VarOrTerm, inner: Pattern,
      silent: Boolean) extends Pattern
  final case class ValuesPattern(vars: Seq[String], rows: Seq[Seq[Option[Term]]])
      extends Pattern
  /** A nested SELECT (sub-query). */
  final case class SubSelect(query: SelectQuery) extends Pattern

  final case class OrderKey(expr: Expr, asc: Boolean)

  /** One projection item: a plain variable or (expr AS ?v). */
  final case class ProjItem(v: String, expr: Option[Expr])

  /** FROM / FROM NAMED dataset clause (SPARQL 1.1 §13.2): when present, the
    * query's dataset REPLACES the store's — the default graph becomes the
    * merge (set union) of the `defaults` named graphs, and GRAPH ranges
    * only over `named`. The reference rejects dataset clauses outright
    * (splitter.rs:33-69); beyond-parity surface. */
  final case class DatasetClause(defaults: Seq[String], named: Seq[String])

  /** Any parsed SPARQL query form. The reference accepts only SELECT
    * (splitter.rs:33-69); ASK and CONSTRUCT are beyond-parity surface. */
  sealed trait SparqlQuery

  // -------------------------------------------------- SPARQL 1.1 Update

  /** One template/data block of an update: triples plus an optional graph
    * designator (None = default graph; a variable only in WHERE-driven
    * templates). */
  final case class QuadBlock(graph: Option[VarOrTerm], triples: Seq[TriplePattern])

  /** One update operation (SPARQL 1.1 Update §3). The reference engine is
    * read-only (no update entry point anywhere in hybrid/src); this is
    * beyond-parity surface, executed functionally — an update maps an
    * immutable [[graft.graph.TriplesGraph]] to a new one. */
  sealed trait UpdateOp
  /** INSERT DATA { quads }: ground triples, no variables (§3.1.1). */
  final case class InsertDataOp(quads: Seq[QuadBlock]) extends UpdateOp
  /** DELETE DATA { quads }: ground triples, no variables/bnodes (§3.1.2). */
  final case class DeleteDataOp(quads: Seq[QuadBlock]) extends UpdateOp
  /** DELETE {} INSERT {} WHERE {} (§3.1.3), covering the DELETE WHERE
    * shorthand (delete = where's triples), WITH (default graph for the
    * templates and — unless overridden — the WHERE pattern), and
    * USING / USING NAMED (a FROM/FROM NAMED-style dataset for the WHERE
    * pattern only; when present, WITH no longer scopes the WHERE). */
  final case class ModifyOp(delete: Seq[QuadBlock], insert: Seq[QuadBlock],
      where: Pattern, withIri: Option[String] = None,
      using: Option[DatasetClause] = None) extends UpdateOp
  sealed trait ClearTarget
  case object ClearDefault extends ClearTarget
  case object ClearNamed extends ClearTarget
  case object ClearAll extends ClearTarget
  final case class ClearGraph(iri: String) extends ClearTarget
  /** CLEAR [SILENT] DEFAULT|NAMED|ALL|GRAPH <iri> (§3.2.2; DROP behaves
    * identically in a store without empty-graph bookkeeping, so the parser
    * accepts both words). */
  final case class ClearOp(target: ClearTarget, silent: Boolean) extends UpdateOp

  /** Graph selector for the graph-management ops: the default graph or one
    * named graph. */
  sealed trait GraphRef
  case object GraphDefault extends GraphRef
  final case class GraphIri(iri: String) extends GraphRef
  /** ADD / COPY / MOVE [SILENT] src TO dst (§3.2.3–3.2.5): ADD inserts
    * src's triples into dst (src kept, set semantics); COPY replaces dst
    * with src; MOVE is COPY followed by dropping src. src = dst is a
    * no-op for all three per spec. */
  sealed trait TransferKind
  case object TransferAdd extends TransferKind
  case object TransferCopy extends TransferKind
  case object TransferMove extends TransferKind
  final case class TransferOp(kind: TransferKind, src: GraphRef,
      dst: GraphRef, silent: Boolean) extends UpdateOp
  /** CREATE [SILENT] GRAPH <iri> (§3.2.1): a store without empty-graph
    * bookkeeping represents every absent graph as empty, so CREATE is a
    * semantic no-op — accepted for round-trip compatibility. */
  final case class CreateGraphOp(iri: String, silent: Boolean) extends UpdateOp
  /** LOAD [SILENT] <doc> [INTO GRAPH <g>] (§3.1.4): parse the N-Triples /
    * N-Quads document at `source` (a file: IRI or plain path; no remote
    * schemes in this engine) and insert its triples — all into `into` when
    * given, else into each quad's own graph (default graph for triples).
    * SILENT turns any read/parse failure into a no-op. */
  final case class LoadOp(source: String, into: Option[String],
      silent: Boolean) extends UpdateOp

  /** A ';'-separated update request: ops apply in sequence, each over the
    * graph produced by the previous one (§3). */
  final case class UpdateRequest(ops: Seq[UpdateOp])

  /** ASK { pattern }: does the pattern have at least one solution? */
  final case class AskQuery(where: Pattern) extends SparqlQuery

  /** CONSTRUCT { template } WHERE { pattern }: instantiate the template
    * triples once per solution; unbound template variables skip the triple
    * (SPARQL 1.1 §16.2). */
  final case class ConstructQuery(template: Seq[TriplePattern], where: Pattern)
      extends SparqlQuery

  /** DESCRIBE r1 r2 … [WHERE { pattern }]: SPARQL leaves the description
    * implementation-defined (§16.4); this engine returns every outbound
    * triple of each described resource (constants plus the bindings of
    * described variables). */
  final case class DescribeQuery(resources: Seq[VarOrTerm],
      where: Option[Pattern]) extends SparqlQuery

  final case class SelectQuery(
      projection: Seq[ProjItem], // empty = SELECT *
      distinct: Boolean,
      reduced: Boolean,
      where: Pattern,
      groupBy: Seq[ProjItem], // GROUP BY ?v or GROUP BY (expr AS ?v)
      having: Option[Expr],
      orderBy: Seq[OrderKey],
      limit: Option[Long],
      offset: Option[Long],
      dataset: Option[DatasetClause] = None) extends SparqlQuery {

    def hasAggregates: Boolean = {
      def exprHas(e: Expr): Boolean = e match {
        case EAgg(_) => true
        case ENot(x) => exprHas(x)
        case EAnd(l, r) => exprHas(l) || exprHas(r)
        case EOr(l, r) => exprHas(l) || exprHas(r)
        case ECmp(_, l, r) => exprHas(l) || exprHas(r)
        case EArith(_, l, r) => exprHas(l) || exprHas(r)
        case ENeg(x) => exprHas(x)
        case EIn(x, list, _) => exprHas(x) || list.exists(exprHas)
        case EFunc(_, args) => args.exists(exprHas)
        case EIf(c, t, f) => exprHas(c) || exprHas(t) || exprHas(f)
        case ECoalesce(args) => args.exists(exprHas)
        case _ => false
      }
      groupBy.nonEmpty || having.nonEmpty ||
        projection.exists(_.expr.exists(exprHas)) ||
        orderBy.exists(k => exprHas(k.expr))
    }
  }

  /** All variables syntactically bound by a pattern (used for join-key
    * discovery and SELECT-* expansion). */
  def boundVars(p: Pattern): Set[String] = p match {
    case Bgp(ts) =>
      ts.flatMap { t =>
        val so = Seq(t.s, t.o).collect { case V(n) => n }
        t.p match { case PVar(n) => so :+ n; case _ => so }
      }.toSet
    case Join(l, r) => boundVars(l) ++ boundVars(r)
    case LeftJoin(l, r, _) => boundVars(l) ++ boundVars(r)
    case Filter(_, inner) => boundVars(inner)
    case Union(l, r) => boundVars(l) ++ boundVars(r)
    case Minus(l, _) => boundVars(l)
    case Extend(inner, v, _) => boundVars(inner) + v
    case GraphPat(g, inner) =>
      boundVars(inner) ++ (g match { case V(v) => Set(v); case _ => Set.empty })
    // the endpoint variable is NOT bound by SERVICE (§2.3: its bindings
    // must come from elsewhere in the query)
    case ServicePat(_, inner, _) => boundVars(inner)
    case ValuesPattern(vars, _) => vars.toSet
    case SubSelect(q) =>
      if (q.projection.isEmpty) boundVars(q.where) else q.projection.map(_.v).toSet
  }
}
