package graft.exec

import graft.algebra.Algebra._
import graft.graph.TriplesGraph
import graft.rdf.{Blank, Iri, Lit, Term}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** SPARQL 1.1 Update over immutable graphs — each operation maps a
  * [[TriplesGraph]] to a NEW one (this is the idiomatic Spark spelling of
  * mutation: DataFrames are immutable, so an update is a functional delta,
  * exactly like a Delta-Lake/Iceberg commit producing a new snapshot). The
  * reference engine is read-only (no update entry point in hybrid/src;
  * spargebra's Update types are never constructed) — beyond-parity surface.
  *
  * Covered: INSERT DATA / DELETE DATA (ground quads, GRAPH blocks), DELETE
  * WHERE, [WITH g] DELETE/INSERT…WHERE (templates may use GRAPH <iri> and
  * GRAPH ?var; INSERT templates may mint blank nodes), CLEAR/DROP
  * DEFAULT|NAMED|ALL|GRAPH. Semantics: the WHERE pattern is evaluated ONCE
  * against the pre-update graph, deletes apply before inserts (§3.1.3), and
  * ';'-separated operations see each predecessor's result.
  *
  * Scale: template instantiation and the per-slice anti-join/union deltas
  * are fully distributed ([[TriplesGraph.applyDelta]]); driver work is
  * bounded by the query text (ground DATA rows) plus one vocabulary-sized
  * touched-predicate collect. */
object SparqlUpdate {

  def execute(graph: TriplesGraph, sparql: String): TriplesGraph =
    execute(graph, graft.parser.SparqlParser.parseUpdate(sparql))

  def execute(graph: TriplesGraph, req: UpdateRequest): TriplesGraph =
    req.ops.foldLeft(graph)(applyOp)

  def applyOp(graph: TriplesGraph, op: UpdateOp): TriplesGraph = op match {
    case InsertDataOp(quads) =>
      graph.applyDelta(emptyDelta(graph.spark),
        groundFrame(graph.spark, quads, allowBnodes = true))
    case DeleteDataOp(quads) =>
      graph.applyDelta(groundFrame(graph.spark, quads, allowBnodes = false),
        emptyDelta(graph.spark))
    case ModifyOp(del, ins, where, withIri, using) =>
      val ex = new SparqlExecutor(graph)
      // one WHERE evaluation feeds both templates (§3.1.3), under the
      // USING dataset when present; checkpoint only when both sides
      // actually consume it
      val sol0 = ex.solutions(where, using)
      val sol = if (del.nonEmpty && ins.nonEmpty) sol0.localCheckpoint() else sol0
      def resolved(blocks: Seq[QuadBlock]): Seq[QuadBlock] = blocks.map { b =>
        if (b.graph.isDefined) b
        else b.copy(graph = withIri.map(g => T(Iri(g)): VarOrTerm))
      }
      val delF =
        if (del.isEmpty) emptyDelta(graph.spark)
        else ex.instantiateQuads(sol, resolved(del), allowBnodes = false)
      val insF =
        if (ins.isEmpty) emptyDelta(graph.spark)
        else ex.instantiateQuads(sol, resolved(ins), allowBnodes = true)
      graph.applyDelta(delF, insF)
    case TransferOp(kind, src, dst, _) =>
      def sel(r: GraphRef): Option[String] = r match {
        case GraphDefault => None
        case GraphIri(i) => Some(i)
      }
      val (s, d) = (sel(src), sel(dst))
      // graph existence isn't tracked separately from contents, so the
      // non-SILENT missing-source error cannot arise (empty ≡ absent, same
      // documented coincidence as CLEAR/DROP); src == dst is a spec no-op
      kind match {
        case TransferAdd => graph.transferGraph(s, d,
          keepSrc = true, replaceDst = false)
        case TransferCopy => graph.transferGraph(s, d,
          keepSrc = true, replaceDst = true)
        case TransferMove => graph.transferGraph(s, d,
          keepSrc = false, replaceDst = true)
      }
    // CREATE GRAPH is a semantic no-op here: every absent graph already
    // behaves as empty (§3.2.1 allows stores that need no bookkeeping)
    case CreateGraphOp(_, _) => graph
    case LoadOp(source, into, silent) =>
      // the parse is distributed (NTriples.read — map-only over text
      // splits); only the applyDelta metadata aggregates are driver-sized.
      // Inserts flow through the SAME delta path as INSERT DATA, so typed
      // slices cast lexicals identically; a brand-new predicate lands as
      // a string-kind slice (applyDelta's documented v1 rule) — use
      // NTriples.toGraph for fully-typed bulk construction.
      try {
        val path = {
          val u = new java.net.URI(source)
          if (u.getScheme == "file") u.getPath
          else if (u.getScheme == null) source
          else throw new IllegalArgumentException(
            s"LOAD supports file: IRIs / local paths only, got $source")
        }
        import org.apache.spark.sql.functions.{col, lit}
        val parsed = graft.sources.NTriples.read(graph.spark, path)
        val ins = parsed.select(col("s"), col("p"), col("o_lex").as("o"),
          into.map(lit(_)).getOrElse(col("g")).as("g"),
          col("o_lang").as("ol"))
        // force the lazy parse inside the try: SILENT must observe read/
        // parse failures here, not rely on applyDelta happening to be
        // eager (it localCheckpoints today, but that's an implementation
        // detail of the delta path, not this contract)
        val materialized = ins.localCheckpoint(true)
        graph.applyDelta(emptyDelta(graph.spark), materialized)
      } catch {
        // NonFatal only: swallowing OutOfMemoryError / InterruptedException
        // under SILENT would hide fatal JVM state, not a LOAD failure
        case scala.util.control.NonFatal(_) if silent => graph
      }
    case ClearOp(target, _) => target match {
      // graph existence isn't tracked separately from contents, so CLEAR
      // and CLEAR SILENT coincide (documented; DROP is accepted as CLEAR)
      case ClearDefault => graph.clearDefault()
      case ClearNamed => graph.clearNamed()
      case ClearAll => graph.clearAll()
      case ClearGraph(iri) => graph.clearGraph(iri)
    }
  }

  private val deltaSchema = StructType(
    Seq("s", "p", "o", "g", "ol").map(StructField(_, StringType)))

  private def emptyDelta(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], deltaSchema)

  /** Ground DATA quads → canonical quad frame. Driver-side by construction:
    * the rows are literal query text, bounded by the update string. */
  private def groundFrame(spark: SparkSession, quads: Seq[QuadBlock],
      allowBnodes: Boolean): DataFrame = {
    val rows = quads.flatMap { b =>
      val g: String = b.graph match {
        case Some(T(Iri(v))) => v
        case None => null
        case other => throw new IllegalArgumentException(
          s"DATA operations need a constant graph, got $other")
      }
      b.triples.map { t =>
        val s = constTerm(t.s, "subject", allowBnodes).canonical
        val p = t.p match {
          case PLink(iri) => iri
          case other => throw new IllegalArgumentException(
            s"DATA operations need constant predicates, got $other")
        }
        val o = constTerm(t.o, "object", allowBnodes)
        val ol: String = o match {
          case Lit(_, _, Some(lang)) => lang
          case _ => null
        }
        Row(s, p, o.canonical, g, ol)
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), deltaSchema)
  }

  private def constTerm(vt: VarOrTerm, what: String,
      allowBnodes: Boolean): Term = vt match {
    case T(t @ (Iri(_) | Lit(_, _, _))) => t
    // legal in INSERT DATA only (a fixed skolem label here); SPARQL 1.1
    // Update §3.1.2 forbids blank nodes in DELETE DATA — they could never
    // match a stored triple, so the spec makes them a syntax error
    case T(b: Blank) if allowBnodes => b
    case T(Blank(id)) => throw new IllegalArgumentException(
      s"blank node _:$id is not allowed in DELETE DATA (Update §3.1.2)")
    case V(v) => throw new IllegalArgumentException(
      s"DATA operations must be ground; $what has variable ?$v")
  }
}
