package graft.mapper

import graft.graph.{OKind, PredicateSlice, TriplesGraph}
import graft.rdf._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OTTR template expansion over DataFrames → RDF triples.
  *
  * The dataflow mirrors the reference mapper's lifecycle
  * (mapper/src/mapping.rs:245-317: validate → recurse to ottr:Triple leaves
  * → concatenate into the store), re-expressed as Spark column transforms:
  * each ottr:Triple leaf is a `select` over the input frame, list expanders
  * are `explode`, nested template calls are column renames — all lazy, so a
  * whole document expands into one union plan that scales with the input.
  *
  * The expanded store doubles as a queryable [[TriplesGraph]], which is the
  * engine's native fixture-ingest path (SURVEY §3.2).
  */
final class Mapping(doc: Stottr.Document, spark: SparkSession) {

  import Stottr._

  /** Accumulated triples: s, p, o_lex, o_dt (null = IRI object), o_lang. */
  private var store: Option[DataFrame] = None

  private val tripleSchema = StructType(Seq(
    StructField("s", StringType), StructField("p", StringType),
    StructField("o_lex", StringType), StructField("o_dt", StringType),
    StructField("o_lang", StringType)))

  def triplesDf: DataFrame = store.getOrElse(
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      tripleSchema))

  /** IRI minting for parameters absent from the input frame (reference
    * ExpandOptions.mint_iris + MintingOptions, mapper/src/mapping/mint.rs):
    * numbered IRIs `prefix + (startAt + rowIndex)` in key order. */
  final case class MintingOptions(prefix: String, startAt: Long)

  /** Minted-IRI frames of the last expand, keyed by parameter name: columns
    * (Key, <param>) — the reference's report.minted_iris, usable to resolve
    * the same entities in later expands. */
  var mintedIris: Map[String, DataFrame] = Map.empty

  /** Expand `templateIri` over `df` (one column per template parameter).
    * `languageTags` optionally tags string parameters with a language
    * (reference ExpandOptions.language_tags); `mintIris` mints IRIs for
    * parameters the frame does not provide. */
  def expand(templateIri: String, df: DataFrame,
      languageTags: Map[String, String] = Map.empty,
      mintIris: Map[String, MintingOptions] = Map.empty): Unit = {
    val t = doc.templates.getOrElse(templateIri,
      throw new IllegalArgumentException(s"unknown template $templateIri"))
    var input = df
    mintIris.foreach { case (param, opts) =>
      if (!input.columns.contains(param)) {
        val keyCol = input.columns.headOption.getOrElse(
          throw new IllegalArgumentException("minting needs a key column"))
        // Global numbering in key order WITHOUT a global Window (which is a
        // single-task sort at scale): range-partition by key so partition i
        // holds strictly smaller keys than partition i+1, sort within, then
        // zipWithIndex — the index is the global key rank, computed with one
        // lightweight partition-size count job.
        val sorted = input.repartitionByRange(col(keyCol))
          .sortWithinPartitions(col(keyCol))
        val schema2 = sorted.schema.add(StructField(param, StringType))
        // capture only primitives: MintingOptions is an inner class whose
        // $outer (this Mapping, holding the SparkSession) is unserializable
        val prefix = opts.prefix
        val startAt = opts.startAt
        val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq :+ (prefix + (startAt + i).toString))
        }
        input = spark.createDataFrame(rdd, schema2)
        mintedIris += param -> input.select(col(keyCol), col(param))
      }
    }
    // declared-type validation (reference validation_inference.rs:38-137):
    // a typed parameter's column must be coercible to the declared XSD type
    t.params.foreach { p =>
      (p.ptype, input.schema.fields.find(_.name == p.name)) match {
        case (Some(Xsd.anyURI), Some(f)) if f.dataType != StringType =>
          throw new IllegalArgumentException(
            s"parameter ${p.name}: xsd:anyURI needs a string column, got ${f.dataType.simpleString}")
        case (Some(dt), Some(f)) if Xsd.numericLong(dt) =>
          if (!Seq(IntegerType, LongType, ShortType, ByteType).contains(elemType(f.dataType)))
            throw new IllegalArgumentException(
              s"parameter ${p.name}: $dt needs an integral column, got ${f.dataType.simpleString}")
        case _ =>
      }
    }
    // minted params are IRIs even without a declared xsd:anyURI type
    val t2 =
      if (mintIris.isEmpty) t
      else t.copy(params = t.params.map(p =>
        if (mintIris.contains(p.name) && p.ptype.isEmpty)
          p.copy(ptype = Some(Xsd.anyURI)) else p))
    val out = expandTemplate(t2, input, languageTags)
    store = Some(store.fold(out)(_.unionByName(out)))
  }

  private var tmpCounter = 0
  private def tmpCol(): String = { tmpCounter += 1; s"__expand$tmpCounter" }

  private def elemType(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => e
    case other => other
  }

  private def expandTemplate(t: Template, df: DataFrame,
      languageTags: Map[String, String]): DataFrame = {
    val parts = t.instances.map(i => expandInstance(t, i, df, languageTags))
    parts.reduceOption(_.unionByName(_)).getOrElse(triplesDf.limit(0))
  }

  private def expandInstance(owner: Template, inst: Instance, df0: DataFrame,
      languageTags: Map[String, String]): DataFrame = {
    // list expanders: explode list-valued args into fresh columns
    var df = df0
    val expander = inst.expander.map(_.toLowerCase)
    // zipMin/zipMax over list COLUMNS zip positionally in one arrays_zip
    // explode; cross explodes each list independently (cartesian per row)
    val zipListVars = inst.args.collect { case AListVar(v) => v }
    val zipRenames: Map[String, String] =
      if (zipListVars.nonEmpty &&
          (expander.contains("zipmin") || expander.contains("zipmax"))) {
        val z = tmpCol()
        df = df.withColumn(z, explode(arrays_zip(zipListVars.map(col): _*)))
        if (expander.contains("zipmin"))
          df = df.filter(zipListVars.map(v => col(z)(v).isNotNull).reduce(_ && _))
        zipListVars.map { v =>
          val c = tmpCol()
          df = df.withColumn(c, col(z)(v))
          v -> c
        }.toMap
      } else Map.empty
    val args = inst.args.map {
      case AListVar(v) if zipRenames.contains(v) => AVarTyped(zipRenames(v), None)
      case AListVar(v) =>
        val c = tmpCol()
        df = df.withColumn(c, explode(col(v)))
        AVarTyped(c, None)
      case AList(items) if inst.expander.isDefined =>
        val c = tmpCol()
        val arr = array(items.map {
          case ALit(l) => litColumn(l)._1
          case AIri(i) => lit(i)
          case AVar(v) => col(v)
          case other => throw new IllegalArgumentException(s"nested list $other")
        }: _*)
        df = df.withColumn(c, explode(arr))
        // element datatype: from the first literal item (constants) or var
        val elemDt = items.collectFirst { case ALit(l) => l.datatype }
        AVarTyped(c, elemDt)
      case a => a
    }
    if (inst.template == ottrTriple ||
        inst.template == "http://ns.ottr.xyz/0.4/Triple") {
      val Seq(sArg, pArg, oArg) = args
      val sCol = termColumnIri(owner, sArg)
      val pCol = termColumnIri(owner, pArg)
      val (oLex, oDt, oLang) = objectColumns(owner, oArg, df, languageTags)
      df.select(sCol.as("s"), pCol.as("p"), oLex.as("o_lex"),
        oDt.as("o_dt"), oLang.as("o_lang"))
    } else {
      val callee = doc.templates.getOrElse(inst.template,
        throw new IllegalArgumentException(s"unknown template ${inst.template}"))
      // bind callee params to caller columns/constants
      val bound = callee.params.zip(args).map { case (p, a) =>
        (a match {
          case AVar(v) => col(v)
          case AVarTyped(v, _) => col(v)
          case AIri(i) => lit(i)
          case ALit(l) => litColumn(l)._1
          case AList(items) => array(items.map {
            case ALit(l) => litColumn(l)._1
            case AIri(i) => lit(i)
            case AVar(v) => col(v)
            case other => throw new IllegalArgumentException(s"nested list $other")
          }: _*)
        }).as(p.name)
      }
      // language tags follow the caller's column names through the call
      val renamedTags = callee.params.zip(args).flatMap { case (p, a) =>
        a match {
          case AVar(v) => languageTags.get(v).map(p.name -> _)
          case _ => None
        }
      }.toMap
      expandTemplate(callee, df.select(bound: _*), renamedTags)
    }
  }

  /** Internal marker for exploded list elements carrying a datatype. */
  private case class AVarTyped(name: String, dt: Option[String]) extends Stottr.Arg

  private def litColumn(l: Lit): (Column, String) = {
    val c =
      if (Xsd.numericLong(l.datatype)) lit(l.lexical.toLong)
      else if (Xsd.numericDouble(l.datatype)) lit(l.lexical.toDouble)
      else if (l.datatype == Xsd.boolean) lit(l.lexical.toBoolean)
      else lit(l.lexical)
    (c, l.datatype)
  }

  private def paramType(owner: Template, v: String): Option[String] =
    owner.params.find(_.name == v).flatMap(_.ptype)

  private def termColumnIri(owner: Template, a: Arg): Column = a match {
    case AVar(v) => col(v)
    case AVarTyped(v, _) => col(v)
    case AIri(i) => lit(i)
    case ALit(l) => lit(l.lexical)
    case AList(_) => throw new IllegalArgumentException("list in IRI position")
  }

  private def xsdOfSpark(dt: DataType): String = dt match {
    case IntegerType => Xsd.int
    case LongType => Xsd.long
    case DoubleType => Xsd.double
    case FloatType => Xsd.float
    case BooleanType => Xsd.boolean
    case TimestampType => Xsd.dateTime
    case _ => Xsd.string
  }

  private def objectColumns(owner: Template, a: Arg, df: DataFrame,
      languageTags: Map[String, String]): (Column, Column, Column) = a match {
    case AIri(i) => (lit(i), lit(null: String), lit(null: String))
    case ALit(l) if l.lang.isDefined =>
      (lit(l.lexical), lit(null: String), lit(l.lang.get))
    case ALit(l) => (lit(l.lexical), lit(l.datatype), lit(null: String))
    case AVar(v) =>
      paramType(owner, v) match {
        case Some(Xsd.anyURI) => (col(v), lit(null: String), lit(null: String))
        case Some(t0) => (col(v).cast(StringType), lit(t0), lit(null: String))
        case None =>
          languageTags.get(v) match {
            case Some(lang) =>
              (col(v).cast(StringType), lit(null: String), lit(lang))
            case None =>
              val sparkDt = df.schema(v).dataType
              (col(v).cast(StringType), lit(xsdOfSpark(sparkDt)), lit(null: String))
          }
      }
    case AVarTyped(v, dtOpt) =>
      val dt = dtOpt.getOrElse(xsdOfSpark(df.schema.fields
        .find(_.name == v).map(_.dataType).getOrElse(StringType)))
      if (dt == Xsd.anyURI) (col(v), lit(null: String), lit(null: String))
      else (col(v).cast(StringType), lit(dt), lit(null: String))
    case AList(_) =>
      throw new IllegalArgumentException("un-expanded list in object position")
  }

  // ------------------------------------------------------------- exports
  /** One formatted N-Triples line per triple, as a codegen'd Column —
    * the distributed serialization kernel shared by [[ntriplesLines]] and
    * [[writeNTriplesDistributed]]. */
  private def ntLineCol: Column = {
    // escape backslash FIRST, then quote/newline/cr/tab (N-Triples string
    // escaping; reference streams the same per-triple formatting,
    // mapping/ntriples_write.rs:52)
    def esc(c: Column): Column = {
      val b0 = regexp_replace(c, "\\\\", "\\\\\\\\")
      val b1 = regexp_replace(b0, "\"", "\\\\\"")
      val b2 = regexp_replace(b1, "\n", "\\\\n")
      val b3 = regexp_replace(b2, "\r", "\\\\r")
      regexp_replace(b3, "\t", "\\\\t")
    }
    val o =
      when(col("o_dt").isNull && col("o_lang").isNull,
        concat(lit("<"), col("o_lex"), lit(">")))
      .when(col("o_lang").isNotNull,
        concat(lit("\""), esc(col("o_lex")), lit("\"@"), col("o_lang")))
      .otherwise(
        concat(lit("\""), esc(col("o_lex")), lit("\"^^<"), col("o_dt"), lit(">")))
    concat(lit("<"), col("s"), lit("> <"), col("p"), lit("> "), o, lit(" ."))
  }

  /** Distributed N-Triples view: one string line per triple, still lazy. */
  def ntriplesLines: DataFrame = triplesDf.select(ntLineCol.as("value"))

  /** Distributed N-Triples sink: every executor writes its partitions in
    * parallel (`text` sink) — the path a 100 TB graph takes out of the
    * engine. The driver-side [[writeNTriples]] remains as the small-result
    * convenience. */
  def writeNTriplesDistributed(path: String): Unit =
    ntriplesLines.write.mode("overwrite").text(path)

  /** N-Triples serialization (reference: mapping/ntriples_write.rs:52).
    * Driver-side convenience — collects; use [[writeNTriplesDistributed]]
    * for anything big. */
  def toNTriples: Seq[String] =
    triplesDf.collect().toSeq.map { r =>
      val s = r.getString(0); val p = r.getString(1)
      val oLex = r.getString(2); val oDt = r.getString(3); val oLang = r.getString(4)
      val o =
        if (oDt == null && oLang == null) s"<$oLex>"
        else if (oLang != null) "\"" + escape(oLex) + "\"@" + oLang
        else "\"" + escape(oLex) + "\"^^<" + oDt + ">"
      s"<$s> <$p> $o ."
    }

  def writeNTriples(path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      toNTriples.mkString("", "\n", "\n").getBytes("UTF-8"))

  /** In-memory term export (reference: mapping/export_triples.rs:7-121). */
  def exportTriples: Seq[(Term, String, Term)] =
    triplesDf.collect().toSeq.map { r =>
      val o: Term =
        if (r.isNullAt(3) && r.isNullAt(4)) Iri(r.getString(2))
        else if (!r.isNullAt(4)) Lit(r.getString(2), Xsd.langString, Some(r.getString(4)))
        else Lit(r.getString(2), r.getString(3))
      (Iri(r.getString(0)), r.getString(1), o)
    }

  /** Distributed handoff to the query engine: per-predicate typed slices
    * (predicate list is metadata-small; the slice frames stay lazy). */
  def toGraph: TriplesGraph = {
    val preds = triplesDf.select("p", "o_dt").distinct().collect()
      .groupBy(_.getString(0))
      .map { case (p, rows) => p -> rows.map(r => Option(r.getString(1))).toSeq }
    val slices = preds.map { case (p, dts) =>
      val base = triplesDf.filter(col("p") === p)
      val kind =
        if (dts.forall(_.isEmpty)) OKind.KIri
        else if (dts.flatten.distinct.sizeIs == 1 && dts.forall(_.isDefined))
          OKind.ofDatatype(dts.flatten.head)
        else OKind.KStr
      val hasLang = true // o_lang column always present
      val o = kind match {
        case OKind.KIri | OKind.KStr => col("o_lex")
        case k => col("o_lex").cast(OKind.sparkType(k))
      }
      p -> PredicateSlice(
        base.select(col("s"), o.as("o"), col("o_lang")), kind, hasLang)
    }
    TriplesGraph.fromSlices(spark, slices)
  }

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }
}

object Mapping {
  def fromString(stottr: String, spark: SparkSession): Mapping =
    new Mapping(Stottr.parse(stottr), spark)
}
