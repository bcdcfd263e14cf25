package graft.rdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared distributed N-Triples/N-Quads FORMATTING kernel (codegen'd
  * Columns, no UDFs) — one spelling of term serialization used by both
  * export surfaces (`Mapping.writeNTriplesDistributed` for mapper output,
  * `TriplesGraph.ntriplesLines` for graphs) so the reader
  * ([[graft.sources.NTriples]]) round-trips either bit-for-bit.
  * Reference streams the same per-triple formatting
  * (mapping/ntriples_write.rs:52). */
object NtFormat {

  /** N-Triples string escaping: backslash FIRST, then quote/newline/cr/tab. */
  def escape(c: Column): Column = {
    val b0 = regexp_replace(c, "\\\\", "\\\\\\\\")
    val b1 = regexp_replace(b0, "\"", "\\\\\"")
    val b2 = regexp_replace(b1, "\n", "\\\\n")
    val b3 = regexp_replace(b2, "\r", "\\\\r")
    regexp_replace(b3, "\t", "\\\\t")
  }

  /** Term spelling of a subject/object resource: blank nodes keep their
    * `_:` form, IRIs get angle brackets. */
  def resource(c: Column): Column =
    when(c.startsWith("_:"), c).otherwise(concat(lit("<"), c, lit(">")))

  /** `%Y-%m-%dT%H:%M:%S%.f` — fractional seconds only when non-zero, in
    * millis or micros groups (chrono's %.f behavior, which the reference's
    * golden lexicals carry). */
  def datetimeBody(c: Column): Column = {
    val base = date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
    val frac6 = date_format(c, "SSSSSS")
    val frac = when(frac6 === "000000", lit(""))
      .when(substring(frac6, 4, 3) === "000", concat(lit("."), substring(frac6, 1, 3)))
      .otherwise(concat(lit("."), frac6))
    concat(base, frac)
  }

  /** Lexical form of a typed column: timestamps get XSD datetime lexicals
    * (naive body, plus a `±HH:MM` offset in `zone` for instants);
    * everything else is Spark's canonical string cast. */
  def lexical(c: Column, dt: DataType, zone: String): Column = dt match {
    case TimestampType =>
      val wall = from_utc_timestamp(c, zone)
      val offSec = wall.cast(LongType) - c.cast(LongType)
      val sign = when(offSec < 0, "-").otherwise("+")
      val offAbs = abs(offSec)
      val offStr = concat(sign,
        lpad((offAbs / 3600).cast(IntegerType).cast(StringType), 2, "0"), lit(":"),
        lpad(((offAbs % 3600) / 60).cast(IntegerType).cast(StringType), 2, "0"))
      concat(datetimeBody(wall), offStr)
    case TimestampNTZType => datetimeBody(c)
    case _ => c.cast(StringType)
  }

  /** One formatted N-Triples/N-Quads line from string columns
    * (s, p, o_lex, o_dt, o_lang[, g]): object is a resource when both
    * o_dt and o_lang are null, a lang-tagged literal when o_lang is set,
    * else a typed literal; a non-null `g` appends the N-Quads graph
    * term. */
  def line(s: Column, p: Column, oLex: Column, oDt: Column, oLang: Column,
      g: Option[Column] = None): Column = {
    val o =
      when(oDt.isNull && oLang.isNull, resource(oLex))
        .when(oLang.isNotNull,
          concat(lit("\""), escape(oLex), lit("\"@"), oLang))
        .otherwise(
          concat(lit("\""), escape(oLex), lit("\"^^<"), oDt, lit(">")))
    val core = concat(resource(s), lit(" <"), p, lit("> "), o)
    g match {
      case None => concat(core, lit(" ."))
      case Some(gc) => concat(core,
        when(gc.isNull, lit(" .")).otherwise(concat(lit(" "), resource(gc), lit(" ."))))
    }
  }
}
