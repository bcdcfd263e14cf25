package graft.rdf

/** RDF term model.
  *
  * Mirrors the surface the reference engine consumes through oxrdf/spargebra
  * (see /root/reference/hybrid/src/sparql_result_to_polars.rs:69-117 for its
  * literal→column mapping), re-expressed as a plain Scala ADT. Literals carry
  * their lexical form plus datatype IRI and optional language tag.
  */
sealed trait Term {
  /** Canonical string form used when a term must live in a string column. */
  def canonical: String = this match {
    case Iri(v)            => v
    case Blank(id)         => "_:" + id
    case Lit(lex, _, _)    => lex
  }
}

final case class Iri(value: String) extends Term
final case class Blank(id: String) extends Term
final case class Lit(lexical: String, datatype: String, lang: Option[String] = None)
    extends Term

object Xsd {
  val ns = "http://www.w3.org/2001/XMLSchema#"
  val string: String = ns + "string"
  val integer: String = ns + "integer"
  val int: String = ns + "int"
  val long: String = ns + "long"
  val unsignedInt: String = ns + "unsignedInt"
  val unsignedLong: String = ns + "unsignedLong"
  val double: String = ns + "double"
  val float: String = ns + "float"
  val decimal: String = ns + "decimal"
  val boolean: String = ns + "boolean"
  val dateTime: String = ns + "dateTime"
  val dateTimeStamp: String = ns + "dateTimeStamp"
  val date: String = ns + "date"
  val anyURI: String = ns + "anyURI"
  val langString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  val numericLong: Set[String] = Set(integer, int, long, unsignedInt, unsignedLong)
  val numericDouble: Set[String] = Set(double, float, decimal)

  /** Parse an xsd:dateTime / xsd:date lexical form to a timestamp.
    *
    * Accepts explicit offsets (`2021-12-01T00:00:01+01:00`, the reference
    * DSL's own example format — dsl/src/translator/timestamp_conditions.rs:
    * 9-38), `Z`, and zone-less forms. BOTH forms anchor to UTC instants —
    * zone-less lexicals explicitly via ZoneOffset.UTC, never the JVM default
    * zone, so one graph's offset and zone-less literals stay mutually
    * consistent on any host.
    */
  def parseTimestamp(lex: String): java.sql.Timestamp =
    try java.sql.Timestamp.from(java.time.OffsetDateTime.parse(lex).toInstant)
    catch {
      case _: java.time.format.DateTimeParseException =>
        val ldt =
          if (lex.contains("T"))
            java.time.LocalDateTime.parse(lex.stripSuffix("Z"))
          else java.time.LocalDate.parse(lex).atStartOfDay()
        java.sql.Timestamp.from(ldt.toInstant(java.time.ZoneOffset.UTC))
    }
}

object Rdf {
  val ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val typ: String = ns + "type"
}

/** The reference's custom function/vocabulary namespace
  * (/root/reference/hybrid/src/constants.rs). The engine recognizes these
  * IRIs both as virtual time-series predicates and as scalar functions.
  */
object Otit {
  val ns = "https://github.com/magbak/otit_swt#"
  val hasTimeseries: String = ns + "hasTimeseries"
  val hasDataPoint: String = ns + "hasDataPoint"
  val hasTimestamp: String = ns + "hasTimestamp"
  val hasValue: String = ns + "hasValue"
  val hasExternalId: String = ns + "hasExternalId"
  val hasDatatype: String = ns + "hasDatatype"
  val dateTimeAsNanos: String = ns + "DateTimeAsNanos"
  val nanosAsDateTime: String = ns + "NanosAsDateTime"
  val dateTimeAsSeconds: String = ns + "DateTimeAsSeconds"
  val secondsAsDateTime: String = ns + "SecondsAsDateTime"
  val nestAggregation: String = ns + "nestAggregation"
  /** The DSL's LIKE lowers to this custom function (reference
    * dsl/src/costants.rs:1 LIKE_FUNCTION). */
  val like: String = ns + "like"
}
