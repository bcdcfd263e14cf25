package graft.sparql

import org.apache.spark.sql.DataFrame

/** Canonical golden-CSV comparison: values normalized to strings (timestamps
  * without fractional seconds, numbers in shortest integer-preserving form),
  * rows sorted. `multisetCols` cells are compared as separator-insensitive
  * multisets (for GROUP_CONCAT, where our engine is deterministically sorted
  * while the reference preserves frame order — a documented divergence).
  */
object GoldenCompare {

  private val tsFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  def canonNum(d: Double): String =
    if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  def canonCell(v: Any): String = v match {
    case null => ""
    case t: java.sql.Timestamp => t.toLocalDateTime.format(tsFmt)
    case d: Double => canonNum(d)
    case f: Float => canonNum(f.toDouble)
    case d: java.math.BigDecimal => canonNum(d.doubleValue)
    case x => x.toString
  }

  private val tsNanosRe = """(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(\.\d+)?""".r

  def canonCsvCell(s: String): String = s match {
    case "" => ""
    case tsNanosRe(base, _) => base
    case other =>
      try canonNum(other.toDouble)
      catch { case _: NumberFormatException => other }
  }

  private def canonMultiset(cell: String, sep: String): String =
    cell.split(java.util.regex.Pattern.quote(sep)).sorted.mkString(sep)

  def dfRows(df: DataFrame, multisetIdx: Set[Int], sep: String): Seq[Seq[String]] =
    df.collect().toSeq.map(r =>
      r.toSeq.zipWithIndex.map { case (v, i) =>
        val c = canonCell(v)
        if (multisetIdx(i)) canonMultiset(c, sep) else c
      })

  def csvRows(path: String, header: Seq[String], multisetIdx: Set[Int], sep: String)
    : Seq[Seq[String]] = {
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    val cols = lines.head.split(",", -1).toSeq
    assert(cols == header, s"golden header $cols != result columns $header")
    lines.tail.filter(_.nonEmpty).map(_.split(",", -1).toSeq.zipWithIndex.map {
      case (v, i) =>
        val c = canonCsvCell(v)
        if (multisetIdx(i)) canonMultiset(c, sep) else c
    })
  }

  def assertMatchesGolden(df: DataFrame, csvPath: String,
      multisetCols: Set[String] = Set.empty, sep: String = "-",
      approxCols: Set[String] = Set.empty, relTol: Double = 1e-9): Unit = {
    val cols = df.columns.toSeq
    val idx = multisetCols.map(cols.indexOf).filter(_ >= 0)
    val aIdx = approxCols.map(cols.indexOf).filter(_ >= 0)
    val got = dfRows(df, idx, sep)
    val exp = csvRows(csvPath, cols, idx, sep)
    if (aIdx.isEmpty) {
      val g = got.map(_.mkString("|")).sorted
      val e = exp.map(_.mkString("|")).sorted
      assert(g == e,
        s"""golden mismatch for $csvPath
           |got (${g.size}):
           |${g.mkString("\n")}
           |expected (${e.size}):
           |${e.mkString("\n")}""".stripMargin)
    } else {
      // float aggregates (e.g. AVG) differ from the reference in the last
      // ulp by fold order: compare approx columns with relative tolerance,
      // matching rows on the exact (group-key) columns
      def key(r: Seq[String]): String =
        r.zipWithIndex.collect { case (v, i) if !aIdx(i) => v }.mkString("|")
      val g = got.sortBy(key)
      val e = exp.sortBy(key)
      assert(g.map(key) == e.map(key),
        s"golden key mismatch for $csvPath: got ${g.map(key).take(5)} exp ${e.map(key).take(5)}")
      g.zip(e).foreach { case (gr, er) =>
        aIdx.foreach { i =>
          val gv = gr(i).toDouble; val ev = er(i).toDouble
          assert(math.abs(gv - ev) <= relTol * math.max(1.0, math.max(math.abs(gv), math.abs(ev))),
            s"approx mismatch in ${cols(i)} at ${key(gr)}: got $gv expected $ev")
        }
      }
    }
  }
}
