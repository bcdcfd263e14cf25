package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single most recent right row at or
  * before its timestamp (per key). The canonical time-series operator Spark
  * lacks natively; the reference's timestamp-synchronized joins cover only
  * exact-equality matching (hybrid/src/combiner.rs shared-ts-variable
  * joins), so this is beyond-parity surface.
  *
  * Spelling: tag the sides, UNION them, and run one per-key window ordered
  * by (ts, side) carrying the latest right-side payload forward with
  * `last(_, ignoreNulls)` over ROWS UNBOUNDED PRECEDING..CURRENT; left rows
  * then hold exactly their as-of match. Right rows sort BEFORE left rows at
  * an equal timestamp, so the match is inclusive (`l.ts >= r.ts`).
  *
  * Scale: ONE shuffle on the key, linear work per partition — the naive
  * range-condition join (`l.key = r.key AND r.ts <= l.ts` + max-per-row)
  * is a per-key cross product that explodes quadratically with series
  * length. Skewed keys ride the same salting/AQE machinery as any keyed
  * window ([[Skew]]).
  */
object AsOfJoin {

  /** Backward (most-recent-at-or-before) left as-of join.
    *
    * Output: every `left` row with its columns unchanged, plus the matched
    * right row's `tsCol` and payload columns under `r_`-prefixed names —
    * null when the key has no right row at or before the left timestamp.
    *
    * @param tolerance optional SQL interval expression (e.g.
    *   `"INTERVAL 1 HOUR"`): matches older than `ts - tolerance` are
    *   nulled out (the match must be recent enough).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tolerance: Option[String] = None): DataFrame =
    asof(left, right, keys, tsCol, tolerance, forward = false)

  /** Forward (earliest-at-or-after) left as-of join: for every left row,
    * the single earliest right row at or after its timestamp (`l.ts <=
    * r.ts`). Same one-shuffle union+window spelling as [[backward]] with
    * the traversal order reversed; `tolerance` bounds how far AHEAD the
    * match may be (`r.ts <= l.ts + tolerance`). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tolerance: Option[String] = None): DataFrame =
    asof(left, right, keys, tsCol, tolerance, forward = true)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tolerance: Option[String], forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val leftPayload = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val rightPayload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val side = "__asof_side"
    val rCols = tsCol +: rightPayload // carried right columns, in order
    // the right payload rides as ONE struct so the carried match is always
    // a single consistent right ROW — per-column last(ignoreNulls) would
    // skip past a right row whose payload value is null and stitch columns
    // from different rows
    val rStruct = "__asof_r"
    val rType = org.apache.spark.sql.types.StructType(
      rCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lNorm = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as(side)) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(rType).as(rStruct)): _*)
    val rNorm = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as(side)) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rCols.map(c => col(c).as(c)): _*).as(rStruct)): _*)
    // backward traverses time ascending; forward descending. Right rows
    // sort before left rows at an equal timestamp either way (side
    // ascending), so the match is inclusive in both directions. The right
    // struct is the FINAL order key: with duplicate right rows at the same
    // (key, ts) the carried match is the payload-wise GREATEST row — a
    // documented, deterministic rule instead of whichever row the shuffle
    // happened to order last (left rows order null here, and side already
    // separates them at an equal ts).
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col(side).asc, col(rStruct).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lNorm.unionByName(rNorm)
      .withColumn(rStruct, last(col(rStruct), ignoreNulls = true).over(w))
    var out = carried.filter(col(side) === 1).drop(side)
    tolerance.foreach { tol =>
      val fresh =
        if (forward) col(rStruct).getField(tsCol) <= col(tsCol) + expr(tol)
        else col(rStruct).getField(tsCol) >= col(tsCol) - expr(tol)
      out = out.withColumn(rStruct, when(fresh, col(rStruct)))
    }
    out.select(
      (keys.map(col) ++ Seq(col(tsCol)) ++ leftPayload.map(col) ++
        rCols.map(c => col(rStruct).getField(c).as("r_" + c))): _*)
  }
}
