package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of (temporal "nearest match") join.
  *
  * Semantics follow RisingWave's `ASOF JOIN`, reachable through the
  * reference's SQL passthrough (`risingwave/core.py:161-212`): for every
  * left row, pick the single right row with the same key whose timestamp is
  * the greatest at-or-before (backward) / smallest at-or-after (forward) the
  * left row's timestamp; LEFT variants keep unmatched left rows with nulls.
  *
  * Spark-first plan: NOT the naive equi-join + per-left-row `row_number`
  * top-1 — that materializes every (left row, earlier right row) candidate
  * pair, O(|L|·|R|) per key, a scale-killer on a busy key. Instead both
  * sides are union-tagged and one running `last(_, ignoreNulls)` window
  * carries the latest qualifying right row forward ("last observation
  * carried forward"). Cost at any scale: exactly one shuffle of L+R on the
  * key and one linear sorted pass per partition — the same shape streaming
  * engines use for temporal joins. The right row rides as ONE struct so all
  * its columns come from the SAME matched row; per-column `last` would tear
  * different right rows together whenever right payload columns contain
  * nulls (ignoreNulls skips them independently per column).
  *
  * Determinism contract (same as DuckDB/RisingWave ASOF): right-side
  * (key, ts) pairs should be unique — with duplicates, which of the equal-ts
  * rows wins is tie-broken by `rightTieBreak` when given, otherwise
  * partition-order-dependent.
  */
object AsofJoin {

  /** Latest right row at-or-before (`inclusive=true`) or strictly-before
    * each left row's timestamp, matched per `key`.
    *
    * Output: all left columns, then each right column except the key
    * prefixed with `rightPrefix`; null when no right row qualifies (LEFT
    * as-of semantics — filter `col(rightPrefix + rightTs).isNotNull` for
    * inner semantics).
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               inclusive: Boolean = true,
               rightPrefix: String = "r_",
               rightTieBreak: Option[String] = None): DataFrame =
    locf(left, right, key, leftTs, rightTs, inclusive, rightPrefix,
         rightTieBreak, descending = false)

  /** Earliest right row at-or-after (`inclusive=true`) or strictly-after
    * each left row's timestamp — the mirror of [[backward]]. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              inclusive: Boolean = true,
              rightPrefix: String = "r_",
              rightTieBreak: Option[String] = None): DataFrame =
    locf(left, right, key, leftTs, rightTs, inclusive, rightPrefix,
         rightTieBreak, descending = true)

  private def locf(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, inclusive: Boolean,
                   rightPrefix: String, rightTieBreak: Option[String],
                   descending: Boolean): DataFrame = {
    require(left.columns.contains(key) && left.columns.contains(leftTs),
      s"left side must contain '$key' and '$leftTs'")
    require(right.columns.contains(key) && right.columns.contains(rightTs),
      s"right side must contain '$key' and '$rightTs'")
    // At equal timestamps the right row must sort before the left row iff
    // the bound is inclusive (then the frame [unbounded, current] sees it).
    val (rSide, lSide) = if (inclusive) (0, 1) else (1, 0)
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    // Tiebreak among equal-ts right rows: ascending order + running `last`
    // means the LARGEST tiebreak value wins deterministically. Left rows
    // carry null (sorts first per Spark default nulls-first, which is fine:
    // side already separates them at equal ts).
    val tb = rightTieBreak.map(col).getOrElse(lit(0)).cast("string")
    val l2 = left.select(
      col(key).as("_k"), col(leftTs).as("_t"), lit(lSide).as("_side"),
      lit(null).cast("string").as("_tb"),
      lit(null).cast(rType).as("_r"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"))
    val r2 = right.select(
      col(key).as("_k"), col(rightTs).as("_t"), lit(rSide).as("_side"),
      tb.as("_tb"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("_r"),
      lit(null).cast(lType).as("_l"))
    val ts = if (descending) col("_t").desc else col("_t").asc
    val tbOrd = if (descending) col("_tb").desc_nulls_last else col("_tb").asc_nulls_first
    val w = Window.partitionBy("_k")
      .orderBy(ts, col("_side").asc, tbOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.unionByName(r2)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_l").isNotNull)
    val leftCols = left.columns.map(c => col(s"_l.`$c`").as(c))
    val rightCols = right.columns.filterNot(_ == key)
      .map(c => col(s"_m.`$c`").as(rightPrefix + c))
    matched.select((leftCols ++ rightCols).toIndexedSeq: _*)
  }
}
