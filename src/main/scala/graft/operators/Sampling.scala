package graft.operators

import graft.functions.HashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Sampling decisions hash the row's ID (mod-prime rolling hash of its
  * string form) instead of drawing RNG state: the same row is kept or
  * dropped on every run, on any cluster layout, and the decision is
  * replayable in plain SQL (the DuckDB oracle recomputes it). Map-only —
  * the filter runs inside the scan stage, no shuffle, no driver
  * coordination, so it behaves identically at 100 TB.
  */
object Sampling {

  private val Mod = 1000000007L
  /** Knuth multiplicative constant; Scramble * Mod < 2^63, so the product
    * never overflows and the same fold replays in overflow-checked SQL. */
  private val Scramble = 2654435761L

  /** The raw rolling hash is monotone in short id strings (h("42") is just
    * the polynomial of two digits — far below any percentage threshold),
    * which would turn "sample 1%" into "keep the lowest ids". One
    * multiplicative round mod the prime permutes the bucket space. */
  private def bucket(idCol: Column): Column =
    HashExpressions.rollingHash(idCol.cast("string")) * Scramble % Mod

  /** Keep ~`rate` of rows (0..1), decided by id hash. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(bucket(col(idCol)) < (Mod * rate).toLong)

  /** Per-stratum rates: rows in strata absent from `rates` are dropped.
    * The stratum column is compared as a string. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double]): DataFrame = {
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (k, r)) =>
      when(col(stratumCol).cast("string") === k, lit((Mod * r).toLong)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < threshold)
  }
}
