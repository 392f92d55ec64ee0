package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * the expressions stay inside whole-stage codegen and scale linearly with
  * partition count.
  *
  * Numerical contract: everything is computed in Double with a sequential
  * left-to-right fold, mirroring DuckDB's `list_sum(list_transform(...))`
  * exactly so oracle comparisons are bit-identical.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision (sequential fold). */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ in double precision. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity, shaped as dot / (norm·norm) — same association order
    * as the oracle formulation. */
  def cosine(a: Column, b: Column): Column = dotD(a, b) / (normD(a) * normD(b))
}
