package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Numerical contract: everything is computed in Double with a sequential
  * left-to-right fold, mirroring DuckDB's `list_sum(list_transform(...))`
  * exactly so oracle comparisons are bit-identical.
  *
  * The fold runs in a native expression
  * ([[graft.functions.HashExpressions.VecDot]]): the declarative
  * `aggregate(zip_with(...))` spelling produces the same doubles but
  * Spark's lambda HOFs are interpreted (CodegenFallback), costing ~2·dim
  * expression evaluations per call on the ANN hot path.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision (sequential fold). */
  def dotD(a: Column, b: Column): Column =
    graft.functions.HashExpressions.vecDot(a, b)

  /** ‖a‖₂ in double precision. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity, shaped as dot / (norm·norm) — same association order
    * as the oracle formulation. */
  def cosine(a: Column, b: Column): Column = dotD(a, b) / (normD(a) * normD(b))
}
