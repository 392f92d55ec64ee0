package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle statement run
  * by the driver on the same parquet tables. Column names/aliases must match
  * between the two — the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Query with a DuckDB oracle (full hash-compare). */
  def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Query with no SQL-expressible oracle (driver records rows-only check);
    * correctness is pinned by a ScalaTest spec instead. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
