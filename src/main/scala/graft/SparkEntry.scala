package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 and the queries/ package.
  *
  * `queries` is the operator inventory of SURVEY §2, one verifiable entry per
  * operator: Tier A (constructs the reference emits itself), Tier B (the
  * SQL-passthrough matrix of §2.11), and the LLM-pipeline extension
  * operators (dedup / similarity / text analysis / multimodal).
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    graft.queries.TierA.defs ++
    graft.queries.TierB.defs ++
    graft.queries.Extensions.defs ++
    graft.queries.Pipeline.defs ++
    graft.queries.StreamingParity.defs

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. A star-schema
    * join-aggregate: broadcast dims, decimal-exact revenue. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"),
           round(sum("o_totalprice"), 2).as("revenue"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** DuckDB-equivalent SQL per query; omitted entries get a rows-only check
    * and are pinned by ScalaTest specs instead. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
