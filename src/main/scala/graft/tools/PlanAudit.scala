package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of selected queries and flag the
  * scale-critical properties (parquet filter pushdown, column pruning,
  * broadcast joins, whole-stage codegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("b_filter_pushdown", "b_join_star", "b_join_fact_fact", "b_q1_pricing",
        "b_win_topk_per_group", "x_sim_topk_exact")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"========== $n ==========")
      println(plan)
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).toSeq
      val schemas = "ReadSchema: [^\n]+".r.findAllIn(plan).toSeq
      val bcasts = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val codegen = "WholeStageCodegen".r.findAllIn(plan).size
      println(s"[audit] $n pushedFilters=${pushed.size} broadcastJoins=$bcasts codegenSpans=$codegen")
      schemas.foreach(s => println(s"[audit] $n $s"))
    }
    spark.stop()
  }
}
