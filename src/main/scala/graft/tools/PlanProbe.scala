package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Dev probe: plan-shape assertions (pushdown / broadcast) + timing anatomy
  * for the headline bench queries. `sbt "runMain graft.tools.PlanProbe
  * [sfDir]"`. Not part of the driver contract. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $l: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // plan shape: pushdown + broadcast
    val fp = graft.SparkEntry.queries("b_filter_pushdown")(spark, dir)
    val fpPlan = fp.queryExecution.executedPlan.toString
    println("[plan] b_filter_pushdown: " + fpPlan.linesIterator
      .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
      .mkString(" || ").replaceAll("\\s+", " ").take(500))
    val star = graft.SparkEntry.queries("b_join_star")(spark, dir)
    println("[plan] b_join_star broadcasts=" +
      star.queryExecution.executedPlan.toString.linesIterator.count(_.contains("BroadcastHashJoin")))
    val ff = graft.SparkEntry.queries("b_join_fact_fact")(spark, dir)
    val ffp = ff.queryExecution.executedPlan.toString
    println("[plan] b_join_fact_fact joins=" + ffp.linesIterator
      .filter(l => l.contains("HashJoin") || l.contains("SortMergeJoin"))
      .map(_.trim.takeWhile(_ != '(')).mkString(","))

    // timing anatomy of the doc-table queries
    val docs = Tables(spark, dir, "documents")
    time("warm scan")(noop(docs.selectExpr("doc_id")))
    time("fingerprint")(noop(graft.operators.TextAnalysis.fingerprint(docs, "doc_id", "text")))
    time("quality")(noop(graft.operators.TextAnalysis.qualityScore(docs, "doc_id", "text")))
    time("md5 only")(noop(docs.selectExpr("doc_id", "md5(text) AS m")))
    time("norm only")(noop(docs.selectExpr("doc_id",
      "regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS m")))
    time("simhash pairs")(noop(graft.operators.Dedup.simhashPairs(docs, "doc_id", "text")))
    time("minhash lsh")(noop(graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text")))
    val emb = Tables(spark, dir, "embeddings")
    time("sim exact")(noop(graft.operators.Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", Seq(0L, 1L, 2L, 3L, 4L), 10)))
    time("q1 decimal")(noop(graft.SparkEntry.queries("b_q1_pricing")(spark, dir)))
    time("cte_topn")(noop(graft.SparkEntry.queries("b_cte_topn")(spark, dir)))

    // decimal-agg headroom: what would the same aggregate cost in double /
    // scaled-long arithmetic?
    import org.apache.spark.sql.functions._
    val li = Tables(spark, dir, "lineitem")
    time("q1 shape, double sums")(noop(
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity")).as("a"),
        sum(col("l_extendedprice")).as("b"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("d"),
        avg("l_quantity"), avg("l_discount"), count(lit(1)))))
    time("q1 shape, decimal(8,2) sums")(noop(
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(8,2)")).as("a"),
        sum(col("l_extendedprice").cast("decimal(8,2)")).as("b"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(8,2)")).as("c"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).cast("decimal(8,2)")).as("d"),
        avg("l_quantity"), avg("l_discount"), count(lit(1)))))
    time("q1 shape, scaled-long sums")(noop(
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(round(col("l_quantity") * 100).cast("long")).as("a"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("b"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")).as("c"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")) * 100).cast("long")).as("d"),
        avg("l_quantity"), avg("l_discount"), count(lit(1)))))
    spark.stop()
  }
}
