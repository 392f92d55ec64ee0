package graft.tools

import graft.Tables
import graft.engine.{ConnOptions, GraftEngine}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Throwaway diagnostic (r15): per-job trace of one pkagg replay — prints
  * each job's graft.phase tag and callsite so multi-job phases can be
  * attributed precisely. */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val ph = Option(j.properties).flatMap(p => Option(p.getProperty("graft.phase"))).getOrElse("-")
        val cs = Option(j.properties).flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("-")
        println(s"JOB ${j.jobId} phase=$ph site=$cs stages=${j.stageIds.size}")
      }
    })
    val eventsSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rw = GraftEngine.open(ConnOptions(streamShufflePartitions = Some(8)), Some(spark))
    rw.createTable("bench_ev", eventsSchema, primaryKey = Seq("event_id"))
    rw.mv("SELECT user_id % 1000 AS k, count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv FROM bench_ev GROUP BY user_id % 1000", "bm_fold")
    val rows = Tables(spark, "/root/testdata/sf0.01", "events")
      .select(eventsSchema.fieldNames.toIndexedSeq.map(col): _*)
      .orderBy("event_id").limit(120000).collect()
    val t = rw.table("bench_ev").get
    rows.grouped(rows.length / 4 + 1).zipWithIndex.foreach { case (c, i) =>
      t.insert(c.toSeq)
      println(s"=== EPOCH $i flush ===")
      rw.flush()
    }
    rw.close(); spark.stop()
  }
}
