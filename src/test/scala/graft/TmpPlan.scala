package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

object TmpPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rw = graft.engine.GraftEngine.open(graft.engine.ConnOptions(), Some(spark))
    rw.createTable("bench_ev", StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("value", DoubleType))), primaryKey = Seq("event_id"))
    rw.mv("SELECT event_id, ts, value, CAST(rank() OVER (PARTITION BY date_trunc('hour', ts) ORDER BY value DESC, event_id) AS BIGINT) AS r FROM bench_ev", "pw_mv")
    val mv = rw.mvByName("pw_mv").get
    val t = rw.table("bench_ev").get
    t.insert((1L to 50L).map(i => Row(i, java.sql.Timestamp.valueOf(f"2024-01-01 0${i % 8}%d:00:01"), i.toDouble)))
    rw.flush()
    t.insert(Seq(Row(100L, java.sql.Timestamp.valueOf("2024-01-01 03:00:05"), 9.0)))
    rw.flush()
    println("PLAN8<<<")
    println(mv.lastWindowEpochPlan.getOrElse("none"))
    println(">>>PLAN8")
    rw.close(); spark.stop()
  }
}
