package graft.tools

import graft.Tables
import graft.engine.{ConnOptions, GraftEngine}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Scaling probe (round 15): replay the pkagg fold with FIXED-size epochs
  * (12.5k rows, the bench's delta) while the table history grows to 10×
  * the sf0.1 fixture (80 epochs → 1M rows), so epoch latency isolates
  * state growth from delta size — the first empirical datapoint on the
  * IVM runtime's scaling exponent. Spill (100k tail bound) and the
  * doubling-gated compaction both engage repeatedly on the way up, so the
  * curve covers the paths a 100 TB deployment lives on, not just the
  * all-in-memory honeymoon. Prints one line per 8-epoch window: wall,
  * jobs, shuffle bytes.
  *
  * Usage: runMain graft.tools.ScaleProbe [epochs] [sfDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val epochs = args.headOption.map(_.toInt).getOrElse(80)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val shuffle = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val eventsSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rw = GraftEngine.open(ConnOptions(streamShufflePartitions = Some(8)), Some(spark))
    rw.createTable("bench_ev", eventsSchema, primaryKey = Seq("event_id"))
    rw.mv("SELECT user_id % 1000 AS k, count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv FROM bench_ev GROUP BY user_id % 1000", "bm_fold")
    val base = Tables(spark, sfDir, "events")
      .select(eventsSchema.fieldNames.toIndexedSeq.map(col): _*)
      .orderBy("event_id").limit(12500).collect()
    println(s"BASE rows=${base.length} epochs=$epochs (history at end = ${base.length.toLong * epochs})")
    val t = rw.table("bench_ev").get
    var winT0 = System.nanoTime(); var winJ0 = 0L; var winS0 = 0L
    for (e <- 1 to epochs) {
      val shift = e.toLong * 10000000L
      val rows = base.map { r =>
        Row(r.getLong(0) + shift, r.get(1), r.getLong(2), r.getString(3),
          r.getDouble(4), r.getString(5))
      }
      t.insert(rows.toIndexedSeq)
      rw.flush()
      if (e % 8 == 0) {
        org.apache.spark.GraftListenerBridge.waitListeners(spark.sparkContext)
        val dt = (System.nanoTime() - winT0) / 1e9
        val dj = jobs.get - winJ0; val ds = shuffle.get - winS0
        println(f"WINDOW epochs ${e - 7}%3d-$e%3d: wall=$dt%7.2f s  " +
          f"latency=${dt / 8}%6.3f s/epoch  jobs/epoch=${dj / 8.0}%6.3f  " +
          f"shuffleBytes=$ds%10d  history=${t.historyRows}%8d")
        winT0 = System.nanoTime(); winJ0 = jobs.get; winS0 = shuffle.get
      }
    }
    rw.close(); spark.stop()
  }
}
