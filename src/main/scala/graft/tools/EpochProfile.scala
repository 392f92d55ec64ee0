package graft.tools

import graft.Tables
import graft.engine.{ConnOptions, GraftEngine}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Diagnostic: replay the bench's streaming tumble/cascade/topn entry with
  * per-phase epoch timing (`-Dgraft.epochTiming=true`, via GRAFT_JAVA_OPTS)
  * and a per-epoch Spark job count, to find where epoch wall-time goes.
  * Usage: runMain graft.tools.EpochProfile [tumble|cascade|topn] [rows] [epochs]
  */
object EpochProfile {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("tumble")
    val nRows = args.lift(1).map(_.toInt).getOrElse(40000)
    val nEpochs = args.lift(2).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val eventsSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    val defs: Seq[(String, String)] = which match {
      case "tumble" => Seq(("bm_tw",
        """SELECT window_start, event_type, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM tumble(bench_ev, ts, interval '10 minutes')
          |GROUP BY window_start, event_type""".stripMargin))
      case "cascade" => Seq(
        ("bm_up",
          """SELECT window_start, event_type, count(*) AS n,
            |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
            |FROM tumble(bench_ev, ts, interval '10 minutes')
            |GROUP BY window_start, event_type""".stripMargin),
        ("bm_daily",
          """SELECT date_trunc('hour', window_start) AS hs, event_type,
            |  CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv
            |FROM bm_up GROUP BY date_trunc('hour', window_start), event_type""".stripMargin))
      case "pkagg" => Seq(("bm_pk",
        """SELECT user_id % 1000 AS k, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM bench_ev GROUP BY user_id % 1000""".stripMargin))
      case "session" => Seq(("bm_sess",
        """SELECT window_start, window_end, event_type, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM session(bench_ev, ts, interval '5 minutes')
          |GROUP BY window_start, window_end, event_type""".stripMargin))
      case _ => Seq(
        ("bm_top",
          """SELECT user_id, count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv
            |FROM bench_ev GROUP BY user_id
            |ORDER BY sv DESC, user_id LIMIT 25""".stripMargin),
        ("bm_roll",
          """SELECT user_id % 5 AS bucket, CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv
            |FROM bm_top GROUP BY user_id % 5""".stripMargin))
    }

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })

    val rw = GraftEngine.open(ConnOptions(streamShufflePartitions = Some(8)), Some(spark))
    // pkagg exercises the retraction-capable fold path: a PK table emits
    // a 4-op changelog, which (absent a PK) would instead stream
    rw.createTable("bench_ev", eventsSchema,
      primaryKey = if (which == "pkagg") Seq("event_id") else Nil)
    defs.foreach { case (n, s) => rw.mv(s, n) }
    val rows = Tables(spark, sfDir, "events")
      .select(eventsSchema.fieldNames.toIndexedSeq.map(col): _*)
      .orderBy("event_id").limit(nRows).collect()
    val chunk = (rows.length + nEpochs - 1) / nEpochs
    rows.grouped(chunk).zipWithIndex.foreach { case (c, i) =>
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      rw.table("bench_ev").get.insert(c.toSeq)
      val t1 = System.nanoTime()
      rw.flush()
      val t2 = System.nanoTime()
      System.err.println(f"[profile] epoch $i insert=${(t1 - t0) / 1e6}%.0fms flush=${(t2 - t1) / 1e6}%.0fms jobs=${jobs.get() - j0}")
    }
    rw.close()
    spark.stop()
  }
}
