package graft

import graft.engine.{ConnOptions, GraftEngine}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Round-16 LiveTable optimizations: per-segment PK key-range pruning of
  * the changelog-diff probe, and bounded incremental (pair-merge)
  * compaction replacing the face-less full-history rewrite. Both change
  * operator INTERNALS only — every test pins the changelog/visible
  * results against the equivalent batch evaluation. */
class SegmentPruneSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("v", LongType)))

  private def countJobs(f: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { f; org.apache.spark.GraftListenerBridge.waitListeners(spark.sparkContext) }
    finally spark.sparkContext.removeSparkListener(l)
    jobs.get()
  }

  test("post-spill flush with fresh keys prunes every segment (zero-job diff)") {
    spark.conf.set("graft.table.spillThreshold", "10")
    try {
      val rw = GraftEngine.open(ConnOptions(), Some(spark))
      rw.createTable("spr_t", schema, primaryKey = Seq("id"))
      rw.mv("SELECT grp, count(*) AS n, sum(v) AS sv FROM spr_t GROUP BY grp",
        "spr_mv")
      val mv = rw.mvByName("spr_mv").get
      assert(mv.isDeltaAggMode)
      val t = rw.table("spr_t").get
      // 30 rows over several flushes: spills at >10, several segments form.
      // Chunks of 4 stay within the kept tail half (threshold/2 = 5), so
      // every flush's unemitted delta is tail-resident — the pruning gate.
      (0L until 30L).grouped(4).foreach { g =>
        t.insert(g.map(i => Row(i, s"g${i % 3}", i)).toSeq); rw.flush()
      }
      // fresh keys strictly above every spilled segment's range: the diff
      // must not schedule any history-scanning job (driver tail only)
      val jobs = countJobs {
        t.insert((100L until 104L).map(i => Row(i, "g0", 1L)))
        rw.flush()
      }
      // the MV fold itself runs delta-aux jobs; assert the TABLE diff cost
      // indirectly: a full-history probe adds a parquet-scan job per flush,
      // so the pruned flush must stay under the pre-spill epoch's count
      assert(jobs <= 2, s"pruned flush scheduled $jobs jobs (expected <=2: " +
        "delta-aux only; the table diff must be driver-side)")
      val got = mv.df.collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      val want = rw.fetch("SELECT grp, count(*) AS n, sum(v) AS sv FROM spr_t GROUP BY grp")
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got == want)
      rw.close()
    } finally spark.conf.unset("graft.table.spillThreshold")
  }

  test("upsert touching spilled keys still diffs correctly (overlapping segment read)") {
    spark.conf.set("graft.table.spillThreshold", "10")
    try {
      val rw = GraftEngine.open(ConnOptions(), Some(spark))
      rw.createTable("spo_t", schema, primaryKey = Seq("id"), versionColumn = Some("v"))
      rw.mv("SELECT grp, count(*) AS n, CAST(sum(v) AS BIGINT) AS sv FROM spo_t GROUP BY grp",
        "spo_mv")
      val mv = rw.mvByName("spo_mv").get
      val t = rw.table("spo_t").get
      (0L until 30L).grouped(4).foreach { g =>
        t.insert(g.map(i => Row(i, s"g${i % 3}", i + 1)).toSeq); rw.flush()
      }
      // overwrite keys that live in SPILLED segments (low ids) — the probe
      // must read the overlapping segment(s) and emit the update pair
      t.insert(Seq(Row(1L, "g1", 1000L), Row(2L, "g2", 2000L)))
      rw.flush()
      // and a LOSING version against a spilled winner must change nothing
      t.insert(Seq(Row(1L, "g1", 500L)))
      rw.flush()
      val got = mv.df.collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      val want = rw.fetch("SELECT grp, count(*) AS n, CAST(sum(v) AS BIGINT) AS sv FROM spo_t GROUP BY grp")
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got == want, s"maintained face $got must equal batch $want")
      // g1 = ids 1,4,…,28; id=1 resolved to v=1000 (the stale 500 loses)
      assert(got("g1")._2 == 1000L + (4L to 28L by 3).map(_ + 1).sum,
        s"id=1 must resolve to v=1000 (stale 500 loses), got ${got("g1")}")
      rw.close()
    } finally spark.conf.unset("graft.table.spillThreshold")
  }

  test("disjoint spilled segments: batch face plans exchange-free and stays exact") {
    spark.conf.set("graft.table.spillThreshold", "10")
    try {
      val rw = GraftEngine.open(ConnOptions(), Some(spark))
      rw.createTable("dsj_t", schema, primaryKey = Seq("id"))
      val t = rw.table("dsj_t").get
      t.mergedFaceMax = 2 // latch the driver face oversize: distributed reads
      (0L until 40L).grouped(4).foreach { g =>
        t.insert(g.map(i => Row(i, s"g${i % 3}", i)).toSeq); rw.flush()
      }
      assert(!t.faceIsLocal, "face must be latched oversize for this test")
      // append-only history: every segment's key range is disjoint and
      // distinct-within, so upsert resolution must vanish from the plan —
      // no row_number window, no hash exchange (round 16: the full-window
      // spelling cost O(history) shuffle per evaluation, every epoch)
      val plan = t.batchDF.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"disjoint-segment batch face must plan exchange-free, got:\n$plan")
      assert(!plan.contains("row_number"),
        s"disjoint-segment batch face must skip winner resolution, got:\n$plan")
      val got = rw.fetch("SELECT CAST(id AS BIGINT) AS id FROM dsj_t ORDER BY id")
        .map(_.getLong(0))
      assert(got == (0L until 40L), s"face must hold all 40 rows, got $got")
      // a real duplicate (upsert of a spilled key) must fall back to the
      // window for the overlapping slice and resolve to the newest row
      t.insert(Seq(Row(1L, "gX", 999L))); rw.flush()
      val afterPlan = t.batchDF.queryExecution.executedPlan.toString
      val v = rw.fetch("SELECT grp, CAST(v AS BIGINT) AS v FROM dsj_t WHERE id = 1")
      assert(v.map(r => (r.getString(0), r.getLong(1))) == Seq(("gX", 999L)),
        s"upserted key must resolve to the newest row, got $v " +
          s"(plan was:\n$afterPlan)")
      assert(rw.fetch("SELECT count(*) AS n FROM dsj_t").head.getLong(0) == 40L,
        "row count must be unchanged by the upsert")
      rw.close()
    } finally spark.conf.unset("graft.table.spillThreshold")
  }

  test("face-less compaction merges segment pairs without a full-history rewrite") {
    spark.conf.set("graft.table.spillThreshold", "10")
    spark.conf.set("graft.table.compactThreshold", "12")
    spark.conf.set("graft.table.compactChunkRows", "40")
    try {
      val rw = GraftEngine.open(ConnOptions(), Some(spark))
      rw.createTable("cmi_t", schema, primaryKey = Seq("id"), versionColumn = Some("v"))
      val t = rw.table("cmi_t").get
      // force the face-less regime: the merged face latches oversize
      t.mergedFaceMax = 2
      // 4 versions of 8 keys across flushes: history 32 rows, spilled into
      // several segments; winners = 8
      for (ver <- 1L to 4L) {
        t.insert((0L until 8L).map(i => Row(i, s"g$i", ver * 10 + i)))
        rw.flush()
      }
      assert(!t.faceIsLocal, "face must be latched oversize for this test")
      // pair merges run at each flush barrier: history must shrink below
      // the raw 32 rows (dead versions in merged pairs are dropped) while
      // the resolved face stays exact
      val hist = t.historyRows
      assert(hist < 32, s"incremental merges must have dropped dead versions, history=$hist")
      val got = rw.fetch("SELECT id, CAST(v AS BIGINT) AS v FROM cmi_t ORDER BY id")
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got == (0L until 8L).map(i => (i, 40L + i)),
        s"resolved face must keep the max-version winners, got $got")
      // upsert ordering survives the merged segments: stale version loses
      t.insert(Seq(Row(3L, "g3", 5L))); rw.flush()
      assert(rw.fetch("SELECT CAST(v AS BIGINT) AS v FROM cmi_t WHERE id = 3")
        .head.getLong(0) == 43L, "stale version must lose against a merged winner")
      rw.close()
    } finally {
      spark.conf.unset("graft.table.spillThreshold")
      spark.conf.unset("graft.table.compactThreshold")
      spark.conf.unset("graft.table.compactChunkRows")
    }
  }
}
