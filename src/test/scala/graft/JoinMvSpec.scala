package graft

import graft.engine._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Stream⋈static join MVs (the canonical enrichment MV — reference
  * `risingwave/core.py:451-456` delegates arbitrary join statements to its
  * server's incremental maintainer) and the CREATE-MV backfill / multi-MV
  * independence semantics of the per-reader live-table streams. */
class JoinMvSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("event_id", LongType),
    StructField("user_id", LongType), StructField("value", DoubleType)))

  test("aggregated stream-static join MV is maintained by the streaming path") {
    Tables(spark, sf, "nation").createOrReplaceTempView("nation")
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("jm_ev1", schema)
    rw.mv("SELECT n.n_name AS nation, count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv " +
      "FROM jm_ev1 e JOIN nation n ON n.n_nationkey = e.user_id % 25 GROUP BY n.n_name", "jm_mv1")
    val mv = rw.mvByName("jm_mv1").get
    assert(mv.isStreamingMode, "agg-over-join MV must stream, not batch re-run")
    val t = rw.table("jm_ev1").get
    t.insert(Seq(Row(1L, 3L, 10.0), Row(2L, 28L, 5.0))) // both → nation 3
    rw.flush()
    assert(mv.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet == Set(("NATION_3", 2L)))
    t.insert(Seq(Row(3L, 4L, 2.0)))
    rw.flush()
    val m = mv.df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m == Map("NATION_3" -> 2L, "NATION_4" -> 1L))
    assert(mv.isStreamingMode)
    rw.close()
  }

  test("stateless join MV backfills rows inserted before CREATE MV") {
    Tables(spark, sf, "nation").createOrReplaceTempView("nation")
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("jm_ev2", schema)
    val t = rw.table("jm_ev2").get
    t.insert(Seq(Row(1L, 1L, 1.0), Row(2L, 2L, 2.0)))
    rw.flush()
    rw.mv("SELECT e.event_id, n.n_name AS nation, e.value " +
      "FROM jm_ev2 e JOIN nation n ON n.n_nationkey = e.user_id % 25", "jm_mv2")
    val mv = rw.mvByName("jm_mv2").get
    assert(mv.isStreamingMode)
    rw.flush()
    assert(mv.df.select("event_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "pre-existing rows must backfill into the new MV")
    t.insert(Seq(Row(3L, 3L, 3.0)))
    rw.flush()
    assert(mv.df.select("event_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    rw.close()
  }

  test("two downstream MVs chained on one streaming MV face see full history") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("jm_ev4", schema)
    val t = rw.table("jm_ev4").get
    rw.mv("SELECT event_id, user_id, value FROM jm_ev4 WHERE value >= 0", "jm_base")
    assert(rw.mvByName("jm_base").get.isStreamingMode)
    t.insert(Seq(Row(1L, 1L, 1.0), Row(2L, 2L, 2.0)))
    rw.flush()
    rw.mv("SELECT user_id, count(*) AS n FROM jm_base GROUP BY user_id", "jm_da")
    t.insert(Seq(Row(3L, 1L, 3.0)))
    rw.flush()
    // second downstream attaches later still — its face must backfill the
    // full upstream history, not just batches after its own bind
    rw.mv("SELECT user_id, count(*) AS n FROM jm_base GROUP BY user_id", "jm_db")
    t.insert(Seq(Row(4L, 2L, 4.0)))
    rw.flush()
    val expect = Map(1L -> 2L, 2L -> 2L)
    val a = rw.mvByName("jm_da").get.df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = rw.mvByName("jm_db").get.df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == expect, s"first downstream saw $a")
    assert(b == expect, s"late downstream saw $b")
    rw.close()
  }

  test("two MVs on one table see the full history independently") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("jm_ev3", schema)
    val t = rw.table("jm_ev3").get
    rw.mv("SELECT count(*) AS n FROM jm_ev3", "jm_cnt_a")
    t.insert(Seq(Row(1L, 1L, 1.0), Row(2L, 2L, 2.0)))
    rw.flush()
    // second MV attaches AFTER the first consumed (and its stream pruned)
    // those batches — it must still see the full history via backfill
    rw.mv("SELECT count(*) AS n FROM jm_ev3", "jm_cnt_b")
    t.insert(Seq(Row(3L, 3L, 3.0)))
    rw.flush()
    val a = rw.mvByName("jm_cnt_a").get.df.collect().head.getLong(0)
    val b = rw.mvByName("jm_cnt_b").get.df.collect().head.getLong(0)
    assert(a == 3L, s"first MV saw $a rows")
    assert(b == 3L, s"late-attached MV saw $b rows (history lost)")
    rw.close()
  }
}
