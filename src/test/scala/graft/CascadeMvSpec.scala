package graft

import graft.engine._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Streaming MV-on-MV cascades: an append-only streaming MV exposes
  * per-reader backfilled face streams ([[graft.engine.MaterializedView
  * .streamingFaceFor]]); a downstream MV binds one and maintains
  * incrementally. Both levels must report streaming mode — falling back to
  * per-flush batch re-run would be value-correct but defeats the point. */
class CascadeMvSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("event_id", LongType),
    StructField("kind", StringType), StructField("value", DoubleType)))

  test("filter MV → aggregate MV cascade: both streaming, values track inserts") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("cas_ev", schema)
    rw.mv("SELECT event_id, kind, value FROM cas_ev WHERE kind = 'a'", "cas_f")
    rw.mv("SELECT kind, count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv FROM cas_f GROUP BY kind", "cas_a")
    val up = rw.mvByName("cas_f").get
    val down = rw.mvByName("cas_a").get
    assert(up.isStreamingMode, "filter level must stream")
    assert(down.isStreamingMode, "aggregate level must bind the upstream face and stream")

    val t = rw.table("cas_ev").get
    t.insert(Seq(Row(1L, "a", 1.5), Row(2L, "b", 9.0), Row(3L, "a", 2.5)))
    rw.flush()
    assert(up.df.count() == 2)
    assert(down.df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDecimal(2).doubleValue)).toSet == Set(("a", 2L, 4.0)))

    t.insert(Seq(Row(4L, "a", 6.0), Row(5L, "b", 1.0)))
    rw.flush()
    assert(down.df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDecimal(2).doubleValue)).toSet == Set(("a", 3L, 10.0)))
    assert(up.isStreamingMode && down.isStreamingMode)
    rw.close()
  }

  test("downstream MV created after data flows backfills from the upstream snapshot") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("cas_ev2", schema)
    rw.mv("SELECT event_id, kind, value FROM cas_ev2 WHERE kind = 'a'", "cas_f2")
    val t = rw.table("cas_ev2").get
    t.insert(Seq(Row(1L, "a", 1.0), Row(2L, "a", 2.0), Row(3L, "b", 5.0)))
    rw.flush()
    // late-created downstream must see the already-materialized upstream rows
    rw.mv("SELECT kind, count(*) AS n FROM cas_f2 GROUP BY kind", "cas_a2")
    val down = rw.mvByName("cas_a2").get
    rw.flush()
    assert(down.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 2L)), "backfill through the face stream must cover history")
    t.insert(Seq(Row(4L, "a", 3.0)))
    rw.flush()
    assert(down.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 3L)))
    rw.close()
  }

  test("dropping the downstream MV releases its face reader on the upstream") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("cas_ev3", schema)
    rw.mv("SELECT event_id, kind, value FROM cas_ev3 WHERE kind = 'a'", "cas_f3")
    rw.mv("SELECT kind, count(*) AS n FROM cas_f3 GROUP BY kind", "cas_a3")
    val t = rw.table("cas_ev3").get
    t.insert(Seq(Row(1L, "a", 1.0)))
    rw.flush()
    rw.execute("DROP MATERIALIZED VIEW cas_a3")
    // upstream keeps streaming and must not buffer for the dropped reader
    t.insert(Seq(Row(2L, "a", 2.0)))
    rw.flush()
    assert(rw.mvByName("cas_f3").get.df.count() == 2)
    assert(rw.mvByName("cas_a3").isEmpty)
    rw.close()
  }
}
