package graft

import graft.engine.{ConnOptions, GraftEngine}
import graft.sources.{BarStream, TickGenerator}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** S5/S6 source parity: the demo_boll flow (bar stream → typed table →
  * pass-through MV subscription, demo.py:111-158) and the synthetic tick
  * generator (demo.py:10-30), with a deterministic transport/clock. */
class SourcesSpec extends SparkSpec {

  private lazy val rw: GraftEngine = GraftEngine.open(ConnOptions(), Some(spark))

  test("subscribe_bars: decode, lowercase streams, handler per message, reconnect") {
    val connects = ArrayBuffer[Seq[String]]()
    var attempt = 0
    val transport = new BarStream.Transport {
      def connect(streams: Seq[String]): Iterator[String] = {
        connects += streams
        attempt += 1
        if (attempt == 1) // first connection drops mid-stream
          Iterator("""{"symbol":"BTCUSDT","close":101.5,"volume":3}""") ++
            Iterator.continually[String](throw new RuntimeException("socket drop")).take(1)
        else Iterator(
          """{"symbol":"BTCUSDT","close":102.5,"volume":4}""",
          """{"symbol":"ETHUSDT","close":55.0,"volume":9}""")
      }
    }
    val got = ArrayBuffer[Map[String, Any]]()
    BarStream.subscribeBars[Map[String, Any]](
      transport, Seq("BTCUSDT@kline_1m"), got += _, BarStream.jsonDecoder,
      reconnectDelayMs = 1L)
    assert(connects.forall(_ == Seq("btcusdt@kline_1m"))) // P9 lowercase
    assert(attempt == 2) // reconnected after the drop
    assert(got.map(_("close")) == Seq(101.5, 102.5, 55.0))
  }

  test("demo_boll flow: bars -> typed table -> pass-through MV -> on_change") {
    rw.execute(
      """CREATE TABLE IF NOT EXISTS usdm_futures_klins_1m (
        |  symbol STRING, timestamp TIMESTAMPTZ, open FLOAT, high FLOAT,
        |  low FLOAT, close FLOAT, volume FLOAT)""".stripMargin)
    rw.mv("SELECT * FROM usdm_futures_klins_1m", "usdm_futures_klins_1m_mv")
    val sub = rw.subscriptionFor("usdm_futures_klins_1m_mv").declareCursor()

    val transport = new BarStream.Transport {
      def connect(streams: Seq[String]): Iterator[String] = Iterator(
        """{"symbol":"BTCUSDT","ts":1704067200000,"open":100.0,"high":105.0,"low":99.0,"close":104.0,"volume":12.0}""",
        """{"symbol":"BTCUSDT","ts":1704067260000,"open":104.0,"high":106.0,"low":103.0,"close":105.5,"volume":7.0}""")
    }
    BarStream.subscribeBars[Map[String, Any]](transport, Seq("btcusdt"), bar => {
      rw.insertRow("usdm_futures_klins_1m", forceFlush = true, values = Map(
        "symbol" -> bar("symbol"),
        "timestamp" -> new java.sql.Timestamp(bar("ts").asInstanceOf[Long]),
        "open" -> bar("open"), "high" -> bar("high"), "low" -> bar("low"),
        "close" -> bar("close"), "volume" -> bar("volume")))
    }, BarStream.jsonDecoder)

    val changes = Iterator.continually(sub.fetch(10)).takeWhile(_.nonEmpty).flatten.toSeq
    assert(changes.size == 2)
    assert(changes.map(_.getString(0)) == Seq("BTCUSDT", "BTCUSDT"))
    assert(rw.fetch("SELECT count(*) FROM usdm_futures_klins_1m").head.getLong(0) == 2L)
  }

  test("tick generator: deterministic, 1-5 rows/tick, drives MV through flush epochs") {
    val gen = new TickGenerator(seed = 7L)
    val t = rw.createTable("gen_tick", gen.schema)
    rw.mv("SELECT symbol, count(*) AS n, round(avg(close), 4) AS avg_close " +
      "FROM gen_tick GROUP BY symbol", "gen_tick_mv")
    gen.run(t, ticks = 10)(() => rw.flush())
    val total = rw.fetch("SELECT count(*) FROM gen_tick").head.getLong(0)
    assert(total >= 10 && total <= 50)
    val mvTotal = rw.fetch("SELECT sum(n) FROM gen_tick_mv").head.getLong(0)
    assert(mvTotal == total)
    // determinism: same seed reproduces the same rows
    val gen2 = new TickGenerator(seed = 7L)
    assert(gen2.tick(0L).map(_.getString(0)) == new TickGenerator(7L).tick(0L).map(_.getString(0)))
  }

  test("connection facade: loan pattern shares the engine (C5/C6)") {
    val conn = rw.getconn()
    try {
      conn.execute("CREATE TABLE conn_t (x INT)")
      conn.execute("INSERT INTO conn_t VALUES (1), (2)")
      conn.execute("FLUSH")
      assert(conn.fetch("SELECT sum(x) FROM conn_t").head.getLong(0) == 3L)
      assert(conn.fetchOne("SELECT x FROM conn_t ORDER BY x").get.getInt(0) == 1)
    } finally conn.close()
  }
}
