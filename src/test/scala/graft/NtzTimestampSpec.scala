package graft

import graft.engine.{ConnOptions, GraftEngine}
import graft.operators.AsofJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.time.LocalDateTime

/** TIMESTAMP_NTZ as a first-class type through the engine (round-9 verdict
  * item 2). The reference's PG dialect maps `TIMESTAMP` to a zoneless
  * timestamp (SURVEY §1.2) and any parquet written with
  * `isAdjustedToUTC=false` surfaces as NTZ in Spark 4 — a completely
  * ordinary user input. The engine must accept NTZ end to end without the
  * caller casting: DDL, ingest (both driver-buffered and bulk paths), the
  * tumble-MV maintainer, and the as-of join.
  */
class NtzTimestampSpec extends SparkSpec {

  private def ldt(s: String): LocalDateTime = LocalDateTime.parse(s)

  test("NTZ live table + tumble MV maintains incrementally without caller casts") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    try {
      // PG TIMESTAMP (no tz) → TimestampNTZType per the dialect map
      rw.execute("CREATE TABLE ntz_t (k STRING, ts TIMESTAMP, v DOUBLE)")
      val t = rw.table("ntz_t").get
      assert(t.schema("ts").dataType == TimestampNTZType,
        "DDL TIMESTAMP must surface as TIMESTAMP_NTZ")
      rw.execute(
        """CREATE MATERIALIZED VIEW ntz_mv AS
          |SELECT window_start, k, count(*) AS n, sum(v) AS sv
          |FROM tumble(ntz_t, ts, interval '10 seconds')
          |GROUP BY window_start, k""".stripMargin)
      def ins(k: String, ts: String, v: Double) =
        rw.insertRow("ntz_t", forceFlush = false,
          values = Map("k" -> k, "ts" -> ldt(ts), "v" -> v))
      ins("a", "2024-01-01T00:00:01", 1.0)
      ins("a", "2024-01-01T00:00:03", 2.0)
      ins("b", "2024-01-01T00:00:12", 5.0)
      rw.execute("FLUSH")
      ins("a", "2024-01-01T00:00:07", 4.0) // correction in the first window
      rw.execute("FLUSH")
      val got = rw.fetch("SELECT k, n, sv FROM ntz_mv ORDER BY k")
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(got == Seq(("a", 3L, 7.0), ("b", 1L, 5.0)), s"got $got")
      // the MV's window column keeps zoneless semantics
      val ws = rw.fetch("SELECT window_start FROM ntz_mv ORDER BY window_start").head
      assert(ws.get(0).isInstanceOf[LocalDateTime],
        s"window_start should stay NTZ, got ${ws.get(0).getClass}")
    } finally rw.close()
  }

  test("ingest boundary coerces mixed temporal values to the declared type") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    try {
      // NTZ column fed java.sql.Timestamp (what a TZ-era caller produces)
      rw.execute("CREATE TABLE ntz_mix (k STRING, ts TIMESTAMP, v DOUBLE)")
      rw.insertRow("ntz_mix", forceFlush = true, values = Map(
        "k" -> "sql", "ts" -> java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), "v" -> 1.0))
      rw.insertRow("ntz_mix", forceFlush = true, values = Map(
        "k" -> "ldt", "ts" -> ldt("2024-01-01T00:00:06"), "v" -> 2.0))
      // TZ column fed LocalDateTime (what an NTZ-parquet reader produces)
      rw.execute("CREATE TABLE tz_mix (k STRING, ts TIMESTAMPTZ, v DOUBLE)")
      rw.table("tz_mix").get.insert(Seq(
        Row("sql", java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 1.0),
        Row("ldt", ldt("2024-01-01T00:00:06"), 2.0)))
      rw.execute("FLUSH")
      val a = rw.fetch("SELECT CAST(ts AS STRING) AS s FROM ntz_mix ORDER BY k")
        .map(_.getString(0))
      val b = rw.fetch("SELECT CAST(ts AS STRING) AS s FROM tz_mix ORDER BY k")
        .map(_.getString(0))
      // session tz is pinned UTC: wall-clock strings agree across the two
      assert(a == Seq("2024-01-01 00:00:06", "2024-01-01 00:00:05"), s"got $a")
      assert(b == Seq("2024-01-01 00:00:06", "2024-01-01 00:00:05"), s"got $b")
    } finally rw.close()
  }

  test("bulk ingest (INSERT…SELECT) coerces an NTZ source into a TZ table and back") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    try {
      rw.execute("CREATE TABLE tzb (id BIGINT, ts TIMESTAMPTZ)")
      spark.range(5)
        .select(col("id"), to_timestamp_ntz(lit("2024-01-01 00:00:01")).as("ts"))
        .createOrReplaceTempView("ntz_src")
      rw.execute("INSERT INTO tzb SELECT id, ts FROM ntz_src")
      rw.execute("FLUSH")
      val n = rw.fetch("SELECT count(*) AS n FROM tzb WHERE ts = TIMESTAMP '2024-01-01 00:00:01'")
      assert(n.head.getLong(0) == 5L)
      rw.execute("CREATE TABLE ntzb (id BIGINT, ts TIMESTAMP)")
      spark.range(5)
        .select(col("id"), to_timestamp(lit("2024-01-01 00:00:02")).as("ts"))
        .createOrReplaceTempView("tz_src")
      rw.execute("INSERT INTO ntzb SELECT id, ts FROM tz_src")
      rw.execute("FLUSH")
      assert(rw.table("ntzb").get.batchDF.schema("ts").dataType == TimestampNTZType)
      val m = rw.fetch("SELECT count(*) AS n FROM ntzb WHERE CAST(ts AS STRING) = '2024-01-01 00:00:02'")
      assert(m.head.getLong(0) == 5L)
    } finally rw.close()
  }

  test("PK/version ingest canonicalizes java.time.Instant and LocalDate (merged-face tier)") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    try {
      // TIMESTAMPTZ version column: seed with java.sql.Timestamp, then
      // upsert the SAME key spelled as java.time.Instant — pre-fix the
      // merged-face map kept both representations as distinct version
      // objects and the version ordering (which casts to java.sql.Timestamp)
      // threw ClassCastException on the first read
      rw.execute(
        """CREATE TABLE inst_vt (k STRING PRIMARY KEY, ver TIMESTAMPTZ, v BIGINT)
          |ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(ver)""".stripMargin)
      rw.insertRow("inst_vt", forceFlush = true, values = Map(
        "k" -> "a", "ver" -> java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(10)),
        "v" -> 1L))
      rw.insertRow("inst_vt", forceFlush = true, values = Map(
        "k" -> "a", "ver" -> java.time.Instant.ofEpochSecond(20), "v" -> 2L))
      rw.insertRow("inst_vt", forceFlush = true, values = Map(
        "k" -> "a", "ver" -> java.time.Instant.ofEpochSecond(15), "v" -> 3L)) // stale
      rw.execute("FLUSH")
      val got = rw.fetch("SELECT k, v FROM inst_vt").map(r => (r.getString(0), r.getLong(1)))
      assert(got == Seq(("a", 2L)), s"got $got")
      // DATE PK fed java.sql.Date and java.time.LocalDate must be ONE key
      rw.execute("CREATE TABLE date_pk (d DATE PRIMARY KEY, v BIGINT)")
      rw.insertRow("date_pk", forceFlush = true, values = Map(
        "d" -> java.sql.Date.valueOf("2024-03-01"), "v" -> 1L))
      rw.insertRow("date_pk", forceFlush = true, values = Map(
        "d" -> java.time.LocalDate.parse("2024-03-01"), "v" -> 2L))
      rw.execute("FLUSH")
      val g2 = rw.fetch("SELECT d, v FROM date_pk")
        .map(r => (r.getDate(0).toString, r.getLong(1)))
      assert(g2 == Seq(("2024-03-01", 2L)), s"got $g2")
      // TIMESTAMPTZ PK fed as Instant through the DataFrame insert path
      rw.execute("CREATE TABLE ts_pk (ts TIMESTAMPTZ PRIMARY KEY, v BIGINT)")
      val t = rw.table("ts_pk").get
      t.insert(Seq(Row(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(7)), 1L)))
      t.insert(Seq(Row(java.time.Instant.ofEpochSecond(7), 2L)))
      rw.execute("FLUSH")
      val g3 = rw.fetch("SELECT v FROM ts_pk").map(_.getLong(0))
      assert(g3 == Seq(2L), s"got $g3")
    } finally rw.close()
  }

  test("hop and session TVFs work over an NTZ live table") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    try {
      rw.execute("CREATE TABLE ntz_w (k STRING, ts TIMESTAMP, v DOUBLE)")
      def ins(k: String, ts: String, v: Double) =
        rw.insertRow("ntz_w", forceFlush = false,
          values = Map("k" -> k, "ts" -> ldt(ts), "v" -> v))
      ins("a", "2024-01-01T00:00:01", 1.0)
      ins("a", "2024-01-01T00:00:06", 2.0)
      ins("a", "2024-01-01T00:00:45", 4.0)
      rw.execute("FLUSH")
      // hop: 5s slide / 10s size — each row lands in every covering window
      // (starts in (t-10s, t]), so the 00:00:01 row also belongs to the
      // window opening at 23:59:55
      val hop = rw.fetch(
        """SELECT CAST(window_start AS STRING) AS ws, count(*) AS n
          |FROM hop(ntz_w, ts, interval '5 seconds', interval '10 seconds')
          |GROUP BY window_start ORDER BY ws""".stripMargin)
        .map(r => (r.getString(0), r.getLong(1)))
      assert(hop == Seq(
        ("2023-12-31 23:59:55", 1L), ("2024-01-01 00:00:00", 2L),
        ("2024-01-01 00:00:05", 1L), ("2024-01-01 00:00:40", 1L),
        ("2024-01-01 00:00:45", 1L)), s"got $hop")
      // session: 10s gap — rows at 1 and 6 merge, 45 is its own session
      val mv = rw.mv(
        """SELECT window_start, window_end, k, count(*) AS n
          |FROM session(ntz_w, ts, interval '10 seconds')
          |GROUP BY window_start, window_end, k""".stripMargin, "ntz_sess_mv")
      assert(mv.isSessionMode, "session MV over NTZ must take the session path")
      rw.execute("FLUSH")
      val sess = rw.fetch(
        "SELECT CAST(window_start AS STRING) AS ws, n FROM ntz_sess_mv ORDER BY ws")
        .map(r => (r.getString(0), r.getLong(1)))
      assert(sess == Seq(("2024-01-01 00:00:01", 2L), ("2024-01-01 00:00:45", 1L)),
        s"got $sess")
    } finally rw.close()
  }

  test("as-of join works natively on NTZ timestamps") {
    val left = spark.range(4).select(
      lit("k").as("sym"),
      to_timestamp_ntz(concat(lit("2024-01-01 00:00:0"), col("id"))).as("ts"),
      col("id").as("lv"))
    val right = spark.createDataFrame(Seq(
      ("k", "2024-01-01 00:00:00", 10.0),
      ("k", "2024-01-01 00:00:02", 20.0)))
      .toDF("sym", "rts_s", "rv")
      .select(col("sym"), to_timestamp_ntz(col("rts_s")).as("rts"), col("rv"))
    assert(left.schema("ts").dataType == TimestampNTZType)
    val out = AsofJoin.backward(left, right, "sym", "ts", "rts")
      .select("lv", "r_rv").orderBy("lv")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (0L, Some(10.0)), (1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(20.0))))
  }
}
