package graft

import graft.engine.Dialect

class DialectSpec extends SparkSpec {

  test("tumble TVF rewrites to window() derived table") {
    val in = "SELECT window_start, symbol FROM tumble(tick, ts, interval '10 seconds') GROUP BY 1,2"
    val out = Dialect.rewriteTumble(in)
    assert(out.contains("(window(ts, '10 seconds')).start AS window_start"))
    assert(out.contains("FROM tick)"))
    assert(!out.toLowerCase.contains("tumble("))
  }

  test(":: casts rewrite with PG type aliases, including chains and literals") {
    assert(Dialect.rewriteCasts("SELECT a::int8 FROM t") == "SELECT CAST(a AS BIGINT) FROM t")
    assert(Dialect.rewriteCasts("SELECT '1'::int::text") == "SELECT CAST(CAST('1' AS INT) AS STRING)")
    assert(Dialect.rewriteCasts("SELECT (a+b)::float8 FROM t") == "SELECT CAST((a+b) AS DOUBLE) FROM t")
  }

  test("json operators rewrite to get_json_object") {
    assert(Dialect.rewriteJsonOps("SELECT props->>'k' FROM e") ==
      "SELECT get_json_object(props, '$.k') FROM e")
    assert(Dialect.rewriteJsonOps("SELECT props->'k' FROM e") ==
      "SELECT get_json_object(props, '$.k') FROM e")
  }

  test("to_char translates PG tokens") {
    assert(Dialect.rewriteToChar("SELECT to_char(ts, 'YYYY-MM-DD HH24:MI:SS') FROM t") ==
      "SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss') FROM t")
  }

  test("string_agg rewrites to listagg") {
    assert(Dialect.rewriteStringAgg("SELECT string_agg(x, ',') FROM t") ==
      "SELECT listagg(x, ',') FROM t")
  }

  test("qualified names mangle only registered objects") {
    val out = Dialect.rewriteQualified(
      "SELECT t.a FROM demo.tick t JOIN other.tbl o ON t.a=o.a",
      Seq(("demo", "tick")))
    assert(out.contains("demo__tick"))
    assert(out.contains("other.tbl"))
  }

  test("generate_series rewrites to exploded sequence and runs") {
    val sql = Dialect("SELECT sum(generate_series) AS s FROM generate_series(1, 10)")
    assert(spark.sql(sql).head.getLong(0) == 55L)
  }

  test("engine-registered SQL functions: version, simhash64, word_shingles, minhash_sig") {
    val rw = graft.engine.GraftEngine.open(existing = Some(spark))
    val r = rw.fetch(
      """SELECT simhash64(word_shingles('the quick brown fox jumps')) AS sh,
        |  size(minhash_sig(word_shingles('the quick brown fox jumps'))) AS k""".stripMargin).head
    assert(r.getInt(1) == 128)
    // deterministic across calls
    val r2 = rw.fetch("SELECT simhash64(word_shingles('the quick brown fox jumps')) AS sh").head
    assert(r.getLong(0) == r2.getLong(0))
  }

  test("rewritten SQL executes on Spark: casts + json + to_char") {
    import spark.implicits._
    Seq(("""{"k": 7}""", "2024-03-01 10:20:30")).toDF("props", "s")
      .createOrReplaceTempView("dialect_t")
    val sql = Dialect(
      "SELECT props->>'k' AS k, '12'::int4 AS n, " +
        "to_char(s::timestamp, 'YYYY-MM') AS ym FROM dialect_t")
    val r = spark.sql(sql).head
    assert(r.getString(0) == "7" && r.getInt(1) == 12 && r.getString(2) == "2024-03")
  }

  test("DISTINCT ON rewrites to row_number window and runs") {
    import spark.implicits._
    Seq(("a", 1, 10), ("a", 2, 30), ("b", 3, 20)).toDF("k", "id", "v")
      .createOrReplaceTempView("don_t")
    val sql = Dialect("SELECT DISTINCT ON (k) k, id FROM don_t ORDER BY k, v DESC, id")
    assert(sql.contains("row_number() OVER"))
    val rows = spark.sql(sql).collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows == Seq(("a", 2), ("b", 3)))
  }

  test("PG regex operators rewrite to RLIKE and run") {
    import spark.implicits._
    Seq("Alpha", "beta").toDF("s").createOrReplaceTempView("rx_t")
    assert(Dialect.rewriteRegexMatch("SELECT s ~ '^a' FROM t") ==
      "SELECT (s RLIKE '^a') FROM t")
    assert(Dialect.rewriteRegexMatch("SELECT s !~* 'x$' FROM t") ==
      "SELECT (NOT s RLIKE '(?i)x$') FROM t")
    val rows = spark.sql(Dialect("SELECT s FROM rx_t WHERE s ~* '^al' ORDER BY s"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("Alpha"))
    // backslash classes survive Spark's literal unescaping
    Seq("x7y", "xdy").toDF("s").createOrReplaceTempView("rxd_t")
    val digits = spark.sql(Dialect("SELECT s FROM rxd_t WHERE s ~ '\\d+'"))
      .collect().map(_.getString(0)).toSeq
    assert(digits == Seq("x7y"), s"got $digits")
    // tildes INSIDE string literals are untouched; '' escapes survive
    assert(Dialect.rewriteRegexMatch("SELECT 'count ~ ', 'x' FROM t") ==
      "SELECT 'count ~ ', 'x' FROM t")
    assert(Dialect.rewriteRegexMatch("SELECT s ~ 'it''s' FROM t") ==
      "SELECT (s RLIKE 'it''s') FROM t")
    // a :: inside a regex pattern is not mangled into a CAST
    assert(Dialect("SELECT s FROM t WHERE s ~ 'a::b'").contains("RLIKE 'a::b'"))
  }

  test("DISTINCT ON with LIMIT but no ORDER BY limits after deduplication") {
    import spark.implicits._
    Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4)).toDF("k", "v")
      .createOrReplaceTempView("donl_t")
    val sql = Dialect("SELECT DISTINCT ON (k) k FROM donl_t LIMIT 2")
    assert(spark.sql(sql).count() == 2) // 3 distinct keys, limited after dedup
  }

  test("EMIT ON WINDOW CLOSE is accepted and stripped") {
    val out = Dialect("SELECT a FROM t EMIT ON WINDOW CLOSE")
    assert(out.trim == "SELECT a FROM t")
  }

  test("DISTINCT ON survives snake_case columns containing keywords") {
    import spark.implicits._
    Seq(("a", 1, 10), ("a", 2, 30), ("b", 3, 20))
      .toDF("k", "valid_from", "sort_order").createOrReplaceTempView("donsc_t")
    val sql = Dialect(
      "SELECT DISTINCT ON (k) k, valid_from FROM donsc_t ORDER BY k, sort_order DESC")
    val rows = spark.sql(sql).collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows == Seq(("a", 2), ("b", 3)), s"got $rows")
  }

  test("hop TVF with sub-second slide and size") {
    import spark.implicits._
    Seq(250L, 1250L).map(ms => new java.sql.Timestamp(ms)).toDF("ts")
      .createOrReplaceTempView("hopms_t")
    val sql = Dialect(
      """SELECT CAST(unix_millis(window_start) AS BIGINT) AS ws, count(*) AS n
        |FROM hop(hopms_t, ts, interval '500 milliseconds', interval '2 seconds')
        |GROUP BY 1""".stripMargin)
    val rows = spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // t=250ms → starts {-1500,-1000,-500,0}; t=1250ms → {-500,0,500,1000}
    assert(rows == Map(-1500L -> 1L, -1000L -> 1L, -500L -> 2L,
      0L -> 2L, 500L -> 1L, 1000L -> 1L), s"got $rows")
  }

  test("hop TVF: each row lands in size/slide sliding windows") {
    import spark.implicits._
    // events at 00:05 and 00:25 (epoch seconds 300, 1500)
    Seq(300L, 1500L).map(e => new java.sql.Timestamp(e * 1000)).toDF("ts")
      .createOrReplaceTempView("hop_t")
    val sql = Dialect(
      """SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS ws,
        |  CAST(unix_timestamp(window_end) AS BIGINT) AS we, count(*) AS n
        |FROM hop(hop_t, ts, interval '10 minutes', interval '30 minutes')
        |GROUP BY 1, 2""".stripMargin)
    val rows = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // t=300 → starts {-1200,-600,0}; t=1500 → starts {0,600,1200}; start 0
    // covers both events
    assert(rows == Set(
      (-1200L, 600L, 1L), (-600L, 1200L, 1L), (0L, 1800L, 2L),
      (600L, 2400L, 1L), (1200L, 3000L, 1L)))
  }
}
