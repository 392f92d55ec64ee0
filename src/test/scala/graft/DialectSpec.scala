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
}
