package graft.engine

/** Package-private Dialect internals: interval parsing and the keyword
  * scanner's identifier-boundary rules. */
class DialectInternalSpec extends graft.SparkSpec {

  test("intervalMillis: single units incl. sub-second") {
    assert(Dialect.intervalMillis("500 milliseconds") == 500L)
    assert(Dialect.intervalMillis("250ms") == 250L)
    assert(Dialect.intervalMillis("2 seconds") == 2000L)
    assert(Dialect.intervalMillis("10 minutes") == 600000L)
    assert(Dialect.intervalMillis("1 hour") == 3600000L)
    assert(Dialect.intervalMillis("1 day") == 86400000L)
  }

  test("intervalMillis: compound intervals sum their terms") {
    assert(Dialect.intervalMillis("1 hour 30 minutes") == 5400000L)
    assert(Dialect.intervalMillis("1 second 500 milliseconds") == 1500L)
  }

  test("intervalMillis: junk and residue throw instead of silently truncating") {
    intercept[IllegalArgumentException](Dialect.intervalMillis("3 fortnights"))
    intercept[IllegalArgumentException](Dialect.intervalMillis("1 hour x"))
    intercept[IllegalArgumentException](Dialect.intervalMillis(""))
  }

  test("topLevelIndexOf: keywords inside snake_case identifiers don't match") {
    assert(Dialect.topLevelIndexOf("SELECT valid_from FROM t", "FROM") == 18)
    assert(Dialect.topLevelIndexOf("sort_order LIMIT 5", "LIMIT") == 11)
    assert(Dialect.topLevelIndexOf("col_where_x = 1 WHERE y", "WHERE") == 16)
    // still matches at start/end and ignores literals/parens
    assert(Dialect.topLevelIndexOf("FROM t", "FROM") == 0)
    assert(Dialect.topLevelIndexOf("'a FROM b' FROM t", "FROM") == 11)
    assert(Dialect.topLevelIndexOf("(SELECT x FROM u) FROM t", "FROM") == 18)
  }
}
