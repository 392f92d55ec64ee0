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

  test("foldHaving: aggregate predicates fold; select-alias predicates are rejected") {
    val c = "__hc"
    // predicate over aggregate expressions: folds
    assert(Dialect.foldHaving(
      "SELECT k, sum(v) AS sv FROM t GROUP BY k HAVING sum(v) > 5", c)
      .exists(_.contains(s"(sum(v) > 5) AS $c")))
    // predicate referencing a SELECT alias: HAVING resolution and lateral-
    // column-alias resolution can disagree (alias shadowing a source
    // column binds to the SOURCE laterally) — reject, fall back to batch
    assert(Dialect.foldHaving(
      "SELECT k, sum(v) AS n FROM t GROUP BY k HAVING n > 5", c).isEmpty)
    assert(Dialect.foldHaving(
      "SELECT k, sum(v) AS v FROM t GROUP BY k HAVING v > 5", c).isEmpty)
    // grouping-column references are not aliases — still folds
    assert(Dialect.foldHaving(
      "SELECT k, sum(v) AS sv FROM t GROUP BY k HAVING k = 'a' AND sum(v) > 1", c)
      .nonEmpty)
    // alias appearing only inside a string literal does not reject
    assert(Dialect.foldHaving(
      "SELECT k, sum(v) AS n FROM t GROUP BY k HAVING k <> 'n'", c).nonEmpty)
    // a same-named SOURCE column inside an aggregate call is not an alias
    // reference — SUM(sv)'s sv binds to the source under both HAVING and
    // folded resolution (the real cascade-oracle shape)
    assert(Dialect.foldHaving(
      "SELECT g, CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv FROM up " +
        "GROUP BY g HAVING SUM(sv) / SUM(n) > 49", c).nonEmpty)
    // a leading CTE must not derail the alias scan: the select list is
    // located by TOP-LEVEL SELECT (the CTE's inner SELECT sits at depth 1),
    // so the outer alias n is still seen and the fold still rejected
    assert(Dialect.foldHaving(
      "WITH t AS (SELECT a AS x FROM u2) " +
        "SELECT k, sum(v) AS n FROM t GROUP BY k HAVING n > 5", c).isEmpty)
    // unbalanced parens (malformed SQL that reached the fold through the
    // regex relation-scan fallback) must return None, not hang
    assert(Dialect.foldHaving(
      "SELECT k, sum(v) AS s FROM t GROUP BY k HAVING (sum(v > 3", c).isEmpty)
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
