package graft.engine

/** PostgreSQL/RisingWave-dialect → Spark SQL shim (SURVEY §2.11): a pure
  * `String => String` pre-rewrite applied by `Connection.execute/fetch`
  * before `SparkSession.sql`. Only the spellings Spark's parser rejects are
  * rewritten; everything else passes through untouched so Catalyst sees the
  * original query shape.
  *
  * Covered: `tumble(t, col, interval 'd')` TVF, `expr::type` casts,
  * `->>'k'`/`->'k'` JSON access, `string_agg`, `to_char` date formats, and
  * schema-qualified names for registered catalog objects (Spark temp views
  * cannot carry a schema part — they are mangled to `schema__name`).
  */
object Dialect {

  /** `FROM tumble(tbl, ts_col, interval '10 seconds')` (reference
    * `demo.py:99`) → derived-table form exposing `window_start`/`window_end`
    * via Spark's native `window()`, which keeps streaming-aggregation
    * support intact. */
  private val tumbleRe =
    """(?is)tumble\s*\(\s*([\w.]+)\s*,\s*([\w.]+)\s*,\s*interval\s+'([^']+)'\s*\)""".r

  def rewriteTumble(sql: String): String =
    tumbleRe.replaceAllIn(sql, m => {
      val (tbl, col, dur) = (m.group(1), m.group(2), m.group(3))
      s"(SELECT *, (window($col, '$dur')).start AS window_start, " +
        s"(window($col, '$dur')).end AS window_end FROM $tbl)"
    })

  /** `hop(tbl, ts_col, interval 'slide', interval 'size')` (RisingWave's
    * sliding-window TVF) → derived table assigning each row to every
    * covering window via an exploded start sequence: starts are the
    * multiples of `slide` in `(t - size, t]`. Spark's `window(c, size,
    * slide)` only expands inside aggregation, so the TVF form needs the
    * explicit explode; second granularity (the TVF contract here). */
  private val hopRe =
    """(?is)hop\s*\(\s*([\w.]+)\s*,\s*([\w.]+)\s*,\s*interval\s+'([^']+)'\s*,\s*interval\s+'([^']+)'\s*\)""".r

  /** Interval string → milliseconds. Accepts sub-second units
    * (`millisecond(s)`/`ms` — RisingWave allows them in tumble/hop) and
    * compound intervals (`'1 hour 30 minutes'`, summed). Unparseable text or
    * residue beyond the unit terms throws — a silently-dropped term would
    * produce wrong window sizes with no error. */
  private[engine] def intervalMillis(s: String): Long = {
    val term = """(?i)(\d+)\s*(milliseconds?|ms|seconds?|secs?|minutes?|mins?|hours?|days?)""".r
    val terms = term.findAllMatchIn(s).toSeq
    val residue = term.replaceAllIn(s, "").trim
    if (terms.isEmpty || residue.nonEmpty)
      throw new IllegalArgumentException(s"unsupported interval: $s")
    terms.map { m =>
      val n = m.group(1).toLong
      m.group(2).toLowerCase match {
        case u if u.startsWith("millisecond") || u == "ms" => n
        case u if u.startsWith("sec") => n * 1000L
        case u if u.startsWith("min") => n * 60000L
        case u if u.startsWith("hour") => n * 3600000L
        case u if u.startsWith("day") => n * 86400000L
      }
    }.sum
  }

  def rewriteHop(sql: String): String =
    hopRe.replaceAllIn(sql, m => {
      val (tbl, c) = (m.group(1), m.group(2))
      val sl = intervalMillis(m.group(3))
      val sz = intervalMillis(m.group(4))
      // ms arithmetic: for whole-second slides this matches the old
      // truncated-seconds math exactly (floor(floor(t)/n) == floor(t/n)),
      // and it additionally supports sub-second slide/size
      s"(SELECT * EXCEPT(__hs), timestamp_millis(__hs) AS window_start, " +
        s"timestamp_millis(__hs + $sz) AS window_end FROM $tbl " +
        s"LATERAL VIEW explode(sequence(" +
        s"(CAST(floor((unix_millis(CAST($c AS TIMESTAMP)) - $sz) / $sl) AS BIGINT) + 1) * $sl, " +
        s"CAST(floor(unix_millis(CAST($c AS TIMESTAMP)) / $sl) AS BIGINT) * $sl, $sl)) __hv AS __hs)"
    })

  /** `session(tbl, ts_col, interval 'gap')` TVF (the session-window
    * complement of the tumble/hop TVFs). Session bounds depend on the WHOLE
    * group — they cannot be derived per row like tumble's — so the rewrite
    * targets Spark's aggregation-time `session_window`: the TVF collapses
    * to its table, `window_start` in the GROUP BY becomes
    * `session_window(ts, 'gap')` (a `window_end` grouping term is dropped —
    * it names the same session), and remaining `window_start`/`window_end`
    * references read the grouped struct's fields. Contract: the statement
    * must GROUP BY window_start (the TVF's session identity); other
    * spellings pass through and fail loudly at parse. */
  private val sessionRe =
    """(?is)session\s*\(\s*([\w.]+)\s*,\s*([\w.]+)\s*,\s*interval\s+'([^']+)'\s*\)""".r

  /** (table, tsCol, gap) of the statement's session TVF, if present. */
  private[graft] def sessionTvf(sql: String): Option[(String, String, String)] =
    sessionRe.findFirstMatchIn(sql).map(m => (m.group(1), m.group(2), m.group(3)))

  /** Re-aim the session TVF at a different source relation (the MV
    * maintainer's carried-state view), leaving the spelling intact. */
  private[graft] def retargetSessionTvf(sql: String, newTbl: String): String =
    sessionRe.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
      s"session($newTbl, ${m.group(2)}, interval '${m.group(3)}')"))

  def rewriteSession(sql: String): String = {
    val m = sessionRe.findFirstMatchIn(sql).getOrElse(return sql)
    val (tbl, c, dur) = (m.group(1), m.group(2), m.group(3))
    val collapsed = sessionRe.replaceAllIn(sql,
      java.util.regex.Matcher.quoteReplacement(tbl))
    val gIdx = topLevelIndexOf(collapsed, "GROUP")
    if (gIdx < 0) return collapsed
    val afterBy = collapsed.substring(gIdx).replaceFirst("(?is)^GROUP\\s+BY", "")
    val byOffset = collapsed.length - afterBy.length
    val clauseEnd = Seq("HAVING", "ORDER", "LIMIT", "OFFSET")
      .map(k => topLevelIndexOf(afterBy, k)).filter(_ >= 0)
      .minOption.getOrElse(afterBy.length)
    val clause = afterBy.substring(0, clauseEnd)
    val items = DdlParser.splitTopLevel(clause).map(_.trim).filter(_.nonEmpty)
      .flatMap {
        case i if i.equalsIgnoreCase("window_start") =>
          Some(s"session_window($c, '$dur')")
        case i if i.equalsIgnoreCase("window_end") => None
        case i => Some(i)
      }
    // expression-position references read the grouped struct's fields
    def fields(s: String): String = s
      .replaceAll("(?i)\\bwindow_start\\b", "session_window.start")
      .replaceAll("(?i)\\bwindow_end\\b", "session_window.end")
    // bare top-level select items keep their TVF column names — an
    // un-aliased field access would surface as `start`/`end`
    val prefix = collapsed.substring(0, byOffset)
    val selM = """(?is)^\s*SELECT\s+""".r.findFirstMatchIn(prefix)
    val fromIdx = topLevelIndexOf(prefix, "FROM")
    val rewrittenPrefix = selM match {
      case Some(sm) if fromIdx > sm.end =>
        val selItems = DdlParser.splitTopLevel(prefix.substring(sm.end, fromIdx))
          .map(_.trim).map {
            case i if i.equalsIgnoreCase("window_start") =>
              "session_window.start AS window_start"
            case i if i.equalsIgnoreCase("window_end") =>
              "session_window.end AS window_end"
            case i => fields(i)
          }
        prefix.substring(0, sm.end) + selItems.mkString(", ") + " " +
          fields(prefix.substring(fromIdx))
      case _ => fields(prefix)
    }
    rewrittenPrefix + " " + items.mkString(", ") + " " +
      fields(afterBy.substring(clauseEnd))
  }

  /** `expr::type` → `CAST(expr AS type)`. A small scanner (not regex): the
    * operand may be a quoted literal, a dotted identifier, or a balanced
    * parenthesized expression/function call; chains (`x::int::text`) resolve
    * left-to-right. */
  private def mapCastType(t: String): String = t.toUpperCase.replaceAll("\\s+", "") match {
    case "INT2" => "SMALLINT"
    case "INT4" => "INT"
    case "INT8" => "BIGINT"
    case "FLOAT4" => "FLOAT"
    case "FLOAT8" => "DOUBLE"
    case "TEXT" | "VARCHAR" => "STRING"
    case other => other
  }

  /** Index of the next `::` OUTSIDE string literals (a pattern like
    * `s RLIKE 'a::b'` must keep its literal intact). */
  private def nextCastIdx(s: String): Int = {
    var i = 0
    var inQ = false
    while (i < s.length - 1) {
      val c = s.charAt(i)
      if (c == '\'') inQ = !inQ
      else if (!inQ && c == ':' && s.charAt(i + 1) == ':') return i
      i += 1
    }
    -1
  }

  def rewriteCasts(sql: String): String = {
    val typeRe = """^\s*(\w+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)""".r
    var cur = sql
    var guard = 0
    while (guard < 1000) {
      guard += 1
      val i = nextCastIdx(cur)
      if (i <= 0) return cur
      typeRe.findFirstMatchIn(cur.substring(i + 2)) match {
        case None => return cur
        case Some(tm) =>
          val typeEnd = i + 2 + tm.end
          var start = i
          cur.charAt(i - 1) match {
            case ')' =>
              var depth = 0; var j = i - 1
              while (j >= 0 && { val c = cur.charAt(j)
                if (c == ')') depth += 1 else if (c == '(') depth -= 1; depth != 0 }) j -= 1
              var k = j - 1
              while (k >= 0 && (cur.charAt(k).isLetterOrDigit || cur.charAt(k) == '_' || cur.charAt(k) == '.')) k -= 1
              start = k + 1
            case '\'' =>
              var j = i - 2
              while (j >= 0 && cur.charAt(j) != '\'') j -= 1
              start = j
            case _ =>
              var j = i - 1
              while (j >= 0 && (cur.charAt(j).isLetterOrDigit || cur.charAt(j) == '_' || cur.charAt(j) == '.')) j -= 1
              start = j + 1
          }
          val operand = cur.substring(start, i)
          cur = cur.substring(0, start) +
            s"CAST($operand AS ${mapCastType(tm.group(1))})" + cur.substring(typeEnd)
      }
    }
    cur
  }

  /** `col ->> 'k'` / `col -> 'k'` → `get_json_object(col, '$.k')`. */
  private val jsonTextRe = """([\w.]+)\s*->>\s*'([^']+)'""".r
  private val jsonObjRe = """([\w.]+)\s*->\s*'([^']+)'""".r

  def rewriteJsonOps(sql: String): String = {
    val a = jsonTextRe.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(s"get_json_object(${m.group(1)}, '$$.${m.group(2)}')"))
    jsonObjRe.replaceAllIn(a, m =>
      java.util.regex.Matcher.quoteReplacement(s"get_json_object(${m.group(1)}, '$$.${m.group(2)}')"))
  }

  /** PG regex-match operators: `ident ~ 'pat'` → `(ident RLIKE 'pat')`,
    * `~*` (case-insensitive) → `(?i)` prefix, `!~`/`!~*` negated. A
    * literal-aware scanner, not a regex: tilde text INSIDE string literals
    * is copied verbatim (including PG `''` escapes), and pattern
    * backslashes are doubled — Spark's literal parser strips single
    * backslash escapes, which would turn `\d+` into `d+`. */
  def rewriteRegexMatch(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') {
        // copy a string literal verbatim ('' escapes included)
        val start = i
        i += 1
        var closed = false
        while (i < sql.length && !closed) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 2
            else { closed = true; i += 1 }
          } else i += 1
        }
        out.append(sql.substring(start, i))
      } else if (c == '~' || (c == '!' && i + 1 < sql.length && sql.charAt(i + 1) == '~')) {
        val opStart = i
        val neg = c == '!'
        var j = i + (if (neg) 2 else 1)
        val ci = j < sql.length && sql.charAt(j) == '*'
        if (ci) j += 1
        // LHS: the identifier already emitted to `out`
        var e = out.length
        while (e > 0 && out.charAt(e - 1).isWhitespace) e -= 1
        var bgn = e
        while (bgn > 0 && { val ch = out.charAt(bgn - 1)
          ch.isLetterOrDigit || ch == '_' || ch == '.' }) bgn -= 1
        // RHS: a quoted pattern literal
        var k = j
        while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
        if (bgn < e && k < sql.length && sql.charAt(k) == '\'') {
          val pat = new StringBuilder
          var p = k + 1
          var closed = false
          while (p < sql.length && !closed) {
            if (sql.charAt(p) == '\'') {
              if (p + 1 < sql.length && sql.charAt(p + 1) == '\'') { pat.append("''"); p += 2 }
              else { closed = true; p += 1 }
            } else { pat.append(sql.charAt(p)); p += 1 }
          }
          val lhs = out.substring(bgn, e)
          out.delete(bgn, out.length)
          val esc = (if (ci) "(?i)" else "") + pat.result().replace("\\", "\\\\")
          out.append(if (neg) s"(NOT $lhs RLIKE '$esc')" else s"($lhs RLIKE '$esc')")
          i = p
        } else {
          out.append(sql.substring(opStart, j))
          i = j
        }
      } else { out.append(c); i += 1 }
    }
    out.result()
  }

  /** `string_agg(x, 'd')` → `listagg(x, 'd')` (Spark 4 built-in; WITHIN
    * GROUP ordering passes through unchanged). */
  def rewriteStringAgg(sql: String): String =
    sql.replaceAll("(?i)\\bstring_agg\\s*\\(", "listagg(")

  /** `to_char(ts, 'YYYY-MM-DD HH24:MI:SS')` → `date_format` with PG format
    * tokens translated to java.time patterns. */
  private val toCharRe = """(?i)to_char\s*\(\s*([^,]+?)\s*,\s*'([^']+)'\s*\)""".r
  private val tokenMap = Seq(
    "YYYY" -> "yyyy", "YY" -> "yy", "MM" -> "MM", "DD" -> "dd",
    "HH24" -> "HH", "HH12" -> "hh", "MI" -> "mm", "SS" -> "ss", "MS" -> "SSS")

  def rewriteToChar(sql: String): String =
    toCharRe.replaceAllIn(sql, m => {
      val fmt = tokenMap.foldLeft(m.group(2)) { case (s, (pg, jt)) => s.replace(pg, jt) }
      java.util.regex.Matcher.quoteReplacement(s"date_format(${m.group(1)}, '$fmt')")
    })

  /** Qualify-mangle: occurrences of registered `schema.name` become the
    * session temp-view name `schema__name`. Only known catalog objects are
    * touched, so `alias.column` references survive. */
  def rewriteQualified(sql: String, qualified: Iterable[(String, String)]): String =
    qualified.foldLeft(sql) { case (s, (schema, name)) =>
      s.replaceAll(s"(?i)\\b${java.util.regex.Pattern.quote(s"$schema.$name")}\\b",
        java.util.regex.Matcher.quoteReplacement(mangle(schema, name)))
    }

  def mangle(schema: String, name: String): String =
    if (schema == "public") name else s"${schema}__$name"

  /** First index of keyword `kw` at paren-depth 0 outside string literals,
    * or -1. Shared with the engine's UPDATE/WHERE splitting. */
  private[engine] def topLevelIndexOf(s: String, kw: String, from: Int = 0): Int = {
    var depth = 0; var inQ = false; var i = from
    val u = s.toUpperCase
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          // '_' is part of SQL identifiers: without it in the boundary test
          // a keyword is matched INSIDE snake_case names (valid_from,
          // sort_order, rate_limit), mis-splitting the statement
          if (depth == 0 && u.startsWith(kw, i) &&
            (i == 0 || { val p = u.charAt(i - 1); !(p.isLetterOrDigit || p == '_') }) &&
            (i + kw.length >= u.length ||
              { val n = u.charAt(i + kw.length); !(n.isLetterOrDigit || n == '_') }))
            return i
      }
      i += 1
    }
    -1
  }

  /** `<inner> ORDER BY <order> LIMIT <n>` tail of a top-N statement →
    * (inner statement, order text, n). None when there is no top-level
    * ORDER BY + literal LIMIT, or an OFFSET follows (offset top-N is not
    * incrementally maintainable by truncation — rows below the offset
    * window still matter). Used by the MV maintainer to run the inner
    * statement as a stream and re-truncate per epoch. */
  private[graft] def splitTopNTail(sql: String): Option[(String, String, Int)] = {
    val oIdx = topLevelIndexOf(sql, "ORDER")
    if (oIdx < 0) return None
    val tail = sql.substring(oIdx)
    if (!tail.toUpperCase.matches("(?s)ORDER\\s+BY\\b.*")) return None
    if (topLevelIndexOf(sql, "OFFSET") >= 0) return None
    val lIdx = topLevelIndexOf(tail, "LIMIT")
    if (lIdx < 0) return None
    val orderText = tail.substring(0, lIdx).replaceAll("(?is)^ORDER\\s+BY", "").trim
    val limTxt = tail.substring(lIdx + 5).trim
    if (orderText.isEmpty || !limTxt.matches("\\d+")) return None
    Some((sql.substring(0, oIdx).trim, orderText, limTxt.toInt))
  }

  /** `SELECT DISTINCT list FROM …` → `SELECT list FROM … GROUP BY 1..n`
    * (positional ordinals, inserted before any top-level
    * ORDER/LIMIT/OFFSET tail). A DISTINCT projection IS the
    * grouped-by-every-output aggregate, and the GROUP BY spelling is the
    * shape the MV cascade maintains incrementally — keys-only
    * delta-accumulation, so a DISTINCT MV folds its sources' changelogs
    * instead of batch re-running per FLUSH (round 10). None when the
    * transform cannot be carried safely: no top-level SELECT DISTINCT,
    * `DISTINCT ON` (rewritten separately), a top-level set operation (an
    * appended clause would bind to the LAST branch only), or an existing
    * top-level GROUP BY (`SELECT DISTINCT agg FROM … GROUP BY k`). Used
    * ONLY by the MV maintainer's admission — batch queries keep Spark's
    * own Distinct plan. A miscount (e.g. `DISTINCT *`) yields an ordinal
    * or ungrouped-column ANALYSIS error, never silent wrong grouping, and
    * the admission's catch falls back to batch re-run. */
  private[graft] def distinctToGroupBy(sql: String): Option[String] = {
    val m = "(?is)^\\s*SELECT\\s+DISTINCT\\b".r.findFirstMatchIn(sql)
      .getOrElse(return None)
    if (sql.substring(m.end).trim.toUpperCase.startsWith("ON")) return None
    if (Seq("UNION", "INTERSECT", "EXCEPT", "GROUP")
        .exists(topLevelIndexOf(sql, _) >= 0)) return None
    val fromIdx = topLevelIndexOf(sql, "FROM")
    if (fromIdx < 0) return None
    val n = DdlParser.splitTopLevel(sql.substring(m.end, fromIdx))
      .map(_.trim).count(_.nonEmpty)
    if (n == 0) return None
    val stripped = sql.replaceFirst("(?is)^(\\s*SELECT)\\s+DISTINCT\\b", "$1")
    val groupBy = (1 to n).mkString(" GROUP BY ", ", ", " ")
    val cut = Seq("ORDER", "LIMIT", "OFFSET")
      .map(topLevelIndexOf(stripped, _)).filter(_ >= 0)
      .minOption.getOrElse(stripped.length)
    Some(stripped.substring(0, cut) + groupBy + stripped.substring(cut))
  }

  /** `SELECT list FROM … GROUP BY g HAVING p` → `SELECT list, (p) AS asCol
    * FROM … GROUP BY g`: folds the HAVING predicate into the aggregate's
    * own output as a boolean column, so a cascade MV can maintain the
    * PRE-HAVING aggregate as keyed state and apply the predicate when
    * deriving the visible snapshot (groups entering/leaving the predicate
    * become Insert/Delete in the 4-op changelog). None when there is no
    * top-level HAVING, or when the statement has a shape the textual fold
    * can't carry safely (set ops, SELECT DISTINCT, ORDER BY/LIMIT tails —
    * all of which the cascade path rejects anyway). */
  private[graft] def foldHaving(sql: String, asCol: String): Option[String] = {
    val hIdx = topLevelIndexOf(sql, "HAVING")
    if (hIdx < 0) return None
    if (Seq("UNION", "INTERSECT", "EXCEPT").exists(topLevelIndexOf(sql, _) >= 0))
      return None
    if (sql.matches("(?is)\\s*SELECT\\s+DISTINCT\\b.*")) return None
    val fromIdx = topLevelIndexOf(sql, "FROM")
    if (fromIdx < 0 || fromIdx > hIdx) return None
    val pred = sql.substring(hIdx + "HAVING".length)
    // the predicate must run to end-of-statement: a top-level ORDER/LIMIT
    // tail means a top-N statement, which is not cascade-shaped
    if (Seq("ORDER", "LIMIT", "OFFSET", "WINDOW")
        .exists(topLevelIndexOf(pred, _) >= 0)) return None
    if (pred.trim.isEmpty) return None
    // HAVING may reference SELECT-list aliases under HAVING resolution
    // rules; the folded predicate would resolve them as LATERAL column
    // aliases instead — same answer usually, but an alias that shadows a
    // source column binds to the SOURCE under lateral rules (silently
    // different groups), and with LCA disabled the fold fails analysis.
    // Reject the fold for any predicate whose TOP-LEVEL expression
    // references a select alias that is not itself a grouping column; the
    // cascade then falls back to batch re-run, which is always
    // value-correct. References inside parenthesized argument lists
    // (`SUM(sv)`) bind to the SOURCE column under both resolution paths
    // and are blanked before the scan, as are string literals.
    // depth-aware SELECT: a leading CTE's inner SELECT sits at paren depth
    // 1, and a plain indexOf would scan from inside it (wrong span, missed
    // aliases — the exact silent mis-binding this guard exists to stop)
    val selIdx = topLevelIndexOf(sql, "SELECT")
    if (selIdx < 0 || selIdx > fromIdx) return None
    val selectList = sql.substring(selIdx + "SELECT".length, fromIdx)
    val aliases = DdlParser.splitTopLevel(selectList).flatMap { raw =>
      val item = raw.trim
      "(?is).*\\bAS\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
        .findFirstMatchIn(item).map(_.group(1).toLowerCase)
        .orElse {
          // IMPLICIT alias (`SELECT sum(v) n`): a trailing bare identifier
          // after a non-empty expression aliases it just like AS would —
          // the round-7 advisory's gap. A bare column reference (`k`,
          // `t.k`) has no preceding expression and is not an alias. Over-
          // matching (e.g. the END of a CASE) only REJECTS the fold, which
          // falls back to batch re-run — value-correct, never mis-bound.
          "(?is)^(.*?[^A-Za-z0-9_.])\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
            .findFirstMatchIn(item)
            .filter(_.group(1).trim.nonEmpty)
            .map(_.group(2).toLowerCase)
        }
    }
    val groupText = {
      val gIdx = topLevelIndexOf(sql, "GROUP")
      if (gIdx < 0 || gIdx > hIdx) ""
      else sql.substring(gIdx, hIdx).replaceAll("(?is)^GROUP\\s+BY", "")
    }
    val groupCols = DdlParser.splitTopLevel(groupText)
      .map(_.trim.toLowerCase).filter(_.matches("[a-z_][a-z0-9_]*")).toSet
    var predScan = pred.toLowerCase.replaceAll("'[^']*'", "''")
    var prevScan = ""
    // fixed-point, not contains("("): an unbalanced paren (malformed SQL
    // that reached us through the regex relation-scan fallback) never
    // matches the innermost-pair pattern and would spin forever
    while (predScan.contains("(") && predScan != prevScan) {
      prevScan = predScan
      predScan = predScan.replaceAll("\\([^()]*\\)", " ")
    }
    if (predScan.contains("(")) return None // unbalanced — not foldable
    val referencesNonGroupAlias = aliases.exists { a =>
      !groupCols.contains(a) &&
        s"(?<![a-z0-9_])${java.util.regex.Pattern.quote(a)}(?![a-z0-9_])".r
          .findFirstIn(predScan).nonEmpty
    }
    if (referencesNonGroupAlias) return None
    Some(sql.substring(0, fromIdx) + s", (${pred.trim}) AS $asCol " +
      sql.substring(fromIdx, hIdx).trim)
  }

  /** `SELECT DISTINCT ON (keys) list FROM ... ORDER BY ...` (PG/RisingWave;
    * no Spark equivalent) → keep the first row per key group under the
    * query's ORDER BY, via a `row_number` window. Applied to top-level
    * SELECT DISTINCT ON statements only (the spelling the reference's
    * passthrough would receive). */
  def rewriteDistinctOn(sql: String): String = {
    val head = """(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(""".r.findFirstMatchIn(sql)
      .getOrElse(return sql)
    var i = head.end - 1
    var depth = 0
    while (i < sql.length && { val c = sql.charAt(i)
      if (c == '(') depth += 1 else if (c == ')') depth -= 1; depth != 0 }) i += 1
    val keys = sql.substring(head.end, i).trim
    val rest = sql.substring(i + 1)
    val fromIdx = topLevelIndexOf(rest, "FROM")
    if (fromIdx < 0) return sql
    val selectList = rest.substring(0, fromIdx).trim
    val tail = rest.substring(fromIdx + 4)
    val orderIdx = topLevelIndexOf(tail, "ORDER")
    val (fromPart0, orderPart) =
      if (orderIdx < 0) (tail.trim, "")
      else (tail.substring(0, orderIdx).trim,
        tail.substring(orderIdx).replaceAll("(?is)^ORDER\\s+BY", "").trim)
    // LIMIT/OFFSET must not stay inside the derived table (they would
    // apply BEFORE deduplication — PG applies them after) nor leak into
    // the window ORDER BY
    def cutAt(str: String): Int =
      Seq(topLevelIndexOf(str, "LIMIT"), topLevelIndexOf(str, "OFFSET"))
        .filter(_ >= 0).minOption.getOrElse(-1)
    val bareLimIdx = if (orderIdx < 0) cutAt(fromPart0) else -1
    val (fromPart, bareLimit) =
      if (bareLimIdx < 0) (fromPart0, "")
      else (fromPart0.substring(0, bareLimIdx).trim,
        " " + fromPart0.substring(bareLimIdx).trim)
    val limIdx = cutAt(orderPart)
    val windowOrder =
      if (orderPart.isEmpty) keys
      else if (limIdx < 0) orderPart
      else orderPart.substring(0, limIdx).trim
    val outerOrder = if (orderPart.isEmpty) "" else s" ORDER BY $orderPart"
    s"SELECT $selectList FROM (SELECT *, row_number() OVER (" +
      s"PARTITION BY $keys ORDER BY $windowOrder) AS __rn FROM $fromPart) __don " +
      s"WHERE __rn = 1$outerOrder$bareLimit"
  }

  /** `EMIT ON WINDOW CLOSE` (RisingWave emit-policy clause) is accepted and
    * stripped: our MVs emit eager corrections (update mode / epoch diffs),
    * whose final state is identical — RisingWave's clause only suppresses
    * the intermediate emissions. */
  def rewriteEmitClause(sql: String): String =
    sql.replaceAll("(?i)\\bEMIT\\s+ON\\s+WINDOW\\s+CLOSE\\b", " ")

  /** RisingWave process-time temporal join — `JOIN dim FOR SYSTEM_TIME AS
    * OF PROCTIME() ON ...` joins each stream row against the dimension
    * table's state at processing time. Our engine evaluates every statement
    * against live tables' CURRENT snapshot, which is exactly the
    * processing-time state, so the clause is accepted and stripped; a
    * dependent MV re-reads the dimension's latest rows at each FLUSH epoch,
    * matching RisingWave's no-backfill temporal-join semantics. Historical
    * `FOR SYSTEM_TIME AS OF <timestamp>` reads are NOT supported and are
    * left un-rewritten (they fail loudly at parse rather than silently
    * reading the wrong snapshot). */
  def rewriteTemporalJoin(sql: String): String =
    sql.replaceAll("(?i)\\bFOR\\s+SYSTEM_TIME\\s+AS\\s+OF\\s+PROCTIME\\s*\\(\\s*\\)", " ")

  /** `FROM generate_series(a, b)` (PG/RisingWave set-returning function) →
    * exploded `sequence`; the output column keeps PG's name. */
  private val seriesRe = """(?i)generate_series\s*\(\s*([^,()]+)\s*,\s*([^,()]+)\s*\)""".r

  def rewriteGenerateSeries(sql: String): String =
    seriesRe.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
      s"(SELECT explode(sequence(${m.group(1)}, ${m.group(2)})) AS generate_series)"))

  def apply(sql: String, qualified: Iterable[(String, String)] = Nil): String = {
    val steps: Seq[String => String] = Seq(
      rewriteTumble, rewriteHop, rewriteSession, rewriteDistinctOn, rewriteEmitClause,
      rewriteTemporalJoin,
      rewriteCasts, rewriteJsonOps, rewriteStringAgg,
      rewriteToChar, rewriteGenerateSeries, rewriteRegexMatch,
      s => rewriteQualified(s, qualified))
    steps.foldLeft(sql)((acc, f) => f(acc))
  }
}
