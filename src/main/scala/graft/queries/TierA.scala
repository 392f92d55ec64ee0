package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{q, rowsOnly}
import org.apache.spark.sql.functions._

/** Tier A — constructs the reference itself emits (SURVEY §2.1–§2.10).
  *
  * The reference (risingwave-py) delegates the relational half of every
  * operator to its server; here both halves run natively on Spark. Each
  * query re-expresses a cited reference construct over the driver fixtures
  * (`events` plays the role of the demo tick stream, `demo.py:10-30`).
  */
object TierA {

  val defs: Seq[QueryDef] = Seq(

    // S1 — full table scan, `SELECT * FROM t` (README.md:55, demo.py:155).
    q("a_s1_scan",
      "SELECT r_regionkey, r_name FROM region") { (s, dir) =>
      Tables(s, dir, "region").select("r_regionkey", "r_name")
    },

    // S2 — catalog column scan (risingwave/core.py:70-72): ordered column
    // list of a table, served from our catalog rather than a server's
    // information_schema. Oracle pins the expected catalog contents.
    q("a_s2_catalog_columns",
      "SELECT * FROM (VALUES (1,'n_nationkey'),(2,'n_name'),(3,'n_regionkey')) AS t(ordinal, column_name)") {
      (s, dir) =>
        val fields = Tables(s, dir, "nation").schema.fields
        val rows = fields.zipWithIndex.map { case (f, i) => (i + 1, f.name) }
        s.createDataFrame(rows.toSeq).toDF("ordinal", "column_name")
    },

    // P1+P5+W1+A1+A2 — the demo_simple MV (demo.py:98-100):
    //   SELECT window_start, window_end, symbol, ROUND(avg(close)) AS avg_price
    //   FROM tumble(tick, timestamp, interval '10 seconds') GROUP BY 1,2,3
    // re-expressed over `events` with 10-minute tumbles. `window()` is the
    // Spark-native tumble; start/end surfaced under the reference's names.
    // Timestamps are surfaced as epoch-second BIGINTs: Spark writes
    // tz-adjusted int96/µs parquet while DuckDB yields naive timestamps, and
    // the driver hash-compares raw values — integers are unambiguous.
    q("a_w1_tumble_avg",
      """SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
        |       CAST(floor(epoch(ts)/600)*600 + 600 AS BIGINT) AS window_end,
        |       event_type,
        |       round(avg(value)) AS avg_price
        |FROM events GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(round(avg(col("value"))).as("avg_price"))
        .select(col("window.start").cast("long").as("window_start"),
                col("window.end").cast("long").as("window_end"),
                col("event_type"), col("avg_price"))
    },

    // W1 (sliding form) — the hop() TVF through the dialect shim: 30-minute
    // windows sliding every 10 minutes, so each event lands in 3 windows.
    // The oracle enumerates the 3 covering hops per event explicitly.
    q("a_w2_hop_avg",
      """SELECT CAST(floor(epoch(ts)/600)*600 - j*600 AS BIGINT) AS ws, event_type,
        |  count(*) AS n, round(avg(value), 4) AS avg_v
        |FROM events, (SELECT unnest(range(3)) AS j)
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(graft.engine.Dialect(
        """SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS ws, event_type,
          |  count(*) AS n, round(avg(value), 4) AS avg_v
          |FROM hop(events, ts, interval '10 minutes', interval '30 minutes')
          |GROUP BY 1, 2""".stripMargin))
    },

    // P4 — conjunctive equality predicate WHERE a='x' AND b='y'
    // (risingwave/core.py:71, :351) + P2 projection.
    q("a_p4_conjunctive_filter",
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' AND user_id = 7""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") === 7L)
        .select("event_id", "user_id", "value")
    },

    // A3 — non-windowed grouped avg, the README walkthrough MV
    // (README.md:91): SELECT product, avg(price) FROM test_product GROUP BY product.
    q("a_a3_group_avg",
      """SELECT event_type, round(avg(value), 4) AS avg_value, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(round(avg("value"), 4).as("avg_value"), count(lit(1)).as("n"))
    },

    // A5/K6 — keyed upsert, keep row with max version column
    // (risingwave/core.py:509: ON CONFLICT DO UPDATE ... WITH VERSION COLUMN):
    // latest event per user wins; max_by is the Spark-native monotone merge.
    q("a_k6_upsert_latest",
      """SELECT user_id, arg_max(value, event_id) AS last_value,
        |       max(event_id) AS version
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(max_by(col("value"), col("event_id")).as("last_value"),
             max("event_id").as("version"))
    },

    // P8 — changelog-style predicate (demo.py:50-52): op IN (...) AND measure
    // >= threshold, applied over a change-shaped projection of events.
    q("a_p8_changelog_filter",
      """SELECT event_id, event_type AS op, value AS avg_price FROM events
        |WHERE event_type IN ('click', 'view') AND value >= 300""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("event_id"), col("event_type").as("op"), col("value").as("avg_price"))
          .filter(col("op").isin("click", "view") && col("avg_price") >= 300)
    },

    // S4/C12 — version() scalar (risingwave/core.py:602).
    q("a_s4_version",
      "SELECT 'graft-0.1.0-spark' AS version") { (s, _) =>
      s.sql(s"SELECT '${graft.engine.Version.string}' AS version")
    }
  )
}
