package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{q, rowsOnly}
import graft.engine.{ConnOptions, GraftEngine}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming parity — the MV invariant, driver-verifiable: the `events`
  * fixture is replayed through the engine's live-table → MV → changelog
  * runtime in 8 contiguous event_id chunks with a FLUSH barrier after each,
  * and the DuckDB oracle checks
  *   (a) final incremental MV state == batch evaluation of the defining
  *       query, and
  *   (b) the changelog op counts == what chunked incremental maintenance
  *       must emit (1 Insert per key + one UpdateDelete/UpdateInsert pair
  *       per additional chunk that touches the key).
  */
object StreamingParity {

  private val CHUNKS = 8

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Replay events into a fresh live table in event_id-chunked epochs,
    * flushing between chunks; returns the engine for inspection. MVs are
    * created in order, so later ones may reference earlier ones (cascades). */
  private def replay(spark: SparkSession, dir: String, table: String,
                     mvDefs: Seq[(String, String)]): GraftEngine = {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable(table, eventsSchema)
    mvDefs.foreach { case (name, stmt) => rw.mv(stmt, name) }
    val rows = Tables(spark, dir, "events")
      .select(eventsSchema.fieldNames.toIndexedSeq.map(col): _*)
      .collect().sortBy(_.getLong(0))
    val n = rows.length
    val chunkSize = (n + CHUNKS - 1) / CHUNKS
    rows.grouped(chunkSize).foreach { chunk =>
      rw.table(table).get.insert(chunk.toSeq)
      rw.flush()
    }
    rw
  }

  val defs: Seq[QueryDef] = Seq(

    // A3/A4 — incrementally-maintained grouped aggregate: final state must
    // equal the batch aggregate (decimal sums exact, avg rounded).
    q("m_mv_groupagg_incremental",
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
        |  round(avg(value), 4) AS avg_v
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_agg", Seq(("m_agg_mv",
        """SELECT event_type, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv,
          |  round(avg(value), 4) AS avg_v
          |FROM m_ev_agg GROUP BY event_type""".stripMargin)))
      // decimal internally (exact incremental sums); double at the output
      // boundary (no decimal-typed columns reach the driver's hasher)
      val out = rw.mvByName("m_agg_mv").get.df
        .withColumn("sv", col("sv").cast("double"))
      val materialized = out.localCheckpoint(true)
      rw.close() // snapshot stays valid (checkpointed RDD); maintainers stop
      materialized
    },

    // W1/W2/A4 — incrementally-maintained tumble-window aggregate (the
    // demo_simple MV shape, `demo.py:98-100`) over 10-minute windows.
    q("m_mv_tumble_incremental",
      """SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS ws, event_type,
        |  count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_tw", Seq(("m_tw_mv",
        """SELECT window_start, event_type, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM tumble(m_ev_tw, ts, interval '10 minutes')
          |GROUP BY window_start, event_type""".stripMargin)))
      val out = rw.mvByName("m_tw_mv").get.df
        .select(col("window_start").cast("long").as("ws"), col("event_type"),
          col("n"), col("sv").cast("double").as("sv"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // W1b — incrementally-maintained hop (sliding) window aggregate:
    // every event lands in size/slide = 3 windows; the oracle replicates
    // the window fan-out with an epoch-arithmetic cross join. Mode
    // asserted: the hop TVF maps to Spark's sliding window() and must
    // maintain via the streaming path, not per-flush batch re-run.
    q("m_mv_hop_incremental",
      """SELECT CAST(floor(epoch(ts)/600)*600 - j*600 AS BIGINT) AS ws, event_type,
        |  count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM events, (SELECT unnest(range(3)) AS j)
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_hop", Seq(("m_hop_mv",
        """SELECT window_start, event_type, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM hop(m_ev_hop, ts, interval '10 minutes', interval '30 minutes')
          |GROUP BY window_start, event_type""".stripMargin)))
      val mv = rw.mvByName("m_hop_mv").get
      require(mv.isStreamingMode,
        "hop MV fell back to batch re-run — must maintain incrementally")
      val out = mv.df
        .select(col("window_start").cast("long").as("ws"), col("event_type"),
          col("n"), col("sv").cast("double").as("sv"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // A4/§2.11 joins — incrementally-maintained stream⋈static enrichment MV
    // (the canonical dimension-join MV): the live events stream joins the
    // static `nation` dimension with an aggregate on top, maintained by the
    // STREAMING path (asserted — a silent fall-back to per-flush batch
    // re-run would still produce the right values, so the mode check is the
    // actual gate), and the final state must equal the batch join+aggregate.
    q("m_mv_join_incremental",
      """SELECT n.n_name AS nation, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
        |GROUP BY n.n_name""".stripMargin) { (s, dir) =>
      Tables(s, dir, "nation").createOrReplaceTempView("nation")
      val rw = replay(s, dir, "m_ev_join", Seq(("m_join_mv",
        """SELECT n.n_name AS nation, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM m_ev_join e JOIN nation n ON n.n_nationkey = e.user_id % 25
          |GROUP BY n.n_name""".stripMargin)))
      val mv = rw.mvByName("m_join_mv").get
      require(mv.isStreamingMode,
        "join MV fell back to batch re-run — must be maintained incrementally")
      val out = mv.df.withColumn("sv", col("sv").cast("double"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // D4 cascade — streaming MV-on-MV: an append-only filter MV feeds a
    // keyed aggregate MV through its streaming face (one backfilled
    // MemoryStream per downstream reader). BOTH levels must run in
    // streaming mode — the filter level as an append stream, the aggregate
    // level incrementally over the filter's per-epoch face batches — and
    // the final downstream state must equal the batch evaluation of the
    // composed query. A silent fall-back to per-flush batch re-run would
    // still produce the right values, so the mode assertions are the gate.
    q("m_mv_cascade_incremental",
      """SELECT user_id % 10 AS bucket, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM events WHERE event_type = 'click' GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_cas", Seq(
        ("m_cas_filter",
          "SELECT event_id, ts, user_id, event_type, value FROM m_ev_cas WHERE event_type = 'click'"),
        ("m_cas_agg",
          """SELECT user_id % 10 AS bucket, count(*) AS n,
            |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
            |FROM m_cas_filter GROUP BY 1""".stripMargin)))
      val up = rw.mvByName("m_cas_filter").get
      val down = rw.mvByName("m_cas_agg").get
      require(up.isStreamingMode,
        "filter MV fell back to batch re-run — must stream")
      require(down.isStreamingMode,
        "cascaded aggregate MV fell back to batch re-run — must bind the upstream streaming face")
      val out = down.df.withColumn("sv", col("sv").cast("double"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // D4 cascade, aggregating upstream (round-4 verdict item 1) — the
    // hourly→daily rollup shape: a streaming Keyed tumble-aggregate MV
    // feeds a SECOND aggregate MV. The upstream's deltas are updates, so no
    // append-only face exists; the downstream must consume the upstream's
    // 4-op changelog as a retraction stream and fold UD/UI pairs into its
    // own groups. BOTH maintenance modes are asserted (values alone
    // wouldn't distinguish this from per-flush batch re-run), and the final
    // state must equal the batch evaluation of the composed rollup.
    q("m_mv_agg_cascade_incremental",
      """SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS hs, event_type,
        |  count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_agc", Seq(
        ("m_agc_up",
          """SELECT window_start, event_type, count(*) AS n,
            |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
            |FROM tumble(m_ev_agc, ts, interval '10 minutes')
            |GROUP BY window_start, event_type""".stripMargin),
        ("m_agc_daily",
          """SELECT date_trunc('hour', window_start) AS hs, event_type,
            |  CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv
            |FROM m_agc_up GROUP BY date_trunc('hour', window_start), event_type""".stripMargin)))
      val up = rw.mvByName("m_agc_up").get
      val down = rw.mvByName("m_agc_daily").get
      require(up.isStreamingMode,
        "upstream aggregate MV fell back to batch re-run — must stream")
      require(down.isChangelogCascadeMode,
        "downstream rollup fell back to batch re-run — must consume the upstream changelog")
      val out = down.df.select(col("hs").cast("long").as("hs"), col("event_type"),
        col("n"), col("sv").cast("double").as("sv"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // HAVING cascade (round-5 verdict item 3) — the predicate folds into
    // the pre-HAVING aggregate's state so the chain stays incremental:
    // touched-key detection and state maintenance run on the unfiltered
    // rollup, the predicate applies at snapshot derivation, and groups
    // crossing it become Insert/Delete. The threshold (avg value > 49)
    // splits the event types 3/2 at final state with ≥ 0.4 margins, so
    // decimal-vs-double predicate evaluation cannot flip a group. Both
    // maintenance modes asserted — a demotion to per-flush batch re-run
    // would match values anyway.
    q("m_mv_having_cascade_incremental",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM events GROUP BY event_type
        |HAVING SUM(CAST(value AS DECIMAL(18,6))) / count(*) > 49""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_hvc", Seq(
        ("m_hvc_up",
          """SELECT window_start, event_type, count(*) AS n,
            |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
            |FROM tumble(m_ev_hvc, ts, interval '10 minutes')
            |GROUP BY window_start, event_type""".stripMargin),
        ("m_hvc_sel",
          """SELECT event_type, CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv
            |FROM m_hvc_up GROUP BY event_type
            |HAVING SUM(sv) / SUM(n) > 49""".stripMargin)))
      val up = rw.mvByName("m_hvc_up").get
      val down = rw.mvByName("m_hvc_sel").get
      require(up.isStreamingMode,
        "upstream aggregate MV fell back to batch re-run — must stream")
      require(down.isChangelogCascadeMode,
        "HAVING rollup fell back to batch re-run — the folded predicate must keep it cascading")
      val out = down.df.withColumn("sv", col("sv").cast("double"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // TopN — incrementally-maintained `ORDER BY ... LIMIT` MV (RisingWave's
    // TopN operator): the inner statement streams and the snapshot is
    // re-truncated per epoch with O(n) carried state; displaced rows
    // retract. Mode-asserted — batch re-run would match values anyway.
    q("m_mv_topn_incremental",
      """SELECT event_id, user_id, value FROM events
        |ORDER BY value DESC, event_id LIMIT 25""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_topn", Seq(("m_topn_mv",
        """SELECT event_id, user_id, value FROM m_ev_topn
          |ORDER BY value DESC, event_id LIMIT 25""".stripMargin)))
      val mv = rw.mvByName("m_topn_mv").get
      require(mv.isStreamingMode && mv.isTopNMode,
        "top-N MV fell back to batch re-run — must re-truncate incrementally")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // TopN→cascade (round-7): a grouped top-N leaderboard feeds a keyed
    // rollup. The leaderboard's changelog carries displacement Deletes and
    // merge retractions; the downstream folds them via the changelog-
    // cascade path — the leaderboard→summary shape the round-6 verdict
    // called out. BOTH modes asserted (values alone wouldn't distinguish
    // this from per-flush batch re-run).
    q("m_mv_topn_cascade_incremental",
      """WITH top AS (
        |  SELECT user_id, count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv
        |  FROM events GROUP BY user_id
        |  ORDER BY sv DESC, user_id LIMIT 25)
        |SELECT user_id % 5 AS bucket, CAST(SUM(n) AS BIGINT) AS n,
        |  CAST(SUM(sv) AS DOUBLE) AS sv
        |FROM top GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_tnc", Seq(
        ("m_tnc_top",
          """SELECT user_id, count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv
            |FROM m_ev_tnc GROUP BY user_id
            |ORDER BY sv DESC, user_id LIMIT 25""".stripMargin),
        ("m_tnc_roll",
          """SELECT user_id % 5 AS bucket, CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv
            |FROM m_tnc_top GROUP BY user_id % 5""".stripMargin)))
      val up = rw.mvByName("m_tnc_top").get
      val down = rw.mvByName("m_tnc_roll").get
      require(up.isTopNMode && up.isChangelogCascadeMode,
        "leaderboard fell back to batch re-run — must take the cascade-backed top-N path")
      require(down.isChangelogCascadeMode,
        "rollup over the top-N MV fell back to batch re-run — must consume its changelog")
      val out = down.df.withColumn("sv", col("sv").cast("double"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // W-session (round-4 verdict item 4, the last windowing gap) — an
    // incrementally-maintained session-window aggregate: the session TVF
    // maps to Spark's session_window, maintained by the dedicated session
    // path (mode-asserted — sessions MERGE as rows arrive, which neither
    // append nor update output modes can express, so the maintainer
    // re-sessionizes its carried state per epoch and the changelog shows
    // merges as Delete+Insert). Final state must equal batch sessionization
    // (DuckDB: lag-gap breaks at >= 300 s — Spark's session_window opens a
    // NEW session when the gap reaches the duration; bounds are
    // [min ts, max ts + gap), floored to whole seconds on both sides).
    q("m_mv_session_incremental",
      """WITH o AS (SELECT event_type, epoch(ts) AS e, value FROM events),
        |m AS (SELECT event_type, e, value,
        |  CASE WHEN lag(e) OVER w IS NULL OR e - lag(e) OVER w >= 300 THEN 1 ELSE 0 END AS brk
        |  FROM o WINDOW w AS (PARTITION BY event_type ORDER BY e)),
        |s AS (SELECT event_type, e, value,
        |  SUM(brk) OVER (PARTITION BY event_type ORDER BY e ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT CAST(floor(min(e)) AS BIGINT) AS ws,
        |  CAST(floor(max(e) + 300) AS BIGINT) AS we,
        |  event_type, count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM s GROUP BY event_type, sid""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_sess", Seq(("m_sess_mv",
        """SELECT window_start, window_end, event_type, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM session(m_ev_sess, ts, interval '5 minutes')
          |GROUP BY window_start, window_end, event_type""".stripMargin)))
      val mv = rw.mvByName("m_sess_mv").get
      require(mv.isStreamingMode && mv.isSessionMode,
        "session MV fell back to batch re-run — must re-sessionize incrementally")
      val out = mv.df.select(
        col("window_start").cast("long").as("ws"),
        col("window_end").cast("long").as("we"),
        col("event_type"), col("n"), col("sv").cast("double").as("sv"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Session→cascade (round-7): a session-window MV feeds a keyed rollup —
    // completes the cascade admission matrix (plain agg, HAVING, top-N,
    // session upstreams). Session merges surface in the upstream changelog
    // as Delete+Insert pairs; the downstream folds them through the
    // changelog-cascade path. BOTH modes asserted.
    q("m_mv_session_cascade_incremental",
      """WITH o AS (SELECT event_type, epoch(ts) AS e, value FROM events),
        |m AS (SELECT event_type, e, value,
        |  CASE WHEN lag(e) OVER w IS NULL OR e - lag(e) OVER w >= 300 THEN 1 ELSE 0 END AS brk
        |  FROM o WINDOW w AS (PARTITION BY event_type ORDER BY e)),
        |s AS (SELECT event_type, e, value,
        |  SUM(brk) OVER (PARTITION BY event_type ORDER BY e ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m),
        |sess AS (SELECT event_type, sid, count(*) AS n,
        |  SUM(CAST(value AS DECIMAL(18,6))) AS sv FROM s GROUP BY event_type, sid)
        |SELECT event_type, count(*) AS n_sessions,
        |  CAST(SUM(n) AS BIGINT) AS n_events, CAST(SUM(sv) AS DOUBLE) AS sv
        |FROM sess GROUP BY event_type""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_sc", Seq(
        ("m_sc_sess",
          """SELECT window_start, window_end, event_type, count(*) AS n,
            |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
            |FROM session(m_ev_sc, ts, interval '5 minutes')
            |GROUP BY window_start, window_end, event_type""".stripMargin),
        ("m_sc_roll",
          """SELECT event_type, count(*) AS n_sessions,
            |CAST(SUM(n) AS BIGINT) AS n_events, SUM(sv) AS sv
            |FROM m_sc_sess GROUP BY event_type""".stripMargin)))
      val up = rw.mvByName("m_sc_sess").get
      val down = rw.mvByName("m_sc_roll").get
      require(up.isStreamingMode && up.isSessionMode,
        "session MV fell back to batch re-run — must re-sessionize incrementally")
      require(down.isChangelogCascadeMode,
        "rollup over the session MV fell back to batch re-run — must consume its changelog")
      val out = down.df.withColumn("sv", col("sv").cast("double"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Operator×runtime composition — exact dedup AS a streaming MV: the
    // survivor-selection aggregate (fingerprint → min-id, group size) runs
    // as an update-mode Keyed MV over a live documents table, maintained
    // incrementally across chunked ingest (mode-asserted) — the
    // dedup-operators-compose-with-MVs claim, verified end-to-end.
    q("m_mv_dedup_incremental",
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS group_size
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      rw.createTable("m_docs", StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
      rw.mv(
        "SELECT md5(regexp_replace(lower(trim(text)), '\\\\s+', ' ')) AS fp, " +
          "min(doc_id) AS keep_id, count(*) AS group_size FROM m_docs GROUP BY 1",
        "m_dedup_mv")
      val rows = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).collect().sortBy(_.getLong(0))
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        rw.table("m_docs").get.insert(chunk.toSeq); rw.flush()
      }
      val mv = rw.mvByName("m_dedup_mv").get
      require(mv.isStreamingMode,
        "dedup MV fell back to batch re-run — must maintain incrementally")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // W3/W4 — the changelog itself: op counts of chunked incremental
    // maintenance are predictable from chunk/key co-occurrence (count(*)
    // strictly grows per touch, so every later touch is an UD/UI pair).
    q("m_changelog_ops",
      s"""WITH ch AS (SELECT *,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |k AS (SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS ws, event_type,
         |    count(DISTINCT chunk) AS nc
         |  FROM ch GROUP BY 1, 2)
         |SELECT count(*) AS n_insert,
         |  CAST(SUM(nc) - count(*) AS BIGINT) AS n_update_insert,
         |  CAST(SUM(nc) - count(*) AS BIGINT) AS n_update_delete
         |FROM k""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_cl", Seq(("m_cl_mv",
        """SELECT window_start, event_type, count(*) AS n
          |FROM tumble(m_ev_cl, ts, interval '10 minutes')
          |GROUP BY window_start, event_type""".stripMargin)))
      val sub = rw.mvByName("m_cl_mv").get.subscription().declareCursor(Some(0L))
      val ops = Iterator.continually(sub.fetch(10000)).takeWhile(_.nonEmpty).flatten.toSeq
      rw.close()
      val counts = ops.groupBy(r => r.getString(r.length - 2)).view.mapValues(_.size.toLong).toMap
      import s.implicits._
      Seq((counts.getOrElse("Insert", 0L),
        counts.getOrElse("UpdateInsert", 0L),
        counts.getOrElse("UpdateDelete", 0L)))
        .toDF("n_insert", "n_update_insert", "n_update_delete")
    },

    // Upsert→cascade (round-8): the reference's CANONICAL shape — a keyed
    // upsert table (`risingwave/core.py:506-513`) with an aggregate MV over
    // it (`:451-456`) — maintained INCREMENTALLY: the table emits its own
    // 4-op changelog (UpdateDelete/UpdateInsert per overwritten key), and
    // the MV folds it through the changelog-cascade path instead of batch
    // re-running the aggregate every FLUSH. Chunked ingest in event_id
    // order re-writes most keys repeatedly (events has ~8 rows per
    // user_id), so the retraction fold is exercised hard. Mode-asserted —
    // batch re-run would match values anyway.
    q("m_mv_upsert_cascade_incremental",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val t = rw.createTable("m_upc_t",
        StructType(Seq(StructField("user_id", LongType),
          StructField("value", DoubleType), StructField("event_id", LongType))),
        primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      rw.mv(
        """SELECT user_id % 10 AS bucket, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM m_upc_t GROUP BY 1""".stripMargin, "m_upc_mv")
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
        .collect().sortBy(_.getLong(2))
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        t.insert(chunk.toSeq); rw.flush()
      }
      val mv = rw.mvByName("m_upc_mv").get
      require(mv.isChangelogCascadeMode,
        "aggregate over the upsert table fell back to batch re-run — " +
          "must consume the table's changelog")
      require(mv.isDeltaAggMode,
        "COUNT/SUM over a table must fold algebraically (round 9)")
      val out = mv.df.withColumn("sv", col("sv").cast("double"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // K6 — upsert table with version column, fed through the live ingest
    // path: latest event per user wins.
    q("m_upsert_version_table",
      """SELECT user_id, arg_max(value, event_id) AS value, max(event_id) AS event_id
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val t = rw.createTable("m_upsert_t",
        StructType(Seq(StructField("user_id", LongType),
          StructField("value", DoubleType), StructField("event_id", LongType))),
        primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
        .collect().sortBy(_.getLong(2))
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        t.insert(chunk.toSeq); rw.flush()
      }
      val out = t.batchDF.select("user_id", "value", "event_id")
      rw.close()
      out
    },

    // W5 — SINCE-0 replay: the full change history of a chunked incremental
    // count MV is predictable — per event_type, an Insert at its first
    // touching chunk (cumulative count), then an UpdateDelete/UpdateInsert
    // pair per later touching chunk. Cursor-vs-cursor replay identity is
    // asserted in EngineSpec.
    q("m_subscription_since_replay",
      s"""WITH ch AS (SELECT event_type,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |cc AS (SELECT event_type, chunk, count(*) AS c FROM ch GROUP BY 1, 2),
         |cum AS (SELECT event_type, chunk,
         |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY chunk) AS BIGINT) AS cum,
         |    row_number() OVER (PARTITION BY event_type ORDER BY chunk) AS rn
         |  FROM cc)
         |SELECT event_type, cum AS n,
         |  CASE WHEN rn = 1 THEN 'Insert' ELSE 'UpdateInsert' END AS op FROM cum
         |UNION ALL
         |SELECT event_type,
         |  lag(cum) OVER (PARTITION BY event_type ORDER BY chunk) AS n,
         |  'UpdateDelete' AS op
         |FROM cum QUALIFY rn > 1""".stripMargin) { (s, dir) =>
      val rw = replay(s, dir, "m_ev_since", Seq(("m_since_mv",
        "SELECT event_type, count(*) AS n FROM m_ev_since GROUP BY event_type")))
      val sub = rw.mvByName("m_since_mv").get.subscription().declareCursor(Some(0L))
      val ops = Iterator.continually(sub.fetch(10000)).takeWhile(_.nonEmpty).flatten.toSeq
      rw.close()
      import s.implicits._
      ops.map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toDF("event_type", "n", "op")
    },

    // ---- round-9 fold paths, driver-verified ---------------------------
    // The retraction-source matrix (SURVEY §2 round-9 additions): raw
    // top-N, grouped top-N, and session MVs maintained over PK/upsert
    // tables by folding the table's keyed 4-op changelog, plus UPDATE/
    // DELETE flowing through a cascade MV without demotion. Each entry
    // asserts the MODE (values alone wouldn't distinguish the fold path
    // from per-flush batch re-run) and hash-compares the final state
    // against the upsert-resolved batch evaluation in DuckDB.

    // Raw top-N over an upsert table (Mv.tryStartTopNCascade, raw inner):
    // upsert overwrites retract carried rows and force a re-fetch; final
    // state must equal the top-N over latest-version-per-key.
    q("m_mv_topn_pk_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT user_id, value FROM latest
        |ORDER BY value DESC, user_id LIMIT 25""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_tpf_t", Seq(("m_tpf_mv",
        """SELECT user_id, value FROM m_tpf_t
          |ORDER BY value DESC, user_id LIMIT 25""".stripMargin)))
      val mv = rw.mvByName("m_tpf_mv").get
      require(mv.isTopNMode && mv.isChangelogCascadeMode,
        "raw top-N over an upsert table must take the cascade-fold path")
      val materialized = mv.df.select("user_id", "value").localCheckpoint(true)
      rw.close()
      materialized
    },

    // Grouped top-N over an upsert table (cascade-backed leaderboard):
    // the inner aggregate's delta derives from the table changelog; a
    // version overwrite retracts the old contribution before the new one
    // folds in.
    q("m_mv_grouped_topn_pk_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM latest GROUP BY 1
        |ORDER BY sv DESC, bucket LIMIT 5""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_gtf_t", Seq(("m_gtf_mv",
        """SELECT user_id % 10 AS bucket, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM m_gtf_t GROUP BY 1
          |ORDER BY sv DESC, bucket LIMIT 5""".stripMargin)))
      val mv = rw.mvByName("m_gtf_mv").get
      require(mv.isTopNMode && mv.isChangelogCascadeMode,
        "grouped top-N over an upsert table must take the cascade-fold path")
      require(mv.isDeltaAggMode,
        "a COUNT/SUM inner must fold algebraically — no per-epoch re-scan")
      val out = mv.df.withColumn("sv", col("sv").cast("double"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Session windows over an upsert table (Mv.sessionCascadeEpoch): an
    // overwrite moves a row between sessions — possibly merging or
    // splitting them — via changelog retraction + re-sessionize. Oracle:
    // lag-gap sessionization of the latest-version rows (same bounds
    // convention as m_mv_session_incremental).
    q("m_mv_session_pk_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(epoch(ts), event_id) AS e,
        |    arg_max(event_type, event_id) AS event_type,
        |    arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id),
        |m AS (SELECT event_type, e, value,
        |  CASE WHEN lag(e) OVER w IS NULL OR e - lag(e) OVER w >= 300 THEN 1 ELSE 0 END AS brk
        |  FROM latest WINDOW w AS (PARTITION BY event_type ORDER BY e, value)),
        |s AS (SELECT event_type, e, value,
        |  SUM(brk) OVER (PARTITION BY event_type ORDER BY e, value ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT CAST(floor(min(e)) AS BIGINT) AS ws,
        |  CAST(floor(max(e) + 300) AS BIGINT) AS we,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM s GROUP BY event_type, sid""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_spf_t", Seq(("m_spf_mv",
        """SELECT window_start, window_end, event_type, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM session(m_spf_t, ts, interval '5 minutes')
          |GROUP BY window_start, window_end, event_type""".stripMargin)),
        withTs = true)
      val mv = rw.mvByName("m_spf_mv").get
      require(mv.isSessionMode && mv.isChangelogCascadeMode,
        "session MV over an upsert table must take the cascade-fold path")
      val out = mv.df.select(
        col("window_start").cast("long").as("ws"),
        col("window_end").cast("long").as("we"),
        col("event_type"), col("n"), col("sv").cast("double").as("sv"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // DML without demotion (round-8 claim, driver-verified): a cascade
    // aggregate over an upsert table stays incremental across a DELETE
    // (mid-replay) and an UPDATE (late-replay) — both flow through the
    // table changelog as retractions. Oracle replays the same timeline:
    // early rows of deleted users are gone; users hit by the UPDATE whose
    // latest surviving version predates the final chunk carry the doubled
    // value (a final-chunk upsert replaces the row wholesale).
    q("m_mv_dml_fold",
      s"""WITH ch AS (SELECT user_id, value, event_id,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |kept AS (SELECT * FROM ch WHERE NOT (user_id % 7 = 3 AND chunk <= 3)),
         |latest AS (SELECT user_id, arg_max(value, event_id) AS value,
         |    max(chunk) AS lc FROM kept GROUP BY user_id),
         |fin AS (SELECT user_id,
         |    CASE WHEN user_id % 11 = 5 AND lc <= ${CHUNKS - 2} THEN value * 2
         |         ELSE value END AS value
         |  FROM latest)
         |SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
         |FROM fin GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_dmf_t", Seq(("m_dmf_mv",
        """SELECT user_id % 10 AS bucket, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM m_dmf_t GROUP BY 1""".stripMargin)),
        beforeChunk = Map(
          4 -> { rw =>
            rw.execute("DELETE FROM m_dmf_t WHERE user_id % 7 = 3")
            val mv = rw.mvByName("m_dmf_mv").get
            require(mv.isChangelogCascadeMode,
              "DELETE must not demote a changelog-cascade MV")
          },
          CHUNKS - 1 -> { rw =>
            rw.execute("UPDATE m_dmf_t SET value = value * 2 WHERE user_id % 11 = 5")
            val mv = rw.mvByName("m_dmf_mv").get
            require(mv.isChangelogCascadeMode,
              "UPDATE must not demote a changelog-cascade MV")
          }))
      val mv = rw.mvByName("m_dmf_mv").get
      require(mv.isChangelogCascadeMode,
        "aggregate over the upsert table must consume its changelog")
      val out = mv.df.withColumn("sv", col("sv").cast("double"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Streaming pipeline composition (round 10): the pretraining pipeline
    // verified batch as x_pipeline_pretrain, composed as CHAINED MVs over
    // a live PK document table — quality-filter MV (linear changelog fold)
    // → exact-dedup MV (changelog cascade on the filter's ops) →
    // per-language rollup (cascade on the dedup's ops) — with every level
    // mode-asserted and a mid-replay DELETE retracting documents through
    // all three levels. This is the operator×runtime composition at the
    // heart of the engine: the oracle replays the same timeline in DuckDB
    // and hash-compares the final rollup.
    q("m_mv_pipeline_incremental",
      s"""WITH pos AS (SELECT doc_id, text, lang, n_chars,
         |    CAST((row_number() OVER (ORDER BY doc_id) - 1) //
         |      (((SELECT count(*) FROM documents) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM documents),
         |live AS (SELECT * FROM pos WHERE NOT (n_chars % 5 = 2 AND chunk <= 3)),
         |kept AS (SELECT doc_id, lower(trim(text)) AS norm, lang FROM live
         |  WHERE length(text) >= 80
         |    AND length(text) - length(replace(text, ' ', '')) >= 10),
         |ded AS (SELECT md5(norm) AS fp, min(doc_id) AS doc_id,
         |    arg_min(lang, doc_id) AS lang, count(*) AS dups
         |  FROM kept GROUP BY md5(norm))
         |SELECT lang, count(*) AS n_docs, CAST(SUM(dups) AS BIGINT) AS n_total
         |FROM ded GROUP BY lang""".stripMargin) { (s, dir) =>
      val docSchema = StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType),
        StructField("n_chars", LongType)))
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val t = rw.createTable("m_pl_docs", docSchema, primaryKey = Seq("doc_id"))
      rw.mv("""SELECT doc_id, lower(trim(text)) AS norm, lang FROM m_pl_docs
        |WHERE length(text) >= 80
        |  AND length(text) - length(replace(text, ' ', '')) >= 10""".stripMargin,
        "m_pl_keep")
      rw.mv("""SELECT md5(norm) AS fp, min(doc_id) AS doc_id,
        |  min_by(lang, doc_id) AS lang, count(*) AS dups
        |FROM m_pl_keep GROUP BY md5(norm)""".stripMargin, "m_pl_dedup")
      rw.mv("""SELECT lang, count(*) AS n_docs, CAST(SUM(dups) AS BIGINT) AS n_total
        |FROM m_pl_dedup GROUP BY lang""".stripMargin, "m_pl_roll")
      val keep = rw.mvByName("m_pl_keep").get
      val ded = rw.mvByName("m_pl_dedup").get
      val roll = rw.mvByName("m_pl_roll").get
      require(keep.isDeltaJoinMode,
        "quality-filter level must fold the document changelog")
      require(ded.isChangelogCascadeMode && ded.isDeltaAggMode,
        "dedup level must delta-accumulate on the filter MV's changelog " +
          "(MV-sourced fold, round 12; min_by slot)")
      require(roll.isChangelogCascadeMode && roll.isDeltaAggMode,
        "rollup level must delta-accumulate on the dedup MV's changelog")
      val rows = Tables(s, dir, "documents")
        .select("doc_id", "text", "lang", "n_chars")
        .collect().sortBy(_.getLong(0))
      var i = 0
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        if (i == 4) {
          rw.execute("DELETE FROM m_pl_docs WHERE n_chars % 5 = 2")
          require(keep.isDeltaJoinMode && ded.isChangelogCascadeMode,
            "the retraction wave must not demote any pipeline level")
        }
        t.insert(chunk.toSeq); rw.flush(); i += 1
      }
      require(keep.isDeltaJoinMode && ded.isChangelogCascadeMode &&
        roll.isChangelogCascadeMode)
      val materialized = roll.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // MIN/MAX delta-accumulation (round 10): non-invertible extremum
    // aggregates fold the upsert table's changelog — inserts fold directly
    // (greatest/least of carried and delta), and only a retraction that
    // removes the carried extremum re-fetches that group (delta-restricted
    // semi-join below the re-aggregation; RisingWave's extremum re-fetch).
    // The mid-replay DELETE targets the top values, so per-bucket maxima
    // ARE retracted and the runner-up must be recovered; upsert overwrites
    // keep moving extrema between buckets throughout.
    q("m_mv_minmax_fold",
      s"""WITH ch AS (SELECT user_id, value, event_id,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |early AS (SELECT user_id, arg_max(value, event_id) AS v
         |  FROM ch WHERE chunk <= 3 GROUP BY user_id),
         |deleted AS (SELECT user_id FROM early WHERE v > 90),
         |kept AS (SELECT * FROM ch WHERE NOT (chunk <= 3 AND
         |  user_id IN (SELECT user_id FROM deleted))),
         |latest AS (SELECT user_id, arg_max(value, event_id) AS value
         |  FROM kept GROUP BY user_id)
         |SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n,
         |  max(value) AS mx, min(value) AS mn
         |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_mmf_t", Seq(("m_mmf_mv",
        """SELECT user_id % 10 AS bucket, count(*) AS n,
          |  max(value) AS mx, min(value) AS mn
          |FROM m_mmf_t GROUP BY 1""".stripMargin)),
        beforeChunk = Map(
          4 -> { rw =>
            rw.execute("DELETE FROM m_mmf_t WHERE value > 90")
            val mv = rw.mvByName("m_mmf_mv").get
            require(mv.isDeltaAggMode,
              "an extremum retraction must re-fetch, not demote the fold")
          }))
      val mv = rw.mvByName("m_mmf_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "MIN/MAX over an upsert table must delta-accumulate (round 10)")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Window-function MV (round 10): per-partition rank over the upsert
    // table maintains by touched-PARTITION recompute — a delta names the
    // partitions whose window results can change, exactly those re-rank
    // (semi join installed below the Window by plan surgery), and their
    // slice of the carried multiset is replaced. Upsert overwrites move
    // users between value ranks throughout; the mid-replay DELETE of the
    // top values forces whole-partition re-ranks from retractions.
    // Mode-asserted (batch re-run would match values).
    q("m_mv_window_rank_incremental",
      s"""WITH ch AS (SELECT user_id, value, event_type, event_id,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |early AS (SELECT user_id, arg_max(value, event_id) AS v
         |  FROM ch WHERE chunk <= 3 GROUP BY user_id),
         |deleted AS (SELECT user_id FROM early WHERE v > 90),
         |kept AS (SELECT * FROM ch WHERE NOT (chunk <= 3 AND
         |  user_id IN (SELECT user_id FROM deleted))),
         |latest AS (SELECT user_id, arg_max(value, event_id) AS value,
         |    arg_max(event_type, event_id) AS event_type
         |  FROM kept GROUP BY user_id)
         |SELECT event_type, user_id, CAST(rank() OVER
         |  (PARTITION BY event_type ORDER BY value DESC, user_id) AS BIGINT) AS r
         |FROM latest""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_wr_t", Seq(("m_wr_mv",
        """SELECT event_type, user_id, CAST(rank() OVER
          |  (PARTITION BY event_type ORDER BY value DESC, user_id) AS BIGINT) AS r
          |FROM m_wr_t""".stripMargin)),
        withTs = true,
        beforeChunk = Map(
          4 -> { rw =>
            rw.execute("DELETE FROM m_wr_t WHERE value > 90")
            require(rw.mvByName("m_wr_mv").get.isWindowCascadeMode,
              "retractions must not demote the window cascade")
          }))
      val mv = rw.mvByName("m_wr_mv").get
      require(mv.isWindowCascadeMode,
        "a partitioned window MV must maintain incrementally (round 10)")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Expression PARTITION BY key (round 11): `rank() OVER (PARTITION BY
    // date_trunc('day', ts) …)` — the everyday calendar-bucketed spelling —
    // maintains by touched-partition recompute. The restriction key is the
    // TRACED expression (exprId lineage through the analyzer's extracted
    // `_w0` projection), evaluated directly on the delta payload to name
    // the touched days; the carried state restricts on the output's own
    // `day` column (same lineage). Round 10 kept this shape on the batch
    // fallback; mode-asserted so a silent demotion fails the oracle.
    q("m_mv_window_exprkey_incremental",
      s"""WITH ch AS (SELECT user_id, ts, value, event_id,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |early AS (SELECT user_id, arg_max(value, event_id) AS v
         |  FROM ch WHERE chunk <= 3 GROUP BY user_id),
         |deleted AS (SELECT user_id FROM early WHERE v > 90),
         |kept AS (SELECT * FROM ch WHERE NOT (chunk <= 3 AND
         |  user_id IN (SELECT user_id FROM deleted))),
         |latest AS (SELECT user_id, arg_max(ts, event_id) AS ts,
         |    arg_max(value, event_id) AS value
         |  FROM kept GROUP BY user_id)
         |SELECT user_id, CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
         |  value, CAST(rank() OVER
         |  (PARTITION BY date_trunc('day', ts) ORDER BY value DESC, user_id) AS BIGINT) AS r
         |FROM latest""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_wek_t", Seq(("m_wek_mv",
        """SELECT user_id, date_trunc('day', ts) AS day, value, CAST(rank() OVER
          |  (PARTITION BY date_trunc('day', ts) ORDER BY value DESC, user_id) AS BIGINT) AS r
          |FROM m_wek_t""".stripMargin)),
        withTs = true,
        beforeChunk = Map(
          4 -> { rw =>
            rw.execute("DELETE FROM m_wek_t WHERE value > 90")
            require(rw.mvByName("m_wek_mv").get.isWindowCascadeMode,
              "retractions must not demote the expression-key window cascade")
          }))
      val mv = rw.mvByName("m_wek_mv").get
      require(mv.isWindowCascadeMode,
        "an expression-PARTITION-BY window MV must maintain incrementally (round 11)")
      val materialized = mv.df
        .withColumn("day", col("day").cast("long")).localCheckpoint(true)
      rw.close()
      materialized
    },

    // Window OVER an aggregate (round 11): rank-groups-by-aggregate — the
    // dashboard shape `rank() OVER (PARTITION BY bucket ORDER BY n DESC)`
    // over a GROUP BY. The window partitions by the aggregate's own
    // grouping column, so the touched-partition restriction installs
    // BELOW the Aggregate: a delta's buckets re-aggregate from only their
    // own source rows and re-rank; untouched buckets' groups and ranks
    // are byte-identical carried state. Mode-asserted.
    q("m_mv_window_over_agg_incremental",
      s"""WITH ch AS (SELECT user_id, value, event_type, event_id,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |early AS (SELECT user_id, arg_max(value, event_id) AS v
         |  FROM ch WHERE chunk <= 3 GROUP BY user_id),
         |deleted AS (SELECT user_id FROM early WHERE v > 90),
         |kept AS (SELECT * FROM ch WHERE NOT (chunk <= 3 AND
         |  user_id IN (SELECT user_id FROM deleted))),
         |latest AS (SELECT user_id, arg_max(value, event_id) AS value,
         |    arg_max(event_type, event_id) AS event_type
         |  FROM kept GROUP BY user_id),
         |agg AS (SELECT CAST(user_id % 20 AS BIGINT) AS bucket, event_type,
         |    count(*) AS n
         |  FROM latest GROUP BY 1, 2)
         |SELECT bucket, event_type, n, CAST(rank() OVER
         |  (PARTITION BY bucket ORDER BY n DESC, event_type) AS BIGINT) AS r
         |FROM agg""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_woa_t", Seq(("m_woa_mv",
        """SELECT bucket, event_type, n, CAST(rank() OVER
          |  (PARTITION BY bucket ORDER BY n DESC, event_type) AS BIGINT) AS r
          |FROM (SELECT CAST(user_id % 20 AS BIGINT) AS bucket, event_type,
          |  count(*) AS n FROM m_woa_t GROUP BY 1, 2)""".stripMargin)),
        withTs = true,
        beforeChunk = Map(
          4 -> { rw =>
            rw.execute("DELETE FROM m_woa_t WHERE value > 90")
            require(rw.mvByName("m_woa_mv").get.isWindowCascadeMode,
              "retractions must not demote the window-over-aggregate cascade")
          }))
      val mv = rw.mvByName("m_woa_mv").get
      require(mv.isWindowCascadeMode,
        "a window over a GROUP BY must maintain by touched-partition recompute (round 11)")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Multi-window statement (round 11): TWO window functions with
    // different specs (rank by value, row_number by user_id) sharing the
    // partition source column — the analyzer builds two chained Window
    // nodes; both confine results within event_type partitions, so
    // touched-partition replacement stays sound with the semi-join
    // installed below the BOTTOM window. Mode-asserted.
    q("m_mv_multi_window_incremental",
      s"""WITH ch AS (SELECT user_id, value, event_type, event_id,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |early AS (SELECT user_id, arg_max(value, event_id) AS v
         |  FROM ch WHERE chunk <= 3 GROUP BY user_id),
         |deleted AS (SELECT user_id FROM early WHERE v > 90),
         |kept AS (SELECT * FROM ch WHERE NOT (chunk <= 3 AND
         |  user_id IN (SELECT user_id FROM deleted))),
         |latest AS (SELECT user_id, arg_max(value, event_id) AS value,
         |    arg_max(event_type, event_id) AS event_type
         |  FROM kept GROUP BY user_id)
         |SELECT event_type, user_id, CAST(rank() OVER
         |  (PARTITION BY event_type ORDER BY value DESC, user_id) AS BIGINT) AS r,
         |  CAST(row_number() OVER
         |  (PARTITION BY event_type ORDER BY user_id) AS BIGINT) AS seq
         |FROM latest""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_mwin_t", Seq(("m_mwin_mv",
        """SELECT event_type, user_id, CAST(rank() OVER
          |  (PARTITION BY event_type ORDER BY value DESC, user_id) AS BIGINT) AS r,
          |  CAST(row_number() OVER
          |  (PARTITION BY event_type ORDER BY user_id) AS BIGINT) AS seq
          |FROM m_mwin_t""".stripMargin)),
        withTs = true,
        beforeChunk = Map(
          4 -> { rw =>
            rw.execute("DELETE FROM m_mwin_t WHERE value > 90")
            require(rw.mvByName("m_mwin_mv").get.isWindowCascadeMode,
              "retractions must not demote the multi-window cascade")
          }))
      val mv = rw.mvByName("m_mwin_mv").get
      require(mv.isWindowCascadeMode,
        "a same-key multi-window MV must maintain incrementally (round 11)")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // LIVE padded side below the window cascade (round 12): the enriched
    // rank `rank() OVER (PARTITION BY bucket …) FROM fact LEFT JOIN
    // live_dim` — a dim delta flips enrichment/padding of exactly the
    // fact rows matching it under the join condition, so the touched
    // partitions derive by semi-joining the fact snapshot against the
    // dim delta (the restricted term) and only those re-rank. The dim
    // churns mid-replay in BOTH directions (insert → enrich, delete →
    // re-pad, upsert → re-enrich); the oracle pins the final dim state.
    // Mode-asserted mid-replay and at the end.
    q("m_mv_window_padded_incremental",
      s"""WITH ch AS (SELECT user_id, value, event_id,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |latest AS (SELECT user_id, arg_max(value, event_id) AS value
         |  FROM ch GROUP BY user_id),
         |dim AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'even'),
         |  (CAST(1 AS BIGINT), 'uno'), (CAST(3 AS BIGINT), 'three')) AS d(bucket, label))
         |SELECT t.user_id, CAST(t.user_id % 5 AS BIGINT) AS bucket, d.label, t.value,
         |  CAST(rank() OVER (PARTITION BY t.user_id % 5
         |    ORDER BY t.value DESC, t.user_id) AS BIGINT) AS r
         |FROM latest t LEFT JOIN dim d ON d.bucket = t.user_id % 5""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_wp_t", Seq(("m_wp_mv",
        """SELECT t.user_id, CAST(t.user_id % 5 AS BIGINT) AS bucket, d.label, t.value,
          |  CAST(rank() OVER (PARTITION BY t.user_id % 5
          |    ORDER BY t.value DESC, t.user_id) AS BIGINT) AS r
          |FROM m_wp_t t LEFT JOIN m_wp_dim d ON d.bucket = t.user_id % 5""".stripMargin)),
        setup = { rw =>
          rw.createTable("m_wp_dim", StructType(Seq(
            StructField("bucket", LongType), StructField("label", StringType))),
            primaryKey = Seq("bucket"))
        },
        beforeChunk = Map(
          2 -> { rw =>
            rw.table("m_wp_dim").get.insert(Seq(Row(0L, "even"), Row(1L, "one")))
          },
          4 -> { rw =>
            rw.execute("DELETE FROM m_wp_dim WHERE bucket = 1")
            rw.table("m_wp_dim").get.insert(Seq(Row(3L, "three")))
            require(rw.mvByName("m_wp_mv").get.isWindowCascadeMode,
              "dim churn must not demote the padded window cascade")
          },
          6 -> { rw =>
            rw.table("m_wp_dim").get.insert(Seq(Row(1L, "uno")))
          }))
      val mv = rw.mvByName("m_wp_mv").get
      require(mv.isWindowCascadeMode,
        "a live padded side must maintain by touched-partition recompute (round 12)")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Multi-source KEYED window cascade (round 14): the enriched rank over
    // an INNER JOIN of TWO live tables — `rank() OVER (PARTITION BY bucket
    // …) FROM fact JOIN live_dim` — both sides churning. A dim delta
    // changes the join output of exactly the fact rows matching it under
    // the condition, so its touched partitions derive by the same
    // restricted term as the round-12 live padded side (fact snapshot ⋈
    // dim payload, semi); fact deltas name their partitions directly.
    // Unlike the padded shape, unmatched fact rows VANISH from the window
    // input (inner semantics), so dim inserts/deletes add/remove whole
    // partition slices. Fact retractions (DELETE) cross mid-replay too.
    // Mode-asserted mid-replay and at the end.
    q("m_mv_window_join_incremental",
      s"""WITH ch AS (SELECT user_id, value, event_id,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |early AS (SELECT user_id, arg_max(value, event_id) AS v
         |  FROM ch WHERE chunk <= 3 GROUP BY user_id),
         |deleted AS (SELECT user_id FROM early WHERE v > 90),
         |kept AS (SELECT * FROM ch WHERE NOT (chunk <= 3 AND
         |  user_id IN (SELECT user_id FROM deleted))),
         |latest AS (SELECT user_id, arg_max(value, event_id) AS value
         |  FROM kept GROUP BY user_id),
         |dim AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'even'),
         |  (CAST(1 AS BIGINT), 'uno'), (CAST(3 AS BIGINT), 'three')) AS d(bucket, label))
         |SELECT t.user_id, d.bucket, d.label, t.value,
         |  CAST(rank() OVER (PARTITION BY t.user_id % 5
         |    ORDER BY t.value DESC, t.user_id) AS BIGINT) AS r
         |FROM latest t JOIN dim d ON d.bucket = t.user_id % 5""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_wj_t", Seq(("m_wj_mv",
        """SELECT t.user_id, d.bucket, d.label, t.value,
          |  CAST(rank() OVER (PARTITION BY t.user_id % 5
          |    ORDER BY t.value DESC, t.user_id) AS BIGINT) AS r
          |FROM m_wj_t t JOIN m_wj_dim d ON d.bucket = t.user_id % 5""".stripMargin)),
        setup = { rw =>
          rw.createTable("m_wj_dim", StructType(Seq(
            StructField("bucket", LongType), StructField("label", StringType))),
            primaryKey = Seq("bucket"))
        },
        beforeChunk = Map(
          2 -> { rw =>
            rw.table("m_wj_dim").get.insert(Seq(Row(0L, "even"), Row(1L, "one")))
          },
          4 -> { rw =>
            rw.execute("DELETE FROM m_wj_t WHERE value > 90")
            rw.execute("DELETE FROM m_wj_dim WHERE bucket = 1")
            rw.table("m_wj_dim").get.insert(Seq(Row(3L, "three")))
            require(rw.mvByName("m_wj_mv").get.isWindowCascadeMode,
              "fact+dim churn must not demote the join window cascade")
          },
          6 -> { rw =>
            rw.table("m_wj_dim").get.insert(Seq(Row(1L, "uno")))
          }))
      val mv = rw.mvByName("m_wj_mv").get
      require(mv.isWindowCascadeMode,
        "a keyed window over two live tables must maintain by " +
          "touched-partition recompute (round 14)")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Global-window MV (round 12): the corpus-wide data-selection rank —
    // `rank() OVER (ORDER BY value DESC)` with NO partition key — which
    // the keyed cascade refuses (one global partition). The prefix-fold
    // mode carries the window's INPUT multiset (post-filter), folds each
    // epoch's signed delta into it, and re-evaluates the rank over the
    // carried state — the base statement is never re-run after backfill
    // (statementEvals-pinned) and the source is never re-scanned. Upsert
    // overwrites move users through the global ranking all replay long;
    // the mid-replay DELETE retracts the top values.
    q("m_mv_global_window_incremental",
      s"""WITH ch AS (SELECT user_id, value, event_id,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |early AS (SELECT user_id, arg_max(value, event_id) AS v
         |  FROM ch WHERE chunk <= 3 GROUP BY user_id),
         |deleted AS (SELECT user_id FROM early WHERE v > 90),
         |kept AS (SELECT * FROM ch WHERE NOT (chunk <= 3 AND
         |  user_id IN (SELECT user_id FROM deleted))),
         |latest AS (SELECT user_id, arg_max(value, event_id) AS value
         |  FROM kept GROUP BY user_id)
         |SELECT user_id, value, CAST(rank() OVER
         |  (ORDER BY value DESC, user_id) AS BIGINT) AS r
         |FROM latest WHERE value > 10""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_gw_t", Seq(("m_gw_mv",
        """SELECT user_id, value, CAST(rank() OVER
          |  (ORDER BY value DESC, user_id) AS BIGINT) AS r
          |FROM m_gw_t WHERE value > 10""".stripMargin)),
        beforeChunk = Map(
          4 -> { rw =>
            rw.execute("DELETE FROM m_gw_t WHERE value > 90")
            require(rw.mvByName("m_gw_mv").get.isGlobalWindowMode,
              "retractions must not demote the global-window fold")
          }))
      val mv = rw.mvByName("m_gw_mv").get
      require(mv.isGlobalWindowMode,
        "a global-rank MV must fold via the prefix cut (round 12)")
      require(mv.statementEvals <= 1,
        "global-window epochs must not re-evaluate the base statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // SELECT DISTINCT as an incrementally-maintained MV (round 10): the
    // maintainer respells DISTINCT as group-by-every-output and folds the
    // source changelog with keys-only delta-accumulation — a distinct row
    // appears when its multiplicity rises above zero and vanishes when the
    // last contributing input retracts. Upsert overwrites move rows
    // between buckets throughout the replay, so multiplicities rise AND
    // fall; mode-asserted (a silent batch re-run would match values).
    q("m_mv_distinct_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT DISTINCT CAST(user_id % 20 AS BIGINT) AS bucket,
        |  CAST(floor(value / 10) AS BIGINT) AS vb
        |FROM latest""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_dst_t", Seq(("m_dst_mv",
        """SELECT DISTINCT user_id % 20 AS bucket,
          |  CAST(floor(value / 10) AS BIGINT) AS vb
          |FROM m_dst_t""".stripMargin)))
      val mv = rw.mvByName("m_dst_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "DISTINCT over an upsert table must fold keys-only (round 10)")
      require(mv.statementEvals <= 1,
        "distinct-fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Float SUM/AVG fold under the tolerance tier (round 10): with
    // `foldFloatingPointAgg` on, double sums fold with Kahan-compensated
    // carried state. The hash gate still applies — both sides round to 4
    // decimals at the output boundary, which the compensated fold's ~ulp
    // error cannot move; the exact tier (default options) is untouched.
    q("m_mv_double_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n,
        |  round(SUM(value), 4) AS sx, round(AVG(value), 4) AS ax
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_dbf_t", Seq(("m_dbf_mv",
        """SELECT user_id % 10 AS bucket, count(*) AS n,
          |  sum(value) AS sx, avg(value) AS ax
          |FROM m_dbf_t GROUP BY 1""".stripMargin)),
        opts = ConnOptions(foldFloatingPointAgg = true))
      val mv = rw.mvByName("m_dbf_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "double SUM/AVG must fold under the tolerance flag (round 10)")
      require(mv.statementEvals <= 1,
        "float fold epochs must not re-evaluate the statement")
      val out = mv.df
        .withColumn("sx", round(col("sx"), 4))
        .withColumn("ax", round(col("ax"), 4))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Integral AVG fold (round 11 — the last decomposable-aggregate
    // fallback): AVG over a BIGINT column folds in the EXACT tier. Spark's
    // own batch buffer is a double sum, but the aux slot carries the exact
    // LONG Sum(child); the visible value re-binds Average.evaluateExpression
    // to it — one cast + one divide at the output boundary (rounded to 4
    // here so the oracle hash is immune to either engine's division ulp).
    // Upsert overwrites retract event_ids through the fold; mode-asserted.
    q("m_mv_int_avg_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value, max(event_id) AS event_id
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n,
        |  round(AVG(event_id), 4) AS ae,
        |  round(AVG(CAST(floor(value) AS BIGINT)), 4) AS av
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_iaf_t", Seq(("m_iaf_mv",
        """SELECT user_id % 10 AS bucket, count(*) AS n,
          |  round(avg(event_id), 4) AS ae,
          |  round(avg(CAST(floor(value) AS BIGINT)), 4) AS av
          |FROM m_iaf_t GROUP BY 1""".stripMargin)))
      val mv = rw.mvByName("m_iaf_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "integral AVG must fold in the exact tier (round 11)")
      require(mv.statementEvals <= 1,
        "integral-AVG fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // stddev/variance fold (round 12): decomposed as [sum-of-squares, sum,
    // non-null count] — all signed-invertible, so the fold stays on the
    // fast re-sum path with zero re-fetches. The integral child (event_id
    // % 1000 under the analyzer's to-double cast) takes the EXACT tier:
    // sums carry in DECIMAL(38,0), the m₂ finish runs once in double at
    // the output boundary (both sides round to 4 decimals, which the
    // finish's ~ulp division error cannot move). Upsert overwrites
    // retract event_ids throughout; mode-asserted.
    q("m_mv_stddev_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value,
        |    max(event_id) AS event_id
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n,
        |  round(stddev_samp(event_id % 1000), 4) AS sd,
        |  round(var_pop(event_id % 1000), 4) AS vp
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_sdf_t", Seq(("m_sdf_mv",
        """SELECT user_id % 10 AS bucket, count(*) AS n,
          |  round(stddev_samp(event_id % 1000), 4) AS sd,
          |  round(var_pop(event_id % 1000), 4) AS vp
          |FROM m_sdf_t GROUP BY 1""".stripMargin)))
      val mv = rw.mvByName("m_sdf_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "stddev/variance over integrals must fold in the exact tier (round 12)")
      require(mv.statementEvals <= 1,
        "stddev fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // COUNT(DISTINCT) fold (round 12 — the two-level tier): the carried
    // aux state is keyed by (bucket, distinct value) — per-value reference
    // counts ride the inner rows counter, a value's row vanishes when its
    // last reference retracts, and the visible pass re-aggregates the
    // state by bucket (count of per-value rows = the distinct count).
    // Upsert overwrites move users between value decades all through the
    // replay, so reference counts rise AND fall and distinct values appear
    // AND vanish through the fold; plain count/sum slots fold at the same
    // inner granularity (sum of sums is exact). Mode-asserted with zero
    // statement re-evaluations.
    q("m_mv_count_distinct_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value,
        |    max(event_id) AS event_id
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n,
        |  count(DISTINCT CAST(floor(value / 10) AS BIGINT)) AS dv,
        |  CAST(SUM(event_id % 1000) AS BIGINT) AS se
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_cdf_t", Seq(("m_cdf_mv",
        """SELECT user_id % 10 AS bucket, count(*) AS n,
          |  count(DISTINCT CAST(floor(value / 10) AS BIGINT)) AS dv,
          |  CAST(SUM(event_id % 1000) AS BIGINT) AS se
          |FROM m_cdf_t GROUP BY 1""".stripMargin)))
      val mv = rw.mvByName("m_cdf_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "COUNT(DISTINCT) must fold via the two-level tier (round 12)")
      require(mv.statementEvals <= 1,
        "count-distinct fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // SUM/AVG(DISTINCT) fold (round 12): the distinct child is a state-key
    // column, so the visible sum/avg re-aggregate the state's own per-value
    // rows — a value contributes once however many references carry it,
    // and leaves the sum when its last reference retracts. TWO distinct
    // children here (value decade and event_id mod 7): state rows are
    // (bucket, decade, mod) tuples, pinning the per-column DISTINCT
    // re-aggregation — a plain Count/Sum over one dk column would tally
    // each value once per combination with the other child's values.
    q("m_mv_sum_distinct_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value,
        |    max(event_id) AS event_id
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
        |  CAST(sum(DISTINCT CAST(floor(value / 10) AS BIGINT)) AS BIGINT) AS sdv,
        |  round(avg(DISTINCT CAST(floor(value / 10) AS BIGINT)), 4) AS adv,
        |  count(DISTINCT event_id % 7) AS dm
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_sdd_t", Seq(("m_sdd_mv",
        """SELECT user_id % 10 AS bucket,
          |  CAST(sum(DISTINCT CAST(floor(value / 10) AS BIGINT)) AS BIGINT) AS sdv,
          |  round(avg(DISTINCT CAST(floor(value / 10) AS BIGINT)), 4) AS adv,
          |  count(DISTINCT event_id % 7) AS dm
          |FROM m_sdd_t GROUP BY 1""".stripMargin)))
      val mv = rw.mvByName("m_sdd_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "SUM/AVG(DISTINCT) must fold via the two-level tier (round 12)")
      require(mv.statementEvals <= 1,
        "distinct-sum fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // exact percentile/median fold (round 12): the two-level state IS the
    // group's value histogram (per-(group, value) refcounts), and the
    // visible pass re-runs Spark's Percentile frequency-weighted by the
    // state's row counter — exact for doubles (values are stored, not
    // summed; Spark's p·(n−1) linear interpolation is DuckDB's
    // quantile_cont). A distinct counter shares the state (two dk
    // children) and stddev re-aggregates its per-inner exact partials —
    // the full histogram-tier composition in one MV.
    q("m_mv_percentile_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value,
        |    max(event_id) AS event_id
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 8 AS BIGINT) AS bucket,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(median(value), 4) AS med,
        |  round(stddev_samp(CAST(floor(value) AS BIGINT)), 4) AS sd,
        |  count(DISTINCT event_id % 5) AS dm
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_pctf_t", Seq(("m_pctf_mv",
        """SELECT user_id % 8 AS bucket,
          |  round(percentile(value, 0.5), 4) AS p50,
          |  round(percentile(value, 0.9), 4) AS p90,
          |  round(median(value), 4) AS med,
          |  round(stddev_samp(CAST(floor(value) AS BIGINT)), 4) AS sd,
          |  count(DISTINCT event_id % 5) AS dm
          |FROM m_pctf_t GROUP BY 1""".stripMargin)))
      val mv = rw.mvByName("m_pctf_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "percentile must fold via the histogram tier (round 12)")
      require(mv.statementEvals <= 1,
        "percentile fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // argument-at-extremum fold (round 12): max_by/min_by carry
    // [arg, extremum ord, counter] state — inserts compare ordering
    // values map-side, only a retraction tying-or-beating the carried
    // extremum re-fetches its group (RisingWave's extremum re-fetch with
    // the argument riding along); bool_and/bool_or fold as boolean
    // extrema and count_if as a predicated count slot. event_id is unique
    // per user so the arg_max/max_by tie semantics never diverge.
    q("m_mv_argmax_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value,
        |    max(event_id) AS event_id
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 9 AS BIGINT) AS bucket,
        |  arg_max(value, event_id) AS freshest,
        |  arg_min(value, event_id) AS oldest,
        |  bool_and(value >= 0) AS all_nonneg,
        |  bool_or(value > 900) AS any_big,
        |  CAST(count_if(value > 500) AS BIGINT) AS n_big
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_amx_t", Seq(("m_amx_mv",
        """SELECT user_id % 9 AS bucket,
          |  max_by(value, event_id) AS freshest,
          |  min_by(value, event_id) AS oldest,
          |  bool_and(value >= 0) AS all_nonneg,
          |  bool_or(value > 900) AS any_big,
          |  count_if(value > 500) AS n_big
          |FROM m_amx_t GROUP BY 1""".stripMargin)))
      val mv = rw.mvByName("m_amx_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "max_by/bool/count_if must fold via the delta-agg tier (round 12)")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // FILTERed aggregate fold (round 12): each call's FILTER (WHERE …)
    // predicate rides into its aux partials and derived helpers (counter,
    // ordering extremum), so the signed fold and the extremum re-fetch
    // see exactly the rows the visible call sees. NULL discipline holds
    // per predicate: a group with zero passing rows surfaces NULL sums.
    q("m_mv_filtered_agg_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value,
        |    max(event_id) AS event_id
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 11 AS BIGINT) AS bucket,
        |  CAST(count(*) FILTER (WHERE value > 500) AS BIGINT) AS nbig,
        |  CAST(sum(CAST(floor(value) AS BIGINT))
        |    FILTER (WHERE CAST(floor(value) AS BIGINT) % 2 = 0) AS BIGINT) AS se,
        |  max(value) FILTER (WHERE value < 900) AS mx,
        |  round(avg(CAST(floor(value) AS BIGINT))
        |    FILTER (WHERE value > 100), 4) AS av
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_flt_t", Seq(("m_flt_mv",
        """SELECT user_id % 11 AS bucket,
          |  count(*) FILTER (WHERE value > 500) AS nbig,
          |  sum(CAST(floor(value) AS BIGINT))
          |    FILTER (WHERE CAST(floor(value) AS BIGINT) % 2 = 0) AS se,
          |  max(value) FILTER (WHERE value < 900) AS mx,
          |  round(avg(CAST(floor(value) AS BIGINT))
          |    FILTER (WHERE value > 100), 4) AS av
          |FROM m_flt_t GROUP BY 1""".stripMargin)))
      val mv = rw.mvByName("m_flt_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "FILTERed plain aggregates must fold (round 12)")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // bivariate statistics fold (round 12): corr/covar_samp/covar_pop
    // carry signed raw co-moments — exact decimal sums for the integral
    // children, one double finish at the visible boundary (zero-variance
    // corr surfaces NULL, matching DuckDB; Spark's native ANSI corr would
    // throw there, so the maintained face is strictly more total).
    q("m_mv_corr_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value,
        |    max(event_id) AS event_id
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 6 AS BIGINT) AS bucket,
        |  round(corr(CAST(floor(value) AS BIGINT), event_id % 97), 4) AS c,
        |  round(covar_samp(CAST(floor(value) AS BIGINT), event_id % 97), 4) AS cs,
        |  round(covar_pop(CAST(floor(value) AS BIGINT), event_id % 97), 4) AS cp
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_cov_t", Seq(("m_cov_mv",
        """SELECT user_id % 6 AS bucket,
          |  round(corr(CAST(floor(value) AS BIGINT), event_id % 97), 4) AS c,
          |  round(covar_samp(CAST(floor(value) AS BIGINT), event_id % 97), 4) AS cs,
          |  round(covar_pop(CAST(floor(value) AS BIGINT), event_id % 97), 4) AS cp
          |FROM m_cov_t GROUP BY 1""".stripMargin)))
      val mv = rw.mvByName("m_cov_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "bivariate stats must fold via signed co-moments (round 12)")
      require(mv.statementEvals <= 1,
        "co-moment fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // linear-regression family fold (round 12): all nine regr_* functions
    // are finishes over the SAME six raw co-moments, so one carried state
    // maintains the whole family; argument order is regr_*(y, x).
    q("m_mv_regr_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value,
        |    max(event_id) AS event_id
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 7 AS BIGINT) AS bucket,
        |  round(regr_slope(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS sl,
        |  round(regr_intercept(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS ic,
        |  round(regr_r2(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS r2,
        |  CAST(regr_count(CAST(floor(value) AS BIGINT), event_id % 89) AS BIGINT) AS n,
        |  round(regr_avgx(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS ax,
        |  round(regr_avgy(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS ay,
        |  round(regr_sxx(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS sxx,
        |  round(regr_sxy(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS sxy,
        |  round(regr_syy(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS syy
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_rgr_t", Seq(("m_rgr_mv",
        """SELECT user_id % 7 AS bucket,
          |  round(regr_slope(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS sl,
          |  round(regr_intercept(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS ic,
          |  round(regr_r2(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS r2,
          |  regr_count(CAST(floor(value) AS BIGINT), event_id % 89) AS n,
          |  round(regr_avgx(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS ax,
          |  round(regr_avgy(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS ay,
          |  round(regr_sxx(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS sxx,
          |  round(regr_sxy(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS sxy,
          |  round(regr_syy(CAST(floor(value) AS BIGINT), event_id % 89), 4) AS syy
          |FROM m_rgr_t GROUP BY 1""".stripMargin)))
      val mv = rw.mvByName("m_rgr_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "the regr family must fold via the shared co-moments (round 12)")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // order-sensitive aggregate fold (round 13, verdict #3): string_agg/
    // listagg (ASC and DESC) and array_agg/collect_list ride the SAME
    // two-level dk histogram state as exact percentile — per-(group,
    // value) refcounts ARE the multiset — and the visible pass rebuilds
    // the ordered concat from the state's own rows (array_repeat by
    // refcount, value-sort, flatten, join). A retracted value leaves the
    // concat exactly when its last reference does (upsert overwrites
    // retract mid-replay here). All three calls share ONE dk column.
    q("m_mv_string_agg_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(event_type, event_id) AS et
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 12 AS BIGINT) AS bucket,
        |  string_agg(et, ',' ORDER BY et) AS sa,
        |  string_agg(et, '+' ORDER BY et DESC) AS sad,
        |  array_to_string(list_sort(list(et)), '|') AS aa,
        |  count(*) AS n
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_sag_t", Seq(("m_sag_mv",
        """SELECT user_id % 12 AS bucket,
          |  listagg(event_type, ',') WITHIN GROUP (ORDER BY event_type) AS sa,
          |  listagg(event_type, '+') WITHIN GROUP (ORDER BY event_type DESC) AS sad,
          |  array_join(sort_array(collect_list(event_type)), '|') AS aa,
          |  count(*) AS n
          |FROM m_sag_t GROUP BY 1""".stripMargin)), withTs = true)
      val mv = rw.mvByName("m_sag_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "string_agg/collect_list must fold via the histogram tier (round 13)")
      require(mv.statementEvals <= 1,
        "order-sensitive fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // listagg ordered by ANOTHER column (round 14, verdict #4): the
    // everyday report shape — `string_agg(name, ',' ORDER BY ts)` — folds
    // by keying the state with the composite (ordkey…, value) tuple; the
    // visible pass sorts the repeat arrays on the full composite struct
    // and extracts the value component after the sort. Three faces share
    // the state columns: ASC and DESC by event_id, plus a TWO-ordkey
    // ordering (value, event_id). event_id is unique per surviving row,
    // so every ordering is tie-free and both engines agree exactly;
    // upsert overwrites MOVE values within the order mid-replay (the old
    // composite retracts, the new one installs).
    q("m_mv_string_agg_ordered_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(event_type, event_id) AS et,
        |    arg_max(value, event_id) AS v, max(event_id) AS eid
        |  FROM events GROUP BY user_id)
        |SELECT CAST(user_id % 12 AS BIGINT) AS bucket,
        |  string_agg(et, ',' ORDER BY eid) AS sa,
        |  string_agg(et, '+' ORDER BY eid DESC) AS sad,
        |  string_agg(et, '|' ORDER BY v, eid) AS sav,
        |  count(*) AS n
        |FROM latest GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_sao_t", Seq(("m_sao_mv",
        """SELECT user_id % 12 AS bucket,
          |  listagg(event_type, ',') WITHIN GROUP (ORDER BY event_id) AS sa,
          |  listagg(event_type, '+') WITHIN GROUP (ORDER BY event_id DESC) AS sad,
          |  listagg(event_type, '|') WITHIN GROUP (ORDER BY value, event_id) AS sav,
          |  count(*) AS n
          |FROM m_sao_t GROUP BY 1""".stripMargin)), withTs = true)
      val mv = rw.mvByName("m_sao_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "listagg ordered by another column must fold (round 14)")
      require(mv.statementEvals <= 1,
        "ordered-listagg fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // insert-only approx_count_distinct fold (round 13, verdict #5): the
    // MV carries a merge-only DataSketches HLL sketch per group — each
    // epoch unions the insert partials, never re-scanning the base — and
    // would demote to recompute on the first retraction (DeltaAggSpec
    // pins the demotion). The PK is event_id (unique in the fixture), so
    // the chunked replay is genuinely insert-only. Approx faces are
    // tolerance-contracted like b_approx_distinct: the hash-checked
    // output is the exact count plus "approx within 20% of exact".
    q("m_mv_approx_distinct_fold",
      """SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  count(DISTINCT event_id % 4000) AS exact_ids,
        |  true AS approx_ok
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val fields = Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("value", DoubleType))
      rw.createTable("m_adf_t", StructType(fields), primaryKey = Seq("event_id"))
      rw.mv(
        """SELECT user_id % 10 AS bucket,
          |  approx_count_distinct(event_id % 4000) AS ad,
          |  count(*) AS n
          |FROM m_adf_t GROUP BY 1""".stripMargin, "m_adf_mv")
      val mv = rw.mvByName("m_adf_mv").get
      val rows = Tables(s, dir, "events")
        .select(fields.map(f => col(f.name)): _*)
        .collect().sortBy(_.getLong(0))
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        rw.table("m_adf_t").get.insert(chunk.toSeq); rw.flush()
      }
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "insert-only approx_count_distinct must fold merge-only (round 13)")
      require(mv.statementEvals <= 1,
        "sketch fold epochs must not re-evaluate the statement")
      val exact = Tables(s, dir, "events")
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(countDistinct(col("event_id") % 4000).as("exact_ids"))
      val out = mv.df.join(exact, "bucket")
        .select(col("bucket"), col("n"), col("exact_ids"),
          (abs(col("ad") - col("exact_ids")) <= col("exact_ids") * 0.2)
            .as("approx_ok"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // multi-source global-window fold (round 13, verdict #8): a global
    // rank over a UNION ALL of TWO live PK tables — the prefix is
    // multilinear in both sources, so each epoch folds per-source signed
    // delta terms (later-positioned sources bound to reconstructed OLD
    // snapshots, the telescoped form) into the carried input multiset and
    // re-evaluates only the suffix; the bases are scanned once, at
    // backfill (statementEvals pins it). Upsert overwrites retract
    // through the union from both sides. The `value > 100` threshold
    // sits inside the fixture range at every SF (latest-per-user rows
    // above it: 1 at sf0.001, 15 at sf0.01, 226 at sf0.1) while >10% of
    // raw rows cross it during replay, so membership flips exercise the
    // per-source retraction terms — round 13 shipped this with > 900,
    // above the fixture max, which made the oracle pass vacuously on
    // zero rows (round-14 fix).
    q("m_mv_global_window_union_incremental",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value,
        |    max(event_id) AS event_id
        |  FROM events GROUP BY user_id)
        |SELECT event_id, value,
        |  CAST(rank() OVER (ORDER BY value DESC, event_id) AS BIGINT) AS r
        |FROM latest WHERE value > 100""".stripMargin) { (s, dir) =>
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val fields = Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_id", LongType))
      Seq("m_gwu_a", "m_gwu_b").foreach { t =>
        rw.createTable(t, StructType(fields),
          primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      }
      rw.mv(
        """SELECT event_id, value,
          |  CAST(rank() OVER (ORDER BY value DESC, event_id) AS BIGINT) AS r
          |FROM (SELECT event_id, value FROM m_gwu_a
          |      UNION ALL SELECT event_id, value FROM m_gwu_b) u
          |WHERE value > 100""".stripMargin, "m_gwu_mv")
      val mv = rw.mvByName("m_gwu_mv").get
      require(mv.isGlobalWindowMode,
        "a union-all global rank must take the global-window fold (round 13)")
      val rows = Tables(s, dir, "events")
        .select(fields.map(f => col(f.name)): _*)
        .collect().sortBy(_.getLong(2))
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        val (evens, odds) = chunk.partition(_.getLong(0) % 2 == 0)
        if (evens.nonEmpty) rw.table("m_gwu_a").get.insert(evens.toSeq)
        if (odds.nonEmpty) rw.table("m_gwu_b").get.insert(odds.toSeq)
        rw.flush()
      }
      require(mv.statementEvals <= 1,
        "union global-window epochs must not re-scan the bases")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // EMIT ON WINDOW CLOSE, driver-verified: a watermarked tumble MV with
    // the final-only emit policy holds windows in a pending buffer and
    // emits each exactly once when the watermark passes its end. Spark's
    // watermark lags one micro-batch, so after the chunked replay two
    // far-future sentinel rows close every real window deterministically:
    // sentinel 1 advances the watermark past all real data, sentinel 2's
    // batch applies it. The sentinels' own windows stay open (each ends
    // after the watermark in effect), so the visible state equals the
    // plain batch tumble aggregate of the fixture — and the changelog
    // must contain only Inserts (final-only: no retraction ever).
    q("m_mv_eowc_tumble",
      """SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS ws, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      rw.createTable("m_ev_eowc", eventsSchema)
      val mv = rw.mv(
        """SELECT window_start, count(*) AS n,
          |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM tumble(m_ev_eowc, ts, interval '10 minutes')
          |GROUP BY window_start EMIT ON WINDOW CLOSE""".stripMargin,
        "m_eowc_mv", watermarks = Map("m_ev_eowc" -> (("ts", "0 seconds"))))
      val t = rw.table("m_ev_eowc").get
      val rows = Tables(s, dir, "events")
        .select(eventsSchema.fieldNames.toIndexedSeq.map(col): _*)
        .collect().sortBy(_.getLong(0))
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        t.insert(chunk.toSeq); rw.flush()
      }
      require(mv.isStreamingMode,
        "EOWC MV fell back to batch re-run — must stream with a pending buffer")
      val maxTs = rows.iterator.map(_.getTimestamp(1).getTime).max
      val maxId = rows.last.getLong(0)
      def sentinel(id: Long, offsetMs: Long) = Row(maxId + id,
        new java.sql.Timestamp(maxTs + offsetMs), 0L, "sentinel", 0.0, "{}")
      t.insert(Seq(sentinel(1, 86400000L))); rw.flush()
      t.insert(Seq(sentinel(2, 2 * 86400000L))); rw.flush()
      // final-only emission: the replayed changelog is all Inserts
      val sub = mv.subscription().declareCursor(Some(0L))
      val ops = Iterator.continually(sub.fetch(10000)).takeWhile(_.nonEmpty)
        .flatten.map(r => r.getString(r.length - 2)).toSeq
      require(ops.nonEmpty && ops.forall(_ == "Insert"),
        s"EOWC changelog must be insert-only, got ${ops.distinct}")
      val out = mv.df.select(
        col("window_start").cast("long").as("ws"),
        col("n"), col("sv").cast("double").as("sv"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Delta-join cascade (round 9): a NON-aggregate join of two live PK
    // tables maintains via signed delta joins (Δ(A⋈B) = ΔA⋈B⁻ + A⁺⋈ΔB),
    // never batch re-run — mode-asserted. The dimension side arrives in
    // two waves (half before any event, half mid-replay), so events join
    // late-arriving dimension rows and upsert overwrites retract through
    // the join on BOTH sides.
    q("m_mv_join_delta_incremental",
      """WITH latest AS (
        |  SELECT user_id, max(event_id) AS event_id,
        |    arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT l.event_id, n.n_name AS nation, l.value
        |FROM latest l JOIN nation n ON n.n_nationkey = l.user_id % 25""".stripMargin) {
      (s, dir) =>
      val nationSchema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      val upSchema = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_id", LongType)))
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val evT = rw.createTable("m_djp_ev", upSchema,
        primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      val dimT = rw.createTable("m_djp_dim", nationSchema,
        primaryKey = Seq("n_nationkey"))
      rw.mv("""SELECT e.event_id, n.n_name AS nation, e.value
        |FROM m_djp_ev e JOIN m_djp_dim n ON n.n_nationkey = e.user_id % 25""".stripMargin,
        "m_djp_mv")
      val mv = rw.mvByName("m_djp_mv").get
      require(mv.isDeltaJoinMode,
        "non-aggregate PK⋈PK join MV must maintain via the delta-join cascade")
      val dims = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect().sortBy(_.getInt(0))
      val (dimA, dimB) = dims.splitAt(dims.length / 2)
      dimT.insert(dimA.toSeq); rw.flush()
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
        .collect().sortBy(_.getLong(2))
      var i = 0
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        if (i == CHUNKS / 2) { dimT.insert(dimB.toSeq); rw.flush() }
        evT.insert(chunk.toSeq); rw.flush(); i += 1
      }
      require(mv.isDeltaJoinMode && mv.statementEvals <= 1,
        "delta epochs must not re-evaluate the join statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // LEFT-outer-join delta cascade (round 10): the fact-LEFT-JOIN-dim
    // enrichment MV — the most common real statement shape that used to
    // demote to per-FLUSH batch re-run — maintains via the
    // restricted-difference term: a dim delta retracts/installs the
    // null-padded rows of exactly the facts it can match. Joining on
    // user_id % 50 against 25 dim keys leaves half the facts PERMANENTLY
    // unmatched, so the final hash covers the null padding itself; the dim
    // arrives in two waves (half before any fact, half mid-replay), so
    // mid-replay epochs upgrade null-padded rows to joined rows — the 0↔1
    // match transitions — and upsert overwrites retract through the join.
    q("m_mv_left_join_delta_incremental",
      """WITH latest AS (
        |  SELECT user_id, max(event_id) AS event_id,
        |    arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT l.event_id, n.n_name AS nation, l.value
        |FROM latest l LEFT JOIN nation n ON n.n_nationkey = l.user_id % 50""".stripMargin) {
      (s, dir) =>
      val nationSchema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      val upSchema = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_id", LongType)))
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val evT = rw.createTable("m_ljd_ev", upSchema,
        primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      val dimT = rw.createTable("m_ljd_dim", nationSchema,
        primaryKey = Seq("n_nationkey"))
      rw.mv("""SELECT e.event_id, n.n_name AS nation, e.value
        |FROM m_ljd_ev e LEFT JOIN m_ljd_dim n ON n.n_nationkey = e.user_id % 50""".stripMargin,
        "m_ljd_mv")
      val mv = rw.mvByName("m_ljd_mv").get
      require(mv.isDeltaJoinMode,
        "LEFT-join enrichment MV must maintain via the delta cascade, not batch re-run")
      val dims = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect().sortBy(_.getInt(0))
      val (dimA, dimB) = dims.splitAt(dims.length / 2)
      dimT.insert(dimA.toSeq); rw.flush()
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
        .collect().sortBy(_.getLong(2))
      var i = 0
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        if (i == CHUNKS / 2) { dimT.insert(dimB.toSeq); rw.flush() }
        evT.insert(chunk.toSeq); rw.flush(); i += 1
      }
      require(mv.isDeltaJoinMode && mv.statementEvals <= 1,
        "outer-join delta epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // MULTI-outer-join delta cascade (round 11): fact LEFT dim1 LEFT dim2 —
    // the multi-dimension enrichment statement round 10 still batch-re-ran
    // (single-outer admission). Each dim folds its own restricted-
    // difference term; the dims arrive in waves at DIFFERENT epochs
    // (nation mid-replay at chunk 4, region at chunk 6), so each join's
    // 0↔1 padding transitions fire independently while the other holds,
    // and upsert overwrites retract through both joins at once. Half the
    // facts stay permanently unmatched per dim, so the final hash covers
    // both null paddings.
    q("m_mv_multi_left_join_delta_incremental",
      """WITH latest AS (
        |  SELECT user_id, max(event_id) AS event_id,
        |    arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT l.event_id, n.n_name AS nation, r.r_name AS region, l.value
        |FROM latest l
        |LEFT JOIN nation n ON n.n_nationkey = l.user_id % 50
        |LEFT JOIN region r ON r.r_regionkey = l.user_id % 10""".stripMargin) {
      (s, dir) =>
      val nationSchema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      val regionSchema = StructType(Seq(
        StructField("r_regionkey", IntegerType), StructField("r_name", StringType)))
      val upSchema = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_id", LongType)))
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val evT = rw.createTable("m_mlj_ev", upSchema,
        primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      val dimT = rw.createTable("m_mlj_dim", nationSchema,
        primaryKey = Seq("n_nationkey"))
      val regT = rw.createTable("m_mlj_reg", regionSchema,
        primaryKey = Seq("r_regionkey"))
      rw.mv("""SELECT e.event_id, n.n_name AS nation, r.r_name AS region, e.value
        |FROM m_mlj_ev e
        |LEFT JOIN m_mlj_dim n ON n.n_nationkey = e.user_id % 50
        |LEFT JOIN m_mlj_reg r ON r.r_regionkey = e.user_id % 10""".stripMargin,
        "m_mlj_mv")
      val mv = rw.mvByName("m_mlj_mv").get
      require(mv.isDeltaJoinMode,
        "multi-LEFT-join enrichment must fold via the delta cascade (round 11)")
      val dims = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect().sortBy(_.getInt(0))
      val regs = Tables(s, dir, "region")
        .select("r_regionkey", "r_name")
        .collect().sortBy(_.getInt(0))
      val (dimA, dimB) = dims.splitAt(dims.length / 2)
      val (regA, regB) = regs.splitAt(regs.length / 2)
      dimT.insert(dimA.toSeq); regT.insert(regA.toSeq); rw.flush()
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
        .collect().sortBy(_.getLong(2))
      var i = 0
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        if (i == CHUNKS / 2) { dimT.insert(dimB.toSeq); rw.flush() }
        if (i == CHUNKS * 3 / 4) { regT.insert(regB.toSeq); rw.flush() }
        evT.insert(chunk.toSeq); rw.flush(); i += 1
      }
      require(mv.isDeltaJoinMode && mv.statementEvals <= 1,
        "multi-outer delta epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // FULL-outer-join delta cascade (round 11): neither side is linear —
    // BOTH sources fold restricted-difference terms. Joining on
    // user_id % 200 against nation keys 0..24 leaves key 0 permanently
    // right-padded (no user_id ≡ 0 mod 200) and half the facts
    // left-padded, so the final hash covers both padding directions; the
    // dim arrives in two waves, flipping right-padded dims to joined rows
    // mid-replay, and the chunk-4 DELETE retracts facts so their dims
    // DOWNGRADE back to right-padding — the both-sides adjustment no
    // single-sided term can express.
    q("m_mv_full_join_delta_incremental",
      s"""WITH ch AS (SELECT user_id, value, event_id,
         |    CAST(event_id // (((SELECT count(*) FROM events) + ${CHUNKS - 1}) // $CHUNKS) AS INT) AS chunk
         |  FROM events),
         |early AS (SELECT user_id, arg_max(value, event_id) AS v
         |  FROM ch WHERE chunk <= 3 GROUP BY user_id),
         |deleted AS (SELECT user_id FROM early WHERE v > 90),
         |kept AS (SELECT * FROM ch WHERE NOT (chunk <= 3 AND
         |  user_id IN (SELECT user_id FROM deleted))),
         |latest AS (SELECT user_id, max(event_id) AS event_id,
         |    arg_max(value, event_id) AS value
         |  FROM kept GROUP BY user_id)
         |SELECT l.event_id, n.n_name AS nation, l.value
         |FROM latest l FULL JOIN nation n ON n.n_nationkey = l.user_id % 200""".stripMargin) {
      (s, dir) =>
      val nationSchema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      val upSchema = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_id", LongType)))
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val evT = rw.createTable("m_fjd_ev", upSchema,
        primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      val dimT = rw.createTable("m_fjd_dim", nationSchema,
        primaryKey = Seq("n_nationkey"))
      rw.mv("""SELECT e.event_id, n.n_name AS nation, e.value
        |FROM m_fjd_ev e FULL JOIN m_fjd_dim n ON n.n_nationkey = e.user_id % 200""".stripMargin,
        "m_fjd_mv")
      val mv = rw.mvByName("m_fjd_mv").get
      require(mv.isDeltaJoinMode,
        "FULL-outer join MV must fold via both-side restricted-difference terms (round 11)")
      val dims = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect().sortBy(_.getInt(0))
      val (dimA, dimB) = dims.splitAt(dims.length / 2)
      dimT.insert(dimA.toSeq); rw.flush()
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
        .collect().sortBy(_.getLong(2))
      var i = 0
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        if (i == CHUNKS / 2) { dimT.insert(dimB.toSeq); rw.flush() }
        if (i == 4) {
          rw.execute("DELETE FROM m_fjd_ev WHERE value > 90")
          require(mv.isDeltaJoinMode,
            "fact retractions must not demote the FULL-outer fold")
        }
        evT.insert(chunk.toSeq); rw.flush(); i += 1
      }
      require(mv.isDeltaJoinMode && mv.statementEvals <= 1,
        "FULL-outer delta epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Live-table subquery (round 11): `WHERE x IN (SELECT k FROM
    // live_dim)` admits into the delta cascade — the dim folds as a
    // PLAIN difference term (membership flips retract/install exactly the
    // outer rows whose predicate changed) while the outer upsert source
    // keeps its delta-proportional terms. The dim arrives in two waves
    // (half before any fact, half mid-replay), so mid-replay epochs flip
    // membership for half the key space; mode-asserted.
    q("m_mv_live_subquery_incremental",
      """WITH latest AS (
        |  SELECT user_id, max(event_id) AS event_id,
        |    arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT event_id, user_id, value FROM latest
        |WHERE user_id % 50 IN (SELECT n_nationkey FROM nation)""".stripMargin) {
      (s, dir) =>
      val nationSchema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      val upSchema = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_id", LongType)))
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val evT = rw.createTable("m_lsq_ev", upSchema,
        primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      val dimT = rw.createTable("m_lsq_dim", nationSchema,
        primaryKey = Seq("n_nationkey"))
      rw.mv("""SELECT event_id, user_id, value FROM m_lsq_ev
        |WHERE user_id % 50 IN (SELECT n_nationkey FROM m_lsq_dim)""".stripMargin,
        "m_lsq_mv")
      val mv = rw.mvByName("m_lsq_mv").get
      require(mv.isDeltaJoinMode,
        "a live-table IN subquery must admit into the delta cascade (round 11)")
      val dims = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect().sortBy(_.getInt(0))
      val (dimA, dimB) = dims.splitAt(dims.length / 2)
      dimT.insert(dimA.toSeq); rw.flush()
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
        .collect().sortBy(_.getLong(2))
      var i = 0
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        if (i == CHUNKS / 2) { dimT.insert(dimB.toSeq); rw.flush() }
        evT.insert(chunk.toSeq); rw.flush(); i += 1
      }
      require(mv.isDeltaJoinMode && mv.statementEvals <= 1,
        "subquery-fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // NESTED live-table subquery (round 12): the changelog source is
    // visible only through a subquery WITHIN a subquery — `WHERE k IN
    // (SELECT … FROM static WHERE … >= (SELECT min(…) FROM live_dim))`.
    // The plan-child walk of boundarySourcesIn never crosses the first
    // SubqueryExpression, so before the transitive subquerySourcesIn scan
    // this shape passed admission (occurrence count is subquery-aware
    // since round 11) but classified the dim LINEAR — binding the epoch
    // delta INSIDE the nested subquery. The inner subquery is a scalar
    // AGGREGATE on purpose: membership predicates (IN / NOT IN) over
    // disjoint PK deltas are accidentally linear (the constant terms of
    // the +/− evaluations cancel), but min() over the delta alone is not
    // the change in min() — linear binding double-counts every already-
    // visible row when the mid-replay wave lowers the threshold, and the
    // phantom counts persist to the final state. The dim arrives in two
    // waves (regions {2,3} before any fact, {0,1} mid-replay), so the
    // threshold drop must retract nothing and install regions {0,1}
    // exactly once through the PLAIN-difference fold; mode-asserted with
    // zero statement re-evals.
    q("m_mv_nested_subquery_incremental",
      """WITH latest AS (
        |  SELECT user_id, max(event_id) AS event_id,
        |    arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT event_id, user_id, value FROM latest
        |WHERE user_id % 25 IN (SELECT n_nationkey FROM nation
        |  WHERE n_regionkey >= (SELECT min(r_regionkey) FROM region
        |                        WHERE r_regionkey < 4))""".stripMargin) {
      (s, dir) =>
      val regionSchema = StructType(Seq(
        StructField("r_regionkey", IntegerType), StructField("r_name", StringType)))
      val upSchema = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_id", LongType)))
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val evT = rw.createTable("m_nsq_ev", upSchema,
        primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      val regT = rw.createTable("m_nsq_reg", regionSchema,
        primaryKey = Seq("r_regionkey"))
      // the middle relation is STATIC — a per-epoch constant; only the
      // innermost subquery reads a changelog source
      Tables(s, dir, "nation").select("n_nationkey", "n_regionkey")
        .createOrReplaceTempView("m_nsq_nation")
      rw.mv("""SELECT event_id, user_id, value FROM m_nsq_ev
        |WHERE user_id % 25 IN (SELECT n_nationkey FROM m_nsq_nation
        |  WHERE n_regionkey >= (SELECT min(r_regionkey) FROM m_nsq_reg))""".stripMargin,
        "m_nsq_mv")
      val mv = rw.mvByName("m_nsq_mv").get
      require(mv.isDeltaJoinMode,
        "a nested live-table subquery must admit into the delta cascade (round 12)")
      val regions = Tables(s, dir, "region")
        .select("r_regionkey", "r_name")
        .filter(col("r_regionkey") < 4)
        .collect().sortBy(_.getInt(0))
      val (regB, regA) = regions.splitAt(2)
      regT.insert(regA.toSeq); rw.flush()
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
        .collect().sortBy(_.getLong(2))
      var i = 0
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        if (i == CHUNKS / 2) { regT.insert(regB.toSeq); rw.flush() }
        evT.insert(chunk.toSeq); rw.flush(); i += 1
      }
      require(mv.isDeltaJoinMode && mv.statementEvals <= 1,
        "nested-subquery fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Aggregate over a LEFT JOIN of two live PK tables (round 11): the
    // enrichment-then-rollup statement delta-accumulates — the dim side
    // (not linear under null-extension) folds via the aux-partial
    // difference pair over restricted Q(new)/Q(old), so a dim wave moves
    // facts between the NULL-padded group and named groups through the
    // FOLD; the fact side keeps sign-split delta partials. Joining on
    // user_id % 50 against 25 dim keys keeps a permanent NULL group in
    // the final hash. Mode-asserted with zero statement re-evaluations.
    q("m_mv_left_join_agg_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT n.n_name AS nation, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM latest l LEFT JOIN nation n ON n.n_nationkey = l.user_id % 50
        |GROUP BY n.n_name""".stripMargin) { (s, dir) =>
      val nationSchema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      val upSchema = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_id", LongType)))
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val evT = rw.createTable("m_ljaf_ev", upSchema,
        primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      val dimT = rw.createTable("m_ljaf_dim", nationSchema,
        primaryKey = Seq("n_nationkey"))
      rw.mv("""SELECT n.n_name AS nation, count(*) AS n,
        |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
        |FROM m_ljaf_ev e LEFT JOIN m_ljaf_dim n ON n.n_nationkey = e.user_id % 50
        |GROUP BY n.n_name""".stripMargin, "m_ljaf_mv")
      val mv = rw.mvByName("m_ljaf_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "aggregate over a LEFT JOIN must delta-accumulate (round 11)")
      val dims = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect().sortBy(_.getInt(0))
      val (dimA, dimB) = dims.splitAt(dims.length / 2)
      dimT.insert(dimA.toSeq); rw.flush()
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
        .collect().sortBy(_.getLong(2))
      var i = 0
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        if (i == CHUNKS / 2) { dimT.insert(dimB.toSeq); rw.flush() }
        evT.insert(chunk.toSeq); rw.flush(); i += 1
      }
      require(mv.isDeltaAggMode && mv.statementEvals <= 1,
        "outer-join agg-fold epochs must not re-evaluate the statement")
      val out = mv.df.withColumn("sv", col("sv").cast("double"))
      val materialized = out.localCheckpoint(true)
      rw.close()
      materialized
    },

    // Aggregate over a JOIN of two live PK tables (round 9): the
    // decomposable aggregate folds TELESCOPED per-source partials — the
    // join delta and the aggregate fold composed — so neither base table
    // is ever re-scanned; mode-asserted (isDeltaAggMode), with the
    // dimension side arriving in two waves and upsert overwrites
    // retracting through the join into the group sums.
    q("m_mv_join_agg_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT n.n_name AS nation, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM latest l JOIN nation n ON n.n_nationkey = l.user_id % 25
        |GROUP BY n.n_name""".stripMargin) { (s, dir) =>
      val nationSchema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      val upSchema = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_id", LongType)))
      val rw = GraftEngine.open(ConnOptions(), Some(s))
      val evT = rw.createTable("m_jaf_ev", upSchema,
        primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
      val dimT = rw.createTable("m_jaf_dim", nationSchema,
        primaryKey = Seq("n_nationkey"))
      rw.mv("""SELECT n.n_name AS nation, count(*) AS n,
        |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
        |FROM m_jaf_ev e JOIN m_jaf_dim n ON n.n_nationkey = e.user_id % 25
        |GROUP BY n.n_name""".stripMargin, "m_jaf_mv")
      val mv = rw.mvByName("m_jaf_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "aggregate over a join of two PK tables must fold telescoped partials")
      val dims = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect().sortBy(_.getInt(0))
      val (dimA, dimB) = dims.splitAt(dims.length / 2)
      dimT.insert(dimA.toSeq); rw.flush()
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
        .collect().sortBy(_.getLong(2))
      var i = 0
      rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
        if (i == CHUNKS / 2) { dimT.insert(dimB.toSeq); rw.flush() }
        evT.insert(chunk.toSeq); rw.flush(); i += 1
      }
      require(mv.isDeltaAggMode && mv.statementEvals <= 1,
        "fold epochs must not re-evaluate the join aggregate")
      val materialized = mv.df.withColumn("sv", col("sv").cast("double"))
        .localCheckpoint(true)
      rw.close()
      materialized
    },

    // GLOBAL aggregate fold over an upsert table (round 9): one
    // always-touched row, maintained from the table changelog with zero
    // re-evaluation — every upsert overwrite moves the global sum through
    // a retraction; mode-asserted.
    q("m_mv_global_fold",
      """WITH latest AS (
        |  SELECT user_id, arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |FROM latest""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_glf_t", Seq(("m_glf_mv",
        """SELECT count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv
          |FROM m_glf_t""".stripMargin)))
      val mv = rw.mvByName("m_glf_mv").get
      require(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
        "a global count/sum over an upsert table must fold")
      require(mv.statementEvals <= 1, "fold epochs must not re-evaluate")
      val materialized = mv.df.withColumn("sv", col("sv").cast("double"))
        .localCheckpoint(true)
      rw.close()
      materialized
    },

    // Linear (projection/filter) fold over an upsert table: a stateless
    // SELECT/WHERE MV folds the table's 4-op changelog through the
    // expression instead of batch re-running — an overwrite whose new
    // version leaves the predicate retracts its row.
    q("m_mv_select_pk_fold",
      """WITH latest AS (
        |  SELECT user_id, max(event_id) AS event_id,
        |    arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id)
        |SELECT event_id, user_id, value * 2 AS v2
        |FROM latest WHERE value > 50""".stripMargin) { (s, dir) =>
      val rw = replayUpsert(s, dir, "m_spf_t", Seq(("m_spf_mv",
        "SELECT event_id, user_id, value * 2 AS v2 FROM m_spf_t WHERE value > 50")))
      val mv = rw.mvByName("m_spf_mv").get
      require(mv.isDeltaJoinMode,
        "projection/filter over an upsert table must fold its changelog")
      require(mv.statementEvals <= 1,
        "fold epochs must not re-evaluate the statement")
      val materialized = mv.df.localCheckpoint(true)
      rw.close()
      materialized
    }
  )

  /** Chunked upsert replay: events into a PK(user_id)/version(event_id)
    * live table in [[CHUNKS]] FLUSH-gated epochs — the retraction-source
    * harness for the fold-path oracles above. `beforeChunk(i)` runs just
    * before chunk i's insert (DML injection points); `withTs` widens the
    * schema with `ts`/`event_type` for the session shape. */
  private def replayUpsert(s: SparkSession, dir: String, table: String,
      mvDefs: Seq[(String, String)],
      withTs: Boolean = false,
      beforeChunk: Map[Int, GraftEngine => Unit] = Map.empty,
      opts: ConnOptions = ConnOptions(),
      setup: GraftEngine => Unit = _ => ()): GraftEngine = {
    val fields =
      if (withTs) Seq(StructField("user_id", LongType),
        StructField("ts", TimestampType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("event_id", LongType))
      else Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_id", LongType))
    val rw = GraftEngine.open(opts, Some(s))
    setup(rw) // auxiliary tables an MV references (e.g. a live dim)
    val t = rw.createTable(table, StructType(fields),
      primaryKey = Seq("user_id"), versionColumn = Some("event_id"))
    mvDefs.foreach { case (n, st) => rw.mv(st, n) }
    val rows = Tables(s, dir, "events")
      .select(fields.map(f => col(f.name)): _*)
      .collect().sortBy(_.getLong(fields.length - 1))
    var i = 0
    rows.grouped((rows.length + CHUNKS - 1) / CHUNKS).foreach { chunk =>
      beforeChunk.get(i).foreach(_(rw))
      t.insert(chunk.toSeq); rw.flush(); i += 1
    }
    rw
  }
}
