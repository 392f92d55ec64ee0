package graft.engine

/** Result format of `fetch` — reference `OutputFormat` enum
  * (`risingwave/core.py:150-152`): RAW = row tuples, DATAFRAME = columnar
  * handle (pandas there, Spark DataFrame here). */
sealed trait OutputFormat
object OutputFormat {
  case object RAW extends OutputFormat
  case object DATAFRAME extends OutputFormat
}

/** Connection options — API-parity shape of `RisingWaveConnOptions`
  * (`risingwave/core.py:125-147`). The engine is embedded (one SparkSession
  * per JVM, ≈ the reference's embedded-server autostart path
  * `risingwave/core.py:575-592`), so host/port/DSN are accepted and
  * recorded but do not open sockets. */
final case class ConnOptions(
    connStr: Option[String] = None,
    host: String = "localhost",
    port: Int = 4566,
    user: String = "root",
    password: String = "",
    database: String = "dev",
    ssl: String = "disable",
    /** Streaming-aggregation state backend: "memory" (HDFS-backed default)
      * or "rocksdb". RocksDB keeps MV state off-heap and spillable — the
      * state-bounding knob for unbounded (no-watermark) aggregations at
      * scale, next to the per-table watermark option (SURVEY W9/§7 (e)). */
    stateStore: String = "memory",
    /** Engine data directory. When set, changelog segments and subscription
      * progress persist under it and a later `GraftEngine.open` on the same
      * dir resumes them — `SINCE` cursors replay history from before the
      * restart, like the reference's server-side retention
      * (`risingwave/core.py:526-536` checkpoints against a durable server).
      * Unset = ephemeral temp dirs (test default). */
    dataDir: Option[String] = None,
    /** Streaming parallelism for MV maintainers, independent of the batch
      * shuffle width (RisingWave's `streaming_parallelism` session
      * variable, a public server knob): the shuffle-partition count
      * captured when a maintainer's streaming query starts, which fixes
      * its state-store partitioning. Per-epoch deltas are orders smaller
      * than batch scans, so a lower width cuts pure task-scheduling
      * overhead per epoch; at cluster scale size it to state volume.
      * None = inherit the session's batch width. */
    streamShufflePartitions: Option[Int] = None,
    /** Admit SUM/AVG over float/double into the delta-accumulation fold
      * ([[DeltaAgg]]), with Kahan-compensated carried state. Off by
      * default: re-associating floating additions can drift from a batch
      * evaluation at the last ulp, so the exact-tier hash contract keeps
      * doubles on touched-group recompute unless the user opts into the
      * tolerance tier (compare folded results with an epsilon, or round at
      * the output boundary). COUNT/integral-SUM/decimal folds are exact
      * and unaffected by this flag. */
    foldFloatingPointAgg: Boolean = false)

object ConnOptions {
  /** `postgresql://` DSNs are accepted exactly like the reference rewrites
    * them (`risingwave/core.py:136-139`). */
  def fromConnStr(s: String): ConnOptions =
    ConnOptions(connStr = Some(s.replaceFirst("^postgresql://", "risingwave://")))

  def fromConnectionInfo(host: String, port: Int, user: String,
                         password: String, database: String,
                         ssl: String = "disable"): ConnOptions =
    ConnOptions(None, host, port, user, password, database, ssl)
}
