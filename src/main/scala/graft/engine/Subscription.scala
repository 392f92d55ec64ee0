package graft.engine

import org.apache.spark.sql.{DataFrame, Row}

import java.util.concurrent.atomic.AtomicBoolean

/** A subscription cursor over an MV/table changelog (reference D6–D8,
  * W4–W8, `risingwave/core.py:483-560`):
  *
  *  - `declareCursor(since)` positions the cursor (default: only new
  *    changes; `SINCE offset` replays retained history — W5);
  *  - `fetch(n)` pops ≤ n change rows non-blocking (D8);
  *  - `consume(handler)` is the blocking loop: 100 ms idle backoff (W6),
  *    at-least-once delivery — progress is persisted AFTER the handler
  *    returns (`risingwave/core.py:549-557`) into the
  *    `risingwave_py_sub_progress` upsert table (K6/K7);
  *  - `close()` exits the loop cleanly (W8).
  *
  * Change rows carry the MV payload + `op` + trailing `rw_timestamp`
  * (`risingwave/core.py:552-554`).
  */
final class Subscription private[engine](
    engine: GraftEngine,
    mv: MaterializedView,
    val subName: String,
    retentionSeconds: Long,
    persistProgress: Boolean) {

  val idleIntervalMs = 100L // DEFAULT_CURSOR_IDLE_INTERVAL_MS (core.py:20)

  private var position: Long = -1L
  private val closed = new AtomicBoolean(false)

  /** D7 — `DECLARE cursor [SINCE offset]`. With persisted progress and no
    * explicit offset, resumes from the stored checkpoint (W5). */
  def declareCursor(since: Option[Long] = None): this.type = {
    position = since.orElse(storedProgress).getOrElse(mv.changeLog.latestOffset)
    this
  }

  private def storedProgress: Option[Long] =
    if (!persistProgress) None
    else engine.progressTable.flatMap { t =>
      val rows = t.batchDF.filter(org.apache.spark.sql.functions.col("sub_name") === subName).collect()
      rows.headOption.map(_.getAs[Long]("progress"))
    }

  /** D8 — non-blocking FETCH n. Prunes retention on the way (W7). */
  def fetch(n: Int): Seq[Row] = {
    mv.changeLog.prune(retentionSeconds)
    val rows = mv.changeLog.fetchAfter(position, n)
    if (rows.nonEmpty)
      position = rows.last.getLong(rows.last.length - 1)
    rows
  }

  /** Change rows as a DataFrame (OutputFormat.DATAFRAME face). */
  def fetchDF(n: Int): DataFrame = {
    val rows = fetch(n)
    val schema = mv.outputSchema
      .add("op", org.apache.spark.sql.types.StringType)
      .add("rw_timestamp", org.apache.spark.sql.types.LongType, nullable = false)
    engine.spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** C9/W6 — blocking consume loop with at-least-once progress persistence.
    * Runs on the calling thread (reference usage spawns a user thread,
    * `README.md:60-70`); returns when `close()` is called. */
  def consume(handler: Seq[Row] => Unit, maxBatchSize: Int = 10): Unit = {
    if (position < 0) declareCursor()
    while (!closed.get()) {
      val batch = fetch(maxBatchSize)
      if (batch.isEmpty) {
        mv.changeLog.awaitAfter(position, idleIntervalMs)
      } else {
        handler(batch) // user-code boundary
        if (persistProgress) writeProgress(position)
      }
    }
  }

  private def writeProgress(offset: Long): Unit =
    engine.progressTable.foreach(_.insertRow(
      Map("sub_name" -> subName, "progress" -> offset), forceFlush = true))

  def currentPosition: Long = position

  def close(): Unit = closed.set(true)
}
