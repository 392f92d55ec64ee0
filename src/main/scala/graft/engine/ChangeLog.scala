package graft.engine

import org.apache.spark.sql.Row

import scala.collection.mutable.ArrayBuffer

/** Per-MV retained change log: the ordered, replayable feed behind
  * subscriptions (SURVEY §2.1 S7). Entries are change rows (payload + op)
  * stamped with a monotone `rw_timestamp` offset (W4: `(epochMs << 16) |
  * seq`, totally ordered within the MV). Retention prunes by the timestamp's
  * epoch part (W7; default 86400 s like `risingwave/core.py:372`).
  *
  * Driver-resident by design: this log is the client-delivery buffer (the
  * reference's FETCH batches terminate at the client too); the distributed
  * artifacts are the MV snapshot and the diff that produced the rows. At
  * scale the same interface would be backed by a parquet/Kafka delta log.
  */
final class ChangeLog {
  private val entries = ArrayBuffer[(Long, Row)]()
  private var lastTs = 0L

  /** Stamp rows with fresh monotone offsets and append atomically. */
  def append(rows: Seq[Row]): Unit = synchronized {
    rows.foreach { r =>
      lastTs = math.max(lastTs + 1, System.currentTimeMillis() << 16)
      entries += ((lastTs, Row.fromSeq(r.toSeq :+ lastTs)))
    }
    notifyAll()
  }

  /** Rows with offset strictly greater than `after`, up to `limit`. */
  def fetchAfter(after: Long, limit: Int): Seq[Row] = synchronized {
    entries.iterator.filter(_._1 > after).take(limit).map(_._2).toSeq
  }

  def latestOffset: Long = synchronized(lastTs)

  def size: Int = synchronized(entries.size)

  /** Drop entries older than `retentionSeconds` (epoch part of the offset). */
  def prune(retentionSeconds: Long): Unit = synchronized {
    val cutoff = (System.currentTimeMillis() - retentionSeconds * 1000L) << 16
    val keep = entries.filter(_._1 >= cutoff)
    entries.clear()
    entries ++= keep
  }

  /** Block until an entry with offset > `after` exists (used by blocking
    * consume loops; 100 ms idle poll like `risingwave/core.py:20`). */
  def awaitAfter(after: Long, timeoutMs: Long): Boolean = synchronized {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (lastTs <= after && System.currentTimeMillis() < deadline)
      wait(math.max(1, deadline - System.currentTimeMillis()))
    lastTs > after
  }
}
