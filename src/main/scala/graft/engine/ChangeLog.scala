package graft.engine

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import scala.collection.mutable.ArrayBuffer

/** Per-MV retained change log: the ordered, replayable feed behind
  * subscriptions (SURVEY §2.1 S7). Entries are change rows (payload + op)
  * stamped with a monotone `rw_timestamp` offset (W4: `(epochMs << 16) |
  * seq`, totally ordered within the MV). Retention prunes by the timestamp's
  * epoch part (W7; default 86400 s like `risingwave/core.py:372`).
  *
  * Memory-bounded: only the newest `spillThreshold` entries stay on the
  * driver (they are the client-delivery buffer — the reference's FETCH
  * batches terminate at the client too). Older history spills to parquet
  * segment files and is replayed through a filtered scan on `SINCE` cursors,
  * so 24 h of retained changes never has to fit in driver memory. At cluster
  * scale the segment directory is the same layout on shared storage (or a
  * Kafka topic); the interface here is unchanged.
  */
final class ChangeLog(spark: SparkSession, rowSchema: () => StructType,
                      persistDir: Option[String] = None) {
  private val entries = ArrayBuffer[(Long, Row)]()
  private var lastTs = 0L

  /** (minTs, maxTs, path, rowCount) per spilled segment, in offset order. */
  private val segments = ArrayBuffer[(Long, Long, String, Long)]()
  private lazy val spillDir = persistDir.map { d =>
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)); d
  }.getOrElse(java.nio.file.Files.createTempDirectory("graft-changelog-").toString)
  private def spillThreshold: Int =
    spark.conf.getOption("graft.changelog.spillThreshold").map(_.toInt).getOrElse(100000)

  // restart recovery: segment metadata is encoded in the directory name
  // (seg-<minTs>-<maxTs>-<count>), so reattaching to a persistent dir needs
  // no footer reads — rebuild the index and resume offsets past the max
  private val segName = """seg-(\d+)-(\d+)-(\d+)""".r
  persistDir.foreach { d =>
    val f = new java.io.File(d)
    if (f.isDirectory) {
      val recovered = f.listFiles().toSeq.flatMap(s => s.getName match {
        case segName(min, max, n) => Some((min.toLong, max.toLong, s.getAbsolutePath, n.toLong))
        case _ => None
      }).sortBy(_._1)
      segments ++= recovered
      recovered.lastOption.foreach { case (_, max, _, _) => lastTs = max }
    }
  }

  private def changeSchema: StructType =
    rowSchema().add("op", StringType).add("rw_timestamp", LongType, nullable = false)

  private def writeSegment(spill: Seq[(Long, Row)]): Unit = {
    val path = s"$spillDir/seg-${spill.head._1}-${spill.last._1}-${spill.size}"
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(spill.map(_._2).toList.asJava, changeSchema)
      .coalesce(1).write.mode("overwrite").parquet(path)
    segments += ((spill.head._1, spill.last._1, path, spill.size.toLong))
  }

  /** Stamp rows with fresh monotone offsets and append atomically; spill
    * the oldest half of the in-memory window when it overflows. */
  def append(rows: Seq[Row]): Unit = synchronized {
    rows.foreach { r =>
      lastTs = math.max(lastTs + 1, System.currentTimeMillis() << 16)
      entries += ((lastTs, Row.fromSeq(r.toSeq :+ lastTs)))
    }
    val limit = spillThreshold
    if (entries.size > limit) {
      val n = entries.size - limit / 2
      writeSegment(entries.take(n).toList)
      entries.remove(0, n)
    }
    notifyAll()
  }

  /** Durable-mode shutdown hook: spill the in-memory tail so the whole
    * retained history is on disk for the next engine open. No-op when the
    * changelog is ephemeral (no persist dir). */
  def flushTail(): Unit = synchronized {
    if (persistDir.nonEmpty && entries.nonEmpty) {
      writeSegment(entries.toList)
      entries.clear()
    }
  }

  /** Rows with offset strictly greater than `after`, up to `limit` —
    * spilled segments first (offset-filtered parquet scan), then the
    * in-memory tail. The whole read holds the monitor so a concurrent
    * [[prune]] cannot unlink segment files mid-scan (fetch batches are
    * small; retention pruning is rare). */
  def fetchAfter(after: Long, limit: Int): Seq[Row] = synchronized {
    val segs = segments.filter(_._2 > after).toList
    val memRows = entries.iterator.filter(_._1 > after).take(limit).map(_._2).toList
    if (segs.isEmpty) memRows
    else {
      import org.apache.spark.sql.functions.col
      val spilled = spark.read.parquet(segs.map(_._3): _*)
        .filter(col("rw_timestamp") > after)
        .orderBy("rw_timestamp")
        .limit(limit)
        .collect().toSeq
      (spilled ++ memRows).take(limit)
    }
  }

  def latestOffset: Long = synchronized(lastTs)

  /** Total retained rows (memory tail + spilled segments). */
  def size: Long = synchronized(entries.size.toLong + segments.map(_._4).sum)

  /** Drop history older than `retentionSeconds` (epoch part of the offset):
    * whole spilled segments are unlinked, the memory tail is filtered. */
  def prune(retentionSeconds: Long): Unit = synchronized {
    val cutoff = (System.currentTimeMillis() - retentionSeconds * 1000L) << 16
    val (drop, keep) = segments.partition(_._2 < cutoff)
    drop.foreach { case (_, _, p, _) =>
      scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    }
    segments.clear(); segments ++= keep
    val keepMem = entries.filter(_._1 >= cutoff)
    entries.clear(); entries ++= keepMem
  }

  /** DROP MV: irrevocably delete the retained history — memory tail,
    * segment index, and the on-disk files (persistent or temp). Holds the
    * monitor, honoring [[fetchAfter]]'s no-unlink-mid-scan invariant; a
    * subscription that outlives the drop sees an empty log and drains
    * cleanly instead of crashing on deleted segment paths. */
  def purge(): Unit = synchronized {
    entries.clear()
    segments.foreach { case (_, _, p, _) =>
      scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    }
    segments.clear()
    persistDir.foreach { d =>
      scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively()
    }
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
