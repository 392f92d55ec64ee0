package graft

import graft.engine._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Restart durability (SURVEY §9 gap, round-2 verdict #7): with a
  * configured `dataDir`, changelog segments and subscription progress
  * persist across `close()` + `GraftEngine.open` on the same dir — the
  * reference's server retains both server-side. */
class DurabilitySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  private def drain(sub: Subscription): Seq[Seq[Any]] =
    Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty)
      .flatten.map(_.toSeq).toSeq

  test("SINCE-0 replay is identical after close + reopen on the same data dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw1.createTable("du_t", schema)
    rw1.mv("SELECT k, count(*) AS n FROM du_t GROUP BY k", "du_mv")
    val t = rw1.table("du_t").get
    t.insert(Seq(Row("a", 1L), Row("b", 2L))); rw1.flush()
    t.insert(Seq(Row("a", 3L))); rw1.flush()
    val ops1 = drain(rw1.mvByName("du_mv").get.subscription().declareCursor(Some(0L)))
    assert(ops1.nonEmpty)
    rw1.close()

    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw2.createTable("du_t", schema) // fresh (live-table data is not durable)
    rw2.mv("SELECT k, count(*) AS n FROM du_t GROUP BY k", "du_mv")
    val ops2 = drain(rw2.mvByName("du_mv").get.subscription().declareCursor(Some(0L)))
    assert(ops2 == ops1, "retained history (incl. offsets) must replay identically")
    rw2.close()
  }

  test("a subscription outliving DROP MV drains cleanly (purge under the log monitor)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    spark.conf.set("graft.changelog.spillThreshold", "4")
    try {
      val rw = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
      rw.createTable("dd_t", schema)
      rw.mv("SELECT k, v FROM dd_t", "dd_mv")
      val t = rw.table("dd_t").get
      // enough ops to overflow the 4-row memory window → spilled segments
      (1 to 12).foreach { i => t.insert(Seq(Row(s"k$i", i.toLong))); rw.flush() }
      val sub = rw.mvByName("dd_mv").get.subscription().declareCursor(Some(0L))
      assert(sub.fetch(3).size == 3) // reads through a spilled segment
      rw.execute("DROP MATERIALIZED VIEW dd_mv")
      assert(!new java.io.File(s"$dir/changelog").exists() ||
        new java.io.File(s"$dir/changelog").listFiles().isEmpty,
        "persisted segments must be purged on drop")
      // the cursor survives the drop: empty log, no crash on deleted paths
      assert(sub.fetch(100).isEmpty)
      rw.close()
    } finally spark.conf.unset("graft.changelog.spillThreshold")
  }

  test("persisted subscription progress resumes across reopen") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw1.createTable("dp_t", schema)
    rw1.mv("SELECT k, v FROM dp_t", "dp_mv")
    rw1.table("dp_t").get.insert(Seq(Row("a", 1L), Row("b", 2L)))
    rw1.flush()
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val sub1 = rw1.mvByName("dp_mv").get
      .subscription("dp_sub", persistProgress = true).declareCursor(Some(0L))
    val consumer = new Thread(() => sub1.consume(rows => seen.addAndGet(rows.size), 10))
    consumer.start()
    while (seen.get() < 2) Thread.sleep(10)
    sub1.close(); consumer.join()
    rw1.close()

    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw2.createTable("dp_t", schema)
    rw2.mv("SELECT k, v FROM dp_t", "dp_mv")
    rw2.table("dp_t").get.insert(Seq(Row("c", 3L)))
    rw2.flush()
    // no explicit SINCE: the cursor resumes from the persisted checkpoint,
    // so only the post-restart change is delivered — not the old history
    val sub2 = rw2.mvByName("dp_mv").get
      .subscription("dp_sub", persistProgress = true).declareCursor()
    val rows = drain(sub2)
    assert(rows.map(_.head) == Seq("c"), s"expected only the new row, got $rows")
    rw2.close()
  }
}
