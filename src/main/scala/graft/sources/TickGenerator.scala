package graft.sources

import graft.engine.LiveTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Synthetic OHLCV tick generator — parity with the reference demo's
  * `generate_tick_data()` (`demo.py:10-30`): 1–5 random rows per tick over
  * 5 symbols, seeded for determinism. */
final class TickGenerator(seed: Long = 42L) {
  private val rnd = new scala.util.Random(seed)
  val symbols = Seq("AAPL", "GOOG", "MSFT", "AMZN", "TSLA")
  val MaxRowsPerTick = 5

  def schema: StructType = StructType(Seq(
    StructField("symbol", StringType), StructField("timestamp", TimestampType),
    StructField("open", DoubleType), StructField("high", DoubleType),
    StructField("low", DoubleType), StructField("close", DoubleType),
    StructField("volume", DoubleType)))

  /** One tick: 1–5 rows at time `nowMs`. */
  def tick(nowMs: Long): Seq[Row] = {
    val n = 1 + rnd.nextInt(MaxRowsPerTick)
    Seq.fill(n) {
      val base = 100 + rnd.nextDouble() * 400
      val high = base * (1 + rnd.nextDouble() * 0.01)
      val low = base * (1 - rnd.nextDouble() * 0.01)
      Row(symbols(rnd.nextInt(symbols.size)), new Timestamp(nowMs),
        base, high, low, base + (high - low) * (rnd.nextDouble() - 0.5),
        rnd.nextDouble() * 1000)
    }
  }

  /** Drive `ticks` epochs into a live table, `intervalMs` of simulated time
    * apart (deterministic clock — SURVEY §5.2 item 5), flushing per tick
    * like the demo's insert → FLUSH loop. */
  def run(table: LiveTable, ticks: Int, startMs: Long = 1704067200000L,
          intervalMs: Long = 1000L)(flush: () => Unit): Unit = {
    var t = startMs
    (1 to ticks).foreach { _ =>
      table.insert(tick(t))
      flush()
      t += intervalMs
    }
  }
}
