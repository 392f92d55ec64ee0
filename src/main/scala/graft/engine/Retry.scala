package graft.engine

/** Retry with fixed backoff — mirrors the reference's `_retry(f, interval_ms,
  * times)` policy surface (`risingwave/core.py:24-37`): connect 500ms×60,
  * create-subscription 1000ms×5, wait-for-table 1000ms×∞. */
object Retry {
  def retry[T](intervalMs: Long, times: Long)(f: => T): T = {
    var remaining = times
    while (true) {
      try return f
      catch {
        case e: Throwable =>
          remaining -= 1
          if (remaining <= 0) throw e
          Thread.sleep(intervalMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
