package graft.sources

import graft.engine.Retry

/** External push-feed bridge — the engine-native form of the reference's
  * Binance websocket source (`binance/core.py:11-35`): subscribe to named
  * streams, decode each message, invoke the handler, auto-reconnect on
  * failure every 5 s.
  *
  * The transport is pluggable because the reference's only transport is a
  * public websocket (zero-egress here): production would plug a real
  * socket; tests plug a deterministic iterator. Semantics preserved:
  * stream names lowercased (P9, `binance/core.py:15`), messages decoded by
  * `encoder`, handler invoked per message, reconnect loop with 5 s backoff
  * (`binance/core.py:30-34`).
  */
object BarStream {

  /** One connection attempt: a (possibly finite or failing) message
    * iterator for the subscribed streams. */
  trait Transport {
    def connect(streams: Seq[String]): Iterator[String]
  }

  val ReconnectDelayMs = 5000L

  /** Blocking subscribe loop (call from a user thread, like the reference).
    * Returns when the stop flag flips; transport failures reconnect after
    * `ReconnectDelayMs`. */
  def subscribeBars[T](
      transport: Transport,
      streams: Seq[String],
      handler: T => Unit,
      encoder: String => T,
      stop: () => Boolean = () => false,
      reconnectDelayMs: Long = ReconnectDelayMs): Unit = {
    val normalized = streams.map(_.toLowerCase)
    while (!stop()) {
      try {
        val it = transport.connect(normalized)
        while (!stop() && it.hasNext) handler(encoder(it.next()))
        if (!it.hasNext && !stop()) return // clean end of finite feed
      } catch {
        case _: InterruptedException => return
        case _: Throwable => Thread.sleep(reconnectDelayMs)
      }
    }
  }

  /** Minimal JSON-object decoder for flat bar payloads (string/number
    * fields), built on Spark's bundled json4s — the reference's
    * `encoder=json.loads` equivalent. */
  def jsonDecoder(msg: String): Map[String, Any] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(msg) match {
      case JObject(fields) => fields.toMap.map {
        case (k, JString(s)) => k -> s
        case (k, JInt(i)) => k -> i.toLong
        case (k, JLong(l)) => k -> l
        case (k, JDouble(d)) => k -> d
        case (k, JDecimal(d)) => k -> d.toDouble
        case (k, JBool(b)) => k -> b
        case (k, v) => k -> v.toString
      }
      case other => Map("value" -> other.toString)
    }
  }
}
