package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** In-JVM MQTT-shaped broker fixture + the MQTT topic-filter matcher.
  *
  * The reference's realtime server subscribes a configured list of
  * `(topic filter, payload type)` pairs and routes every `_on_message`
  * by the FIRST filter that matches the message topic
  * (realtime.py:59-68 builds the mapping, realtime.py:185-191 resolves
  * it with paho's wildcard semantics). [[graft.sources.MqttWireProvider]]
  * mounts exactly that contract as a DataSourceV2 micro-batch stream;
  * this object is the transport behind it — a named, append-only,
  * sequence-stamped message log standing in for the broker session.
  *
  * Scale/production contract: the DSv2 source depends ONLY on the log
  * interface (monotone sequence, replayable `slice(from, until)`) —
  * swapping this fixture for a durable bridge (a paho/Kafka consumer
  * appending into a persistent log) changes no Spark-side code. The
  * in-JVM registry is intentionally process-local: it exists so the
  * offset/replay semantics are spec-able end-to-end without a network
  * broker in the container.
  */
object MqttBroker {

  final case class Message(seq: Long, topic: String, payload: String,
      publishTs: Long)

  final class Broker {
    private val log = ArrayBuffer.empty[Message]

    /** Append one message; the broker stamps the next sequence. */
    def publish(topic: String, payload: String,
        publishTs: Long = System.currentTimeMillis()): Long =
      log.synchronized {
        val seq = log.length.toLong
        log += Message(seq, topic, payload, publishTs)
        seq
      }

    /** Exclusive end of the log — the source's latest offset. */
    def endSeq: Long = log.synchronized(log.length.toLong)

    /** Messages with seq in [from, until) — the replayable batch. */
    def slice(from: Long, until: Long): Seq[Message] = log.synchronized {
      log.view.slice(from.toInt, math.min(until, log.length).toInt).toVector
    }
  }

  private val brokers = TrieMap.empty[String, Broker]

  /** The named broker, created on first use (publisher or source —
    * either side may come up first, like a real broker connection).
    */
  def get(name: String): Broker = brokers.getOrElseUpdate(name, new Broker)

  /** Drop a named broker (test teardown). */
  def drop(name: String): Unit = brokers.remove(name)

  /** MQTT topic-filter match (the paho `topic_matches_sub` semantics
    * the reference resolves subscriptions with): `/`-separated
    * levels, `+` matches exactly one level, a trailing `#` matches
    * the remaining levels INCLUDING none (`sport/#` matches `sport`).
    * A `#` anywhere but the last level never matches (invalid filter).
    */
  def topicMatches(filter: String, topic: String): Boolean = {
    val f = filter.split("/", -1)
    val t = topic.split("/", -1)
    def go(i: Int, j: Int): Boolean =
      if (i == f.length) j == t.length
      else if (f(i) == "#") i == f.length - 1
      else if (j == t.length) false
      else if (f(i) == "+" || f(i) == t(j)) go(i + 1, j + 1)
      else false
    go(0, 0)
  }

  /** First matching subscription's type for `topic`, if any — the
    * reference's `_get_subscription_type` (order-sensitive).
    */
  def subscriptionType(subs: Seq[(String, String)],
      topic: String): Option[String] =
    subs.collectFirst { case (f, tpe) if topicMatches(f, topic) => tpe }
}
