package graft.util

import java.util.concurrent.ConcurrentHashMap
import java.util.function.BiFunction

/** In-process TTL response cache, re-expressing the reference's
  * memcached wiring (realtime.py:104-106 builds a memcache.Client;
  * the serving endpoints consult it with per-feed TTLs from the
  * caching config section). The reference offloads to an external
  * memcached because CPython serves each request in-process; on the
  * JVM an in-heap map gives the same semantics without the network
  * hop. The clock is injectable so expiry is testable without
  * sleeping.
  *
  * Values are whatever the endpoint serves (assembled protobuf
  * bytes, rendered XML); compute runs at most once per expiry window
  * per key (per-key lock via ConcurrentHashMap.compute), so a
  * thundering herd on an expired entry triggers one assembly, not N
  * (the memcached pattern cannot promise that).
  */
final class ResponseCache[V](clock: () => Long = () => System.currentTimeMillis()) {

  private final class Entry(val expiresAtMillis: Long, val value: V)
  private val store = new ConcurrentHashMap[String, Entry]()

  /** Cached value if fresh, else run compute, store under the TTL,
    * and return it. ttlSeconds <= 0 bypasses the cache entirely
    * (matching caching_enabled=false: realtime.py serves straight
    * from the database).
    */
  def getOrCompute(key: String, ttlSeconds: Long)(compute: => V): V = {
    if (ttlSeconds <= 0) return compute
    val now = clock()
    val remapper: BiFunction[String, Entry, Entry] = (_, cur) =>
      if (cur != null && cur.expiresAtMillis > now) cur
      else new Entry(now + ttlSeconds * 1000L, compute)
    store.compute(key, remapper).value
  }

  /** Fresh value under key, if any. */
  def get(key: String): Option[V] = {
    val e = store.get(key)
    if (e != null && e.expiresAtMillis > clock()) Some(e.value) else None
  }

  def invalidate(key: String): Unit = store.remove(key)

  def clear(): Unit = store.clear()

  /** Drop expired entries (the reference leaves this to memcached's
    * own eviction); call from a RepeatedTask on long-lived servers.
    */
  def sweep(): Int = {
    val now = clock()
    var removed = 0
    store.forEach { (k, e) =>
      if (e.expiresAtMillis <= now && store.remove(k, e)) removed += 1
    }
    removed
  }

  def size: Int = store.size()
}
