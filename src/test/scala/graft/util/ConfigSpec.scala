package graft.util

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  // A config document exercising every YAML shape the reference's
  // sample file uses (gtfsduckdb-realtime.yaml): nested maps, block
  // lists of maps with deeper nesting, flow lists, quoted scalars,
  // nulls, ints, bools, a hash inside a value, and comments.
  private val sampleYaml =
    """# engine realtime configuration
      |app:
      |  caching_enabled: true
      |  monitor_enabled: true
      |  rss_enabled: true
      |  routing:
      |    service_alerts_endpoint: /rt/alerts.pbf
      |    monitor_endpoint: /mon   # trailing comment
      |  data_review_seconds: 600
      |  timezone: 'Europe/Berlin'
      |caching:
      |  caching_server_endpoint: [CacheA, CacheB]
      |  caching_service_alerts_ttl_seconds: 45
      |matching:
      |  match_against_first_stop_id: true
      |  match_against_stop_ids: false
      |  remove_invalid_stop_ids: true
      |feeds:
      |  subscriptions:
      |    - topic: realtime/sample/service-alerts/#
      |      type: gtfsrt-service-alerts
      |      mapping:
      |        routes: ./routes_mapping.csv
      |        stops: ./stops_mapping.csv
      |    - topic: realtime/sample/tripupdates/#
      |      type: gtfsrt-trip-updates
      |rss:
      |  title: Demo Alerts
      |  base_url: https://example.invalid
      |  media_url: null
      |""".stripMargin

  test("YamlLite parses the reference config shapes") {
    val root = YamlLite.parse(sampleYaml).asInstanceOf[Map[String, Any]]
    val app = root("app").asInstanceOf[Map[String, Any]]
    assert(app("caching_enabled") == true)
    assert(app("data_review_seconds") == 600L)
    assert(app("timezone") == "Europe/Berlin") // quotes stripped
    val routing = app("routing").asInstanceOf[Map[String, Any]]
    assert(routing("monitor_endpoint") == "/mon") // comment stripped
    val caching = root("caching").asInstanceOf[Map[String, Any]]
    assert(caching("caching_server_endpoint") == List("CacheA", "CacheB"))
    val subs = root("feeds").asInstanceOf[Map[String, Any]]("subscriptions").asInstanceOf[List[Any]]
    assert(subs.size == 2)
    val first = subs.head.asInstanceOf[Map[String, Any]]
    // '#' inside a value is NOT a comment (no preceding space)
    assert(first("topic") == "realtime/sample/service-alerts/#")
    assert(first("mapping").asInstanceOf[Map[String, Any]]("stops") == "./stops_mapping.csv")
    val rss = root("rss").asInstanceOf[Map[String, Any]]
    // value containing a colon (URL) stays one scalar
    assert(rss("base_url") == "https://example.invalid")
    assert(rss("media_url") == null)
  }

  test("YamlLite: block sequence at the key's own indent (yaml.safe_load style)") {
    val root = YamlLite.parse(
      "feeds:\n- topic: a\n  kind: x\n- topic: b\nplain:\n- 1\n- 2\nafter: ok\n")
      .asInstanceOf[Map[String, Any]]
    val feeds = root("feeds").asInstanceOf[List[Any]]
    assert(feeds.size == 2)
    assert(feeds.head.asInstanceOf[Map[String, Any]] == Map("topic" -> "a", "kind" -> "x"))
    assert(root("plain") == List(1L, 2L))
    assert(root("after") == "ok")
  }

  test("YamlLite scalar typing and flow edge cases") {
    val root = YamlLite.parse(
      "a: 1.5\nb: -7\nc: ~\nd: \"x: y\"\ne: []\nf: [1, 2.0, true, 'z']\n")
      .asInstanceOf[Map[String, Any]]
    assert(root("a") == 1.5)
    assert(root("b") == -7L)
    assert(root("c") == null)
    assert(root("d") == "x: y")
    assert(root("e") == Nil)
    assert(root("f") == List(1L, 2.0, true, "z"))
  }

  test("merge mirrors config.py semantics: user wins, missing defaults kept, falsy falls back") {
    val cfg = GraftConfig.fromYaml(sampleYaml)
    // user override
    assert(cfg.getLong("app.data_review_seconds", 0) == 600L)
    assert(cfg.getString("app.routing.service_alerts_endpoint").contains("/rt/alerts.pbf"))
    // defaults fill unmentioned keys, including siblings of overrides
    assert(cfg.getString("app.routing.trip_updates_endpoint")
      .contains("/gtfs/realtime/trip-updates.pbf"))
    assert(cfg.getLong("caching.caching_trip_updates_ttl_seconds", 0) == 30L)
    // the documented Python-truthiness quirk (config.py:55-60):
    // explicit false yields the default (here default is also false)
    assert(!cfg.getBoolean("matching.match_against_stop_ids"))
    // quirk where default is TRUE: user false cannot win under
    // reference semantics...
    val quirky = GraftConfig.fromYaml("matching:\n  remove_invalid_stop_ids: false\n")
    assert(quirky.getBoolean("matching.remove_invalid_stop_ids"))
    // ...but does win under strictMerge
    val strict = GraftConfig.strictFromYaml("matching:\n  remove_invalid_stop_ids: false\n")
    assert(!strict.getBoolean("matching.remove_invalid_stop_ids"))
  }

  test("typed section views") {
    val cfg = GraftConfig.fromYaml(sampleYaml)
    assert(cfg.cachingEnabled)
    assert(cfg.cacheTtlSeconds("service-alerts") == 45L)
    assert(cfg.cacheTtlSeconds("vehicle-positions") == 15L)
    val mc = cfg.matchConfig
    assert(mc == MatchConfig(matchFirstStopOnly = true, matchAgainstStopIds = false,
      removeInvalidStopIds = true))
    assert(mc.validatesStops && !mc.firstStopOnlyActive)
    assert(MatchConfig(matchFirstStopOnly = true, matchAgainstStopIds = false,
      removeInvalidStopIds = false).firstStopOnlyActive)
    assert(!MatchConfig(matchFirstStopOnly = false, matchAgainstStopIds = false,
      removeInvalidStopIds = false).validatesStops)
  }

  test("defaults alone give the reference default_config") {
    val cfg = GraftConfig.defaults
    assert(!cfg.cachingEnabled)
    assert(cfg.dataReviewSeconds == 7200L)
    assert(cfg.endpoint("monitor") == "/monitor")
    assert(cfg.matchConfig == MatchConfig.Default)
  }

  test("ResponseCache: TTL expiry, single compute per window, bypass at ttl<=0") {
    var now = 1000L
    val cache = new ResponseCache[String](() => now)
    val computes = new AtomicInteger(0)
    def fetch(): String = cache.getOrCompute("k", 10L) { computes.incrementAndGet(); s"v@$now" }
    assert(fetch() == "v@1000" && computes.get == 1)
    now += 9000
    assert(fetch() == "v@1000" && computes.get == 1) // still fresh
    now += 2000 // past the 10s TTL
    assert(fetch() == "v@12000" && computes.get == 2)
    // ttl<=0 bypasses storage entirely
    val before = cache.size
    cache.getOrCompute("nocache", 0L)("x")
    assert(cache.size == before)
    // sweep drops expired entries
    now += 100000
    assert(cache.sweep() >= 1 && cache.get("k").isEmpty)
  }

  test("ResponseCache: concurrent misses compute once") {
    val cache = new ResponseCache[String](() => 0L)
    val computes = new AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => cache.getOrCompute("hot", 60L) {
        computes.incrementAndGet(); "v"
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(computes.get == 1)
  }

  test("RepeatedTask: startImmediately fires now then on the interval; stop halts") {
    val ticks = new AtomicInteger(0)
    val latch = new CountDownLatch(3)
    val task = new RepeatedTask(50L, "spec-task")(() => { ticks.incrementAndGet(); latch.countDown() })
    task.startImmediately()
    assert(latch.await(5, TimeUnit.SECONDS), "expected 3 ticks within 5s")
    task.stop()
    assert(!task.isRunning)
    val after = ticks.get
    Thread.sleep(200)
    assert(ticks.get == after, "ticks continued after stop()")
    // a throwing tick does not kill the schedule
    val lives = new CountDownLatch(2)
    val flaky = new RepeatedTask(30L, "spec-flaky")(() => {
      lives.countDown(); throw new RuntimeException("tick boom")
    })
    flaky.start()
    assert(lives.await(5, TimeUnit.SECONDS), "schedule died after a throwing tick")
    flaky.shutdown()
  }
}
