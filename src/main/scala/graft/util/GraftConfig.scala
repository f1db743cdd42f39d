package graft.util

/** Typed view over the engine's realtime configuration tree,
  * re-expressing the reference's Configuration class (config.py:1-60)
  * and its YAML wiring (__main__.py realtime subcommand): a YAML file
  * is parsed, deep-merged over the built-in defaults, and read
  * through dotted-path accessors.
  *
  * Merge semantics mirror config.py:55-60 exactly, including the
  * Python-truthiness quirk: a leaf whose user value is FALSY (false,
  * 0, "", null, empty map/list) falls back to the default. That
  * makes the DEFAULT-TRUE switches (match_against_first_stop_id,
  * remove_invalid_stop_ids, monitor/mqtt/cors enables) impossible to
  * turn off from YAML — in the reference too: its server inherits
  * the identical merge, so `remove_invalid_stop_ids: false` never
  * reaches its matcher either. We mirror the bug for fidelity
  * (`fromYaml`/`fromFile`); `strictFromYaml` is the escape hatch
  * where the user's explicit false wins — use it (or construct
  * MatchConfig directly) when a disabled default-true switch is
  * actually wanted.
  */
final class GraftConfig(val root: Map[String, Any]) extends Serializable {

  /** Dotted-path lookup: get("app.routing.monitor_endpoint"). */
  def get(path: String): Option[Any] = {
    def step(node: Any, parts: List[String]): Option[Any] = parts match {
      case Nil => Option(node)
      case p :: rest => node match {
        case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].get(p) match {
            case Some(child) => step(child, rest)
            case None => None
          }
        case _ => None
      }
    }
    step(root, path.split('.').toList)
  }

  def getString(path: String): Option[String] = get(path).collect {
    case s: String => s
    case other if other != null => other.toString
  }

  def getBoolean(path: String, default: Boolean = false): Boolean =
    get(path) match {
      case Some(b: Boolean) => b
      case _ => default
    }

  def getLong(path: String, default: Long): Long = get(path) match {
    case Some(l: Long) => l
    case Some(i: Int) => i.toLong
    case Some(d: Double) => d.toLong
    case _ => default
  }

  def getList(path: String): List[Any] = get(path) match {
    case Some(l: List[_]) => l
    case _ => Nil
  }

  /** Maps under a list path — e.g. the mqtt.subscriptions entries. */
  def getMapList(path: String): List[Map[String, Any]] =
    getList(path).collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }

  // -- typed views of the sections the engine consumes --------------

  def matchConfig: MatchConfig = MatchConfig(
    matchFirstStopOnly = getBoolean("matching.match_against_first_stop_id"),
    matchAgainstStopIds = getBoolean("matching.match_against_stop_ids"),
    removeInvalidStopIds = getBoolean("matching.remove_invalid_stop_ids"))

  def cachingEnabled: Boolean = getBoolean("app.caching_enabled")

  /** Per-feed response TTL, seconds (config.py caching section). */
  def cacheTtlSeconds(feed: String): Long = feed match {
    case "service-alerts" => getLong("caching.caching_service_alerts_ttl_seconds", 60L)
    case "trip-updates" => getLong("caching.caching_trip_updates_ttl_seconds", 30L)
    case "vehicle-positions" => getLong("caching.caching_vehicle_positions_ttl_seconds", 15L)
    case _ => 60L
  }

  def dataReviewSeconds: Long = getLong("app.data_review_seconds", 7200L)

  def endpoint(name: String): String =
    getString(s"app.routing.${name}_endpoint").getOrElse(s"/$name")
}

/** The three trip-matching switches (config.py matching section;
  * consumed by adapter/gtfsrt.py:222-246).
  */
final case class MatchConfig(
    matchFirstStopOnly: Boolean,
    matchAgainstStopIds: Boolean,
    removeInvalidStopIds: Boolean) {
  /** Reference gtfsrt.py:222-223: with all three off the per-stop
    * validation loop breaks immediately — any same-(route,start)
    * candidate matches.
    */
  def validatesStops: Boolean =
    matchFirstStopOnly || matchAgainstStopIds || removeInvalidStopIds

  /** gtfsrt.py:225-227: first-stop-only mode is only active when the
    * two stronger switches are BOTH off.
    */
  def firstStopOnlyActive: Boolean =
    matchFirstStopOnly && !matchAgainstStopIds && !removeInvalidStopIds
}

object MatchConfig {
  /** Reference default_config (config.py:33-36). */
  val Default: MatchConfig =
    MatchConfig(matchFirstStopOnly = true, matchAgainstStopIds = false, removeInvalidStopIds = true)

  /** The strictest mode — every reported stop must sit at its nominal
    * position (the behavior q_trip_match oracles).
    */
  val AllStops: MatchConfig =
    MatchConfig(matchFirstStopOnly = false, matchAgainstStopIds = true, removeInvalidStopIds = false)
}

object GraftConfig {

  /** Built-in defaults, mirroring config.py:8-52 key-for-key (minus
    * the MQTT client block — transport out of scope per SURVEY §2;
    * the socket pipeline takes its place).
    */
  def defaultConfig: Map[String, Any] = Map(
    "app" -> Map(
      "caching_enabled" -> false,
      "monitor_enabled" -> true,
      "rss_enabled" -> false,
      "routing" -> Map(
        "service_alerts_endpoint" -> "/gtfs/realtime/service-alerts.pbf",
        "trip_updates_endpoint" -> "/gtfs/realtime/trip-updates.pbf",
        "vehicle_positions_endpoint" -> "/gtfs/realtime/vehicle-positions.pbf",
        "rss_endpoint" -> "/gtfs/realtime/rss.xml",
        "monitor_endpoint" -> "/monitor"),
      "data_review_seconds" -> 7200L,
      "timezone" -> "Europe/Berlin"),
    "caching" -> Map(
      "caching_service_alerts_ttl_seconds" -> 60L,
      "caching_trip_updates_ttl_seconds" -> 30L,
      "caching_vehicle_positions_ttl_seconds" -> 15L),
    "matching" -> Map(
      "match_against_first_stop_id" -> true,
      "match_against_stop_ids" -> false,
      "remove_invalid_stop_ids" -> true),
    "rss" -> Map(
      "title" -> "Public Transport Alerts",
      "description" -> "All public transport alerts in realtime as RSS feed.",
      "language" -> "de-DE",
      "base_url" -> "https://example.invalid",
      "media_url" -> "https://example.invalid/media/default.jpg"))

  /** Parse a YAML config document and merge over defaults with the
    * reference semantics (config.py:55-60).
    */
  def fromYaml(yaml: String): GraftConfig = {
    val user = YamlLite.parse(yaml) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    new GraftConfig(merge(defaultConfig, user).asInstanceOf[Map[String, Any]])
  }

  def fromFile(path: String): GraftConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  def defaults: GraftConfig = new GraftConfig(defaultConfig)

  /** config.py:55-60 verbatim semantics: both-maps recurse over the
    * key UNION; otherwise `actual if actual else defaults` — i.e.
    * Python truthiness decides, so a falsy user leaf yields the
    * default. Documented quirk, mirrored for fidelity.
    */
  def merge(defaults: Any, actual: Any): Any = (defaults, actual) match {
    case (d: Map[_, _], a: Map[_, _]) =>
      val dm = d.asInstanceOf[Map[String, Any]]
      val am = a.asInstanceOf[Map[String, Any]]
      (dm.keySet ++ am.keySet).map { k =>
        k -> merge(dm.getOrElse(k, Map.empty[String, Any]), am.getOrElse(k, Map.empty[String, Any]))
      }.toMap
    case (d, a) => if (truthy(a)) a else d
  }

  /** Missing-keys-only deep merge (no truthiness quirk): the user's
    * explicit false/0/"" wins. For new code that must be able to
    * disable default-true switches.
    */
  def strictMerge(defaults: Any, actual: Any): Any = (defaults, actual) match {
    case (d: Map[_, _], a: Map[_, _]) =>
      val dm = d.asInstanceOf[Map[String, Any]]
      val am = a.asInstanceOf[Map[String, Any]]
      (dm.keySet ++ am.keySet).map { k =>
        k -> ((dm.get(k), am.get(k)) match {
          case (Some(dv), Some(av)) => strictMerge(dv, av)
          case (None, Some(av)) => av
          case (Some(dv), None) => dv
          case (None, None) => null
        })
      }.toMap
    case (_, a) => a
  }

  def strictFromYaml(yaml: String): GraftConfig = {
    val user = YamlLite.parse(yaml) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    new GraftConfig(strictMerge(defaultConfig, user).asInstanceOf[Map[String, Any]])
  }

  private def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case s: String => s.nonEmpty
    case l: Long => l != 0L
    case i: Int => i != 0
    case d: Double => d != 0.0
    case m: Map[_, _] => m.nonEmpty
    case l: List[_] => l.nonEmpty
    case _ => true
  }
}
