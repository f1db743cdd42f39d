package graft.gtfs

import org.apache.spark.sql.DataFrame

import graft.util.{GraftConfig, RepeatedTask, ResponseCache}

/** Config-wired serving composition for the realtime surface — the
  * engine-side equivalent of the reference's GtfsLakeRealtimeServer
  * (realtime.py:30-147): routing endpoints, per-feed response caching
  * with configured TTLs, RSS rendering behind `rss_enabled`, and the
  * periodic data-review loop. The HTTP/MQTT transport itself stays
  * out of scope (SURVEY §2); this class is everything BEHIND the
  * transport, so a caller can mount `routes` on any server.
  *
  * Entity providers are thunks returning assembled entity frames
  * (FeedAssembler.alertEntities / tripUpdateEntities /
  * vehiclePositionEntities output shape) — re-evaluated per refresh,
  * exactly as the reference re-queries DuckDB per request unless the
  * memcached entry is fresh (realtime.py:104-106).
  */
final class RealtimeApp(
    config: GraftConfig,
    serviceAlerts: () => DataFrame,
    tripUpdates: () => DataFrame,
    vehiclePositions: () => DataFrame,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val cache = new ResponseCache[Array[Byte]](clock)

  private def ttl(feed: String): Long =
    if (config.cachingEnabled) config.cacheTtlSeconds(feed) else 0L

  private def nowSeconds: Long = clock() / 1000L

  /** Assembled FeedMessage wire bytes for one feed, through the
    * response cache when `app.caching_enabled` (realtime.py's
    * endpoint bodies: cache lookup → assemble on miss → store with
    * the feed's TTL).
    */
  def serviceAlertsPbf(): Array[Byte] =
    cache.getOrCompute("service-alerts", ttl("service-alerts")) {
      GtfsRtProto.feedMessagePbf(serviceAlerts(), "alert", nowSeconds)
    }

  def tripUpdatesPbf(): Array[Byte] =
    cache.getOrCompute("trip-updates", ttl("trip-updates")) {
      GtfsRtProto.feedMessagePbf(tripUpdates(), "trip_update", nowSeconds)
    }

  def vehiclePositionsPbf(): Array[Byte] =
    cache.getOrCompute("vehicle-positions", ttl("vehicle-positions")) {
      GtfsRtProto.feedMessagePbf(vehiclePositions(), "vehicle_entity", nowSeconds)
    }

  /** RSS channel XML of the current alerts, using the configured
    * channel metadata (config rss section; realtime.py:560-621).
    * None when `app.rss_enabled` is off — the reference does not
    * mount the endpoint at all then.
    */
  def rssXml(): Option[String] =
    if (!config.getBoolean("app.rss_enabled")) None
    else {
      val alerts = serviceAlerts()
      val flat = alerts.selectExpr(
        "alert.header_text.translation[0].text AS header_text",
        "alert.url.translation[0].text AS url",
        "id AS service_alert_id",
        "alert.description_text.translation[0].text AS description_text")
      val xml = XmlRender.rssChannel(
        flat,
        config.getString("rss.title").getOrElse(""),
        config.getString("rss.description").getOrElse(""),
        config.getString("rss.language").getOrElse("en"))
        .collect()(0).getString(0)
      Some(xml)
    }

  /** Endpoint path → response generator, using the configured
    * routing table (config app.routing; realtime.py:76-101 mounts
    * exactly these routes). RSS appears only when enabled.
    */
  def routes: Map[String, () => Array[Byte]] = {
    val base = Map(
      config.endpoint("service_alerts") -> (() => serviceAlertsPbf()),
      config.endpoint("trip_updates") -> (() => tripUpdatesPbf()),
      config.endpoint("vehicle_positions") -> (() => vehiclePositionsPbf()))
    if (config.getBoolean("app.rss_enabled"))
      base + (config.endpoint("rss") ->
        (() => rssXml().getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    else base
  }

  /** Arm the periodic data-review loop (realtime.py:42,271: a
    * RepeatedTimer re-reviews the dataset every data_review_seconds).
    * Caller supplies the review action (e.g. TTL-expiring the
    * realtime store); returns the task for stop()/shutdown().
    */
  def startReviewLoop(review: () => Unit): RepeatedTask = {
    val task = new RepeatedTask(config.dataReviewSeconds * 1000L, "graft-data-review")(review)
    task.start()
    task
  }

  /** Expire cached responses; exposed for tests and manual refresh
    * (the reference simply waits out memcached TTLs).
    */
  def invalidateResponses(): Unit = cache.clear()
}
