package graft.gtfs

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Service-alert ingest validation (adapter/gtfsrt.py:24-96):
  *  - route/stop ids mapped through the dictionary (identity
  *    fallback),
  *  - ids not present in the nominal sets cleared,
  *  - entity selectors left with neither a valid route nor a valid
  *    stop dropped,
  *  - alerts with no surviving selector dropped entirely.
  *
  * Nominal id sets are broadcast dims (the reference holds them as
  * in-memory Python lists; here the alert stream side scales out).
  */
object AlertIngest {

  /** @param informedEntities columns: service_alert_id, route_id, stop_id
    * @return (surviving alerts, cleaned informed entities)
    */
  def ingest(
      alerts: DataFrame,
      informedEntities: DataFrame,
      nominalRouteIds: DataFrame, // single column route_id
      nominalStopIds: DataFrame, // single column stop_id
      routeMapping: Option[DataFrame] = None,
      stopMapping: Option[DataFrame] = None): (DataFrame, DataFrame) = {

    val mappedRoutes = routeMapping.fold(informedEntities)(m =>
      IdMapper.mapIds(informedEntities, "route_id", m))
    val mapped = stopMapping.fold(mappedRoutes)(m =>
      IdMapper.mapIds(mappedRoutes, "stop_id", m))

    val validRoutes = broadcast(nominalRouteIds.select(col("route_id").as("nom_route_id")).distinct())
    val validStops = broadcast(nominalStopIds.select(col("stop_id").as("nom_stop_id")).distinct())

    val flagged = mapped
      .join(validRoutes, mapped("route_id") === validRoutes("nom_route_id"), "left")
      .join(validStops, mapped("stop_id") === validStops("nom_stop_id"), "left")
      // clear ids that don't resolve against nominal data
      // (adapter/gtfsrt.py:65-75 ClearField)
      .withColumn("route_id", when(col("nom_route_id").isNotNull, col("route_id")))
      .withColumn("stop_id", when(col("nom_stop_id").isNotNull, col("stop_id")))
      .drop("nom_route_id", "nom_stop_id")

    // selectors with no valid reference are removed (gtfsrt.py:80-86)
    val keptEntities = flagged.filter(col("route_id").isNotNull || col("stop_id").isNotNull)

    // alerts with no surviving selector are discarded (gtfsrt.py:88-92)
    val keptAlerts = alerts.join(
      keptEntities.select(col("service_alert_id")).distinct(),
      Seq("service_alert_id"), "left_semi")

    (keptAlerts, keptEntities)
  }
}
