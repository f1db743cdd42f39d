package graft.gtfs

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** GTFS-RT protobuf wire serialization — the reference's default
  * serving format (realtime.py:276 `format = ... 'pbf'`,
  * realtime.py:300-301 / 395 / 476:
  * `ParseDict(feed_message, gtfs_realtime_pb2.FeedMessage()).SerializeToString()`).
  *
  * Encodes the SAME nested entity rows [[FeedAssembler]] builds for
  * JSON, so both formats derive from one assembly plan. Field
  * numbers and enum values come from the public gtfs-realtime.proto
  * spec; fields are emitted in field-number order, matching canonical
  * protobuf serialization, and present-but-default values (e.g.
  * schedule_relationship SCHEDULED=0) are emitted because ParseDict
  * on a proto2 message marks them explicitly present.
  *
  * Scale shape: each FeedEntity encodes independently on executors
  * ([[entityPbf]] is a narrow map, no shuffle); only the final
  * header+concat of one serving document happens driver-side, same
  * as the reference's single HTTP response body.
  */
object GtfsRtProto {

  // ---- enum name -> number tables (public gtfs-realtime.proto) ----

  private val TripScheduleRelationship = Map(
    "SCHEDULED" -> 0L, "ADDED" -> 1L, "UNSCHEDULED" -> 2L, "CANCELED" -> 3L,
    "REPLACEMENT" -> 5L, "DUPLICATED" -> 6L, "DELETED" -> 7L)

  private val StopTimeScheduleRelationship = Map(
    "SCHEDULED" -> 0L, "SKIPPED" -> 1L, "NO_DATA" -> 2L, "UNSCHEDULED" -> 3L)

  private val Cause = Map(
    "UNKNOWN_CAUSE" -> 1L, "OTHER_CAUSE" -> 2L, "TECHNICAL_PROBLEM" -> 3L,
    "STRIKE" -> 4L, "DEMONSTRATION" -> 5L, "ACCIDENT" -> 6L, "HOLIDAY" -> 7L,
    "WEATHER" -> 8L, "MAINTENANCE" -> 9L, "CONSTRUCTION" -> 10L,
    "POLICE_ACTIVITY" -> 11L, "MEDICAL_EMERGENCY" -> 12L)

  private val Effect = Map(
    "NO_SERVICE" -> 1L, "REDUCED_SERVICE" -> 2L, "SIGNIFICANT_DELAYS" -> 3L,
    "DETOUR" -> 4L, "ADDITIONAL_SERVICE" -> 5L, "MODIFIED_SERVICE" -> 6L,
    "OTHER_EFFECT" -> 7L, "UNKNOWN_EFFECT" -> 8L, "STOP_MOVED" -> 9L,
    "NO_EFFECT" -> 10L, "ACCESSIBILITY_ISSUE" -> 11L)

  private val Incrementality = Map("FULL_DATASET" -> 0L, "DIFFERENTIAL" -> 1L)

  private val VehicleStopStatus = Map(
    "INCOMING_AT" -> 0L, "STOPPED_AT" -> 1L, "IN_TRANSIT_TO" -> 2L)

  private val CongestionLevel = Map(
    "UNKNOWN_CONGESTION_LEVEL" -> 0L, "RUNNING_SMOOTHLY" -> 1L,
    "STOP_AND_GO" -> 2L, "CONGESTION" -> 3L, "SEVERE_CONGESTION" -> 4L)

  private val WheelchairAccessible = Map(
    "NO_VALUE" -> 0L, "UNKNOWN" -> 1L,
    "WHEELCHAIR_ACCESSIBLE" -> 2L, "WHEELCHAIR_INACCESSIBLE" -> 3L)

  private def enumValue(table: Map[String, Long], kind: String)(name: String): Long =
    table.getOrElse(name,
      throw new IllegalArgumentException(s"unknown $kind enum name: $name"))

  // ---- null-safe Row field access (schemas are the FeedAssembler structs) ----

  private def present(r: Row, name: String): Boolean = {
    val i = r.schema.fieldNames.indexOf(name)
    i >= 0 && !r.isNullAt(i)
  }

  private def str(r: Row, name: String): Option[String] =
    if (present(r, name)) Some(r.getAs[String](name)) else None

  private def num(r: Row, name: String): Option[Long] =
    if (!present(r, name)) None
    else Some(r.getAs[Any](name) match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case s: String => java.lang.Long.parseLong(s.trim)
      case other => throw new IllegalArgumentException(s"non-integral $name: $other")
    })

  private def dbl(r: Row, name: String): Option[Double] =
    if (!present(r, name)) None
    else Some(r.getAs[Any](name) match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case other => throw new IllegalArgumentException(s"non-numeric $name: $other")
    })

  private def sub(r: Row, name: String): Option[Row] =
    if (present(r, name)) Some(r.getAs[Row](name)) else None

  private def arr(r: Row, name: String): scala.collection.Seq[Row] =
    if (present(r, name)) r.getAs[scala.collection.Seq[Row]](name)
    else scala.collection.Seq.empty

  // ---- message encoders, fields in field-number order ----

  /** TripDescriptor: trip_id=1, start_time=2, start_date=3,
    * schedule_relationship=4, route_id=5, direction_id=6.
    */
  private[gtfs] def tripDescriptor(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    str(r, "trip_id").foreach(w.string(1, _))
    str(r, "start_time").foreach(w.string(2, _))
    str(r, "start_date").foreach(w.string(3, _))
    str(r, "schedule_relationship")
      .foreach(n => w.varint(4, enumValue(TripScheduleRelationship, "ScheduleRelationship")(n)))
    str(r, "route_id").foreach(w.string(5, _))
    num(r, "direction_id").foreach(w.varint(6, _))
    w.result
  }

  /** VehicleDescriptor: id=1, label=2, license_plate=3,
    * wheelchair_accessible=4.
    */
  private[gtfs] def vehicleDescriptor(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    str(r, "id").foreach(w.string(1, _))
    str(r, "label").foreach(w.string(2, _))
    str(r, "license_plate").foreach(w.string(3, _))
    str(r, "wheelchair_accessible")
      .foreach(n => w.varint(4, enumValue(WheelchairAccessible, "WheelchairAccessible")(n)))
    w.result
  }

  /** StopTimeEvent: delay=1, time=2, uncertainty=3. */
  private def stopTimeEvent(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    num(r, "delay").foreach(w.varint(1, _))
    num(r, "time").foreach(w.varint(2, _))
    num(r, "uncertainty").foreach(w.varint(3, _))
    w.result
  }

  /** StopTimeUpdate: stop_sequence=1, arrival=2, departure=3,
    * stop_id=4, schedule_relationship=5.
    */
  private def stopTimeUpdate(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    num(r, "stop_sequence").foreach(w.varint(1, _))
    sub(r, "arrival").foreach(a => w.message(2, stopTimeEvent(a)))
    sub(r, "departure").foreach(d => w.message(3, stopTimeEvent(d)))
    str(r, "stop_id").foreach(w.string(4, _))
    str(r, "schedule_relationship")
      .foreach(n => w.varint(5, enumValue(StopTimeScheduleRelationship, "StopTimeUpdate.ScheduleRelationship")(n)))
    w.result
  }

  /** TripUpdate: trip=1, stop_time_update=2 (repeated, list order),
    * vehicle=3.
    */
  private[gtfs] def tripUpdate(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    sub(r, "trip").foreach(t => w.message(1, tripDescriptor(t)))
    arr(r, "stop_time_update").foreach(s => w.message(2, stopTimeUpdate(s)))
    sub(r, "vehicle").foreach(v => w.message(3, vehicleDescriptor(v)))
    w.result
  }

  /** Position: latitude=1 (float), longitude=2 (float), bearing=3
    * (float), odometer=4 (double), speed=5 (float).
    */
  private def position(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    dbl(r, "latitude").foreach(v => w.float32(1, v.toFloat))
    dbl(r, "longitude").foreach(v => w.float32(2, v.toFloat))
    dbl(r, "bearing").foreach(v => w.float32(3, v.toFloat))
    dbl(r, "odometer").foreach(w.double64(4, _))
    dbl(r, "speed").foreach(v => w.float32(5, v.toFloat))
    w.result
  }

  /** VehiclePosition: trip=1, position=2, current_stop_sequence=3,
    * current_status=4, timestamp=5, congestion_level=6, stop_id=7,
    * vehicle=8.
    */
  private[gtfs] def vehiclePosition(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    sub(r, "trip").foreach(t => w.message(1, tripDescriptor(t)))
    sub(r, "position").foreach(p => w.message(2, position(p)))
    num(r, "current_stop_sequence").foreach(w.varint(3, _))
    str(r, "current_status")
      .foreach(n => w.varint(4, enumValue(VehicleStopStatus, "VehicleStopStatus")(n)))
    num(r, "timestamp").foreach(w.varint(5, _))
    str(r, "congestion_level")
      .foreach(n => w.varint(6, enumValue(CongestionLevel, "CongestionLevel")(n)))
    str(r, "stop_id").foreach(w.string(7, _))
    sub(r, "vehicle").foreach(v => w.message(8, vehicleDescriptor(v)))
    w.result
  }

  /** TranslatedString { translation=1 { text=1, language=2 } }. */
  private def translatedString(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    arr(r, "translation").foreach { t =>
      val tw = new ProtoWire.Writer
      str(t, "text").foreach(tw.string(1, _))
      str(t, "language").foreach(tw.string(2, _))
      w.message(1, tw.result)
    }
    w.result
  }

  /** TimeRange: start=1, end=2. */
  private def timeRange(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    num(r, "start").foreach(w.varint(1, _))
    num(r, "end").foreach(w.varint(2, _))
    w.result
  }

  /** EntitySelector: agency_id=1, route_id=2, route_type=3, trip=4,
    * stop_id=5.
    */
  private def entitySelector(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    str(r, "agency_id").foreach(w.string(1, _))
    str(r, "route_id").foreach(w.string(2, _))
    num(r, "route_type").foreach(w.varint(3, _))
    sub(r, "trip").foreach(t => w.message(4, tripDescriptor(t)))
    str(r, "stop_id").foreach(w.string(5, _))
    w.result
  }

  /** Alert: active_period=1, informed_entity=5, cause=6, effect=7,
    * url=8, header_text=10, description_text=11, tts_header_text=12,
    * tts_description_text=13.
    */
  private[gtfs] def alert(r: Row): Array[Byte] = {
    val w = new ProtoWire.Writer
    arr(r, "active_period").foreach(ap => w.message(1, timeRange(ap)))
    arr(r, "informed_entity").foreach(ie => w.message(5, entitySelector(ie)))
    str(r, "cause").foreach(n => w.varint(6, enumValue(Cause, "Cause")(n)))
    str(r, "effect").foreach(n => w.varint(7, enumValue(Effect, "Effect")(n)))
    sub(r, "url").foreach(t => w.message(8, translatedString(t)))
    sub(r, "header_text").foreach(t => w.message(10, translatedString(t)))
    sub(r, "description_text").foreach(t => w.message(11, translatedString(t)))
    sub(r, "tts_header_text").foreach(t => w.message(12, translatedString(t)))
    sub(r, "tts_description_text").foreach(t => w.message(13, translatedString(t)))
    w.result
  }

  // ---- FeedEntity / FeedMessage assembly ----

  /** FeedEntity field number for each entity payload column
    * FeedAssembler produces: trip_update=3, vehicle=4, alert=5.
    */
  private val EntityField = Map(
    "trip_update" -> (3, (r: Row) => tripUpdate(r)),
    "vehicle_entity" -> (4, (r: Row) => vehiclePosition(r)),
    "alert" -> (5, (r: Row) => alert(r)))

  private def feedEntity(id: String, payload: Row, entityCol: String): Array[Byte] = {
    val (field, enc) = EntityField.getOrElse(entityCol,
      throw new IllegalArgumentException(s"unknown entity column: $entityCol"))
    val w = new ProtoWire.Writer
    w.string(1, id)
    w.message(field, enc(payload))
    w.result
  }

  /** Distributed per-entity encode: (id, pbf) with one FeedEntity's
    * wire bytes per row. Narrow map over the (already ordered)
    * entity rows — no shuffle, no driver involvement.
    */
  def entityPbf(entities: DataFrame, entityCol: String): DataFrame = {
    val idIdx = entities.schema.fieldIndex("id")
    val payloadIdx = entities.schema.fieldIndex(entityCol)
    entities.map { row =>
      (row.getString(idIdx), feedEntity(row.getString(idIdx), row.getStruct(payloadIdx), entityCol))
    }(Encoders.tuple(Encoders.STRING, Encoders.BINARY)).toDF("id", "pbf")
  }

  /** FeedHeader: gtfs_realtime_version=1 ("2.0"), incrementality=2
    * (FULL_DATASET), timestamp=3 — realtime.py:730-737.
    */
  private[gtfs] def feedHeader(timestamp: Long): Array[Byte] = {
    val w = new ProtoWire.Writer
    w.string(1, "2.0")
    w.varint(2, Incrementality("FULL_DATASET"))
    w.varint(3, timestamp)
    w.result
  }

  /** Default cap for the in-RAM FeedMessage artifact: 256 MB of wire
    * bytes. A FeedMessage is inherently one in-memory response object
    * (the reference assembles the same message in RAM before serving
    * it), but an unbounded assemble is how a pathological
    * million-entity feed OOMs the driver — past the cap the assemble
    * fails with a clear error pointing at [[exportPbf]], which streams
    * and never materializes the whole feed.
    */
  final val DefaultMaxFeedBytes: Long = 256L << 20

  /** Complete FeedMessage wire bytes (header=1, entity=2 repeated),
    * entity order preserved from the input's sort. The pbf twin of
    * [[FeedAssembler.feedMessageJson]]; `timestamp` caller-supplied
    * for deterministic plans, as there. Entities are pulled one
    * partition at a time (`toLocalIterator`), so driver RAM holds the
    * assembled message plus at most one partition of entity bytes,
    * and the size guard trips BEFORE the allocation that would OOM.
    */
  def feedMessagePbf(entities: DataFrame, entityCol: String, timestamp: Long,
      maxBytes: Long = DefaultMaxFeedBytes): Array[Byte] = {
    import entities.sparkSession.implicits._
    val w = new ProtoWire.Writer
    w.message(1, feedHeader(timestamp))
    var total = 0L
    val it = entityPbf(entities, entityCol).select("pbf").as[Array[Byte]].toLocalIterator()
    while (it.hasNext) {
      val b = it.next()
      total += b.length
      if (total > maxBytes)
        throw new IllegalStateException(
          s"FeedMessage exceeds $maxBytes bytes of entity wire data; " +
            "a feed this size cannot be served as one in-RAM message — " +
            "use exportPbf (streams to a file) or raise maxBytes explicitly")
      w.message(2, b)
    }
    w.result
  }

  /** Serve-ready export: stream the FeedMessage bytes to a file
    * (what the reference returns as `application/octet-stream`).
    * Unbounded-size safe: the header frame then each entity frame is
    * appended to the file as it arrives from the cluster — at no
    * point does the driver hold more than one partition of entities.
    */
  def exportPbf(entities: DataFrame, entityCol: String, timestamp: Long, path: String): Unit = {
    import entities.sparkSession.implicits._
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      val hw = new ProtoWire.Writer
      hw.message(1, feedHeader(timestamp))
      out.write(hw.result)
      val it = entityPbf(entities, entityCol).select("pbf").as[Array[Byte]].toLocalIterator()
      while (it.hasNext) {
        val ew = new ProtoWire.Writer
        ew.message(2, it.next())
        out.write(ew.result)
      }
    } finally out.close()
  }
}
