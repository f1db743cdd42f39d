package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables
import graft.gtfs.{GtfsLake, ServiceCalendar}

/** Relational capability queries (SURVEY.md §2.A) mapped onto the
  * driver's TPC-H-ish testdata, each with a DuckDB oracle.
  *
  * Determinism rules (SURVEY.md §4): decimal casts for money sums,
  * unix_micros for timestamp outputs, total ORDER BY, identical
  * aliases in Spark and SQL.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Shared between q_sql_passthrough's Spark run and its oracle. */
  val PassthroughSql: String =
    "SELECT n_name, count(*) AS n_customers FROM customer " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "GROUP BY n_name ORDER BY n_name"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship aggregation (TPC-H Q1 shape): map-side partial agg on
    // a pushed-down scan; decimal sums are exact in both engines.
    "q1_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // Sums accumulate in DECIMAL (exact, order-insensitive) but are
          // emitted as DOUBLE: the driver's hasher renders Spark DECIMAL
          // and DuckDB HUGEINT/DECIMAL differently (r1 verdict), and the
          // exact decimal values convert to identical doubles on both sides.
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // A1: schema-aligned ingest — project/cast/null-fill to a target
    // schema; pure projection, pruned at the scan.
    "q_schema_align" -> { (s, dir) =>
      val target = StructType(Seq(
        StructField("s_suppkey", LongType),
        StructField("s_name", StringType),
        StructField("s_acctbal", DoubleType),
        StructField("s_phone", StringType)))
      GtfsLake.alignToSchema(t(s, dir, "supplier"), target).orderBy(col("s_suppkey"))
    },

    // A3: remove-by-LIKE-pattern (complement filter, pushed down).
    "q_remove_like" -> { (s, dir) =>
      GtfsLake.removeWhere(t(s, dir, "customer"), col("c_name"), "%1")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // A4: cascading orphan removal — root filter then two left_semi
    // levels (customer -> orders -> lineitem), counts of survivors.
    "q_cascade_orphans" -> { (s, dir) =>
      val keptCustomer = t(s, dir, "customer").filter(col("c_mktsegment") =!= "BUILDING")
      val keptOrders = GtfsLake.retainChildrenOf(t(s, dir, "orders"), "o_custkey", keptCustomer, "c_custkey")
      val keptLineitem = GtfsLake.retainChildrenOf(t(s, dir, "lineitem"), "l_orderkey", keptOrders, "o_orderkey")
      keptLineitem.agg(
        count(lit(1)).as("n_lineitem"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    },

    // A5: MERGE/upsert — delta rows update matching base rows, via one
    // full-outer join + per-column coalesce.
    "q_upsert_merge" -> { (s, dir) =>
      val base = t(s, dir, "customer")
      val delta = base
        .filter(col("c_custkey") % 10 === 0)
        .select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          (col("c_acctbal") + lit(100.0)).as("c_acctbal"),
          lit("UPDATED").as("c_mktsegment"))
      GtfsLake.upsert(base, delta, Seq("c_custkey")).orderBy(col("c_custkey"))
    },

    // A7: SQL passthrough over registered views.
    "q_sql_passthrough" -> { (s, dir) =>
      Tables.registerViews(s, dir)
      GtfsLake.sql(s, PassthroughSql)
    },

    // A8: service-day resolution set algebra (base ∪ added ∖ removed).
    "q_service_resolution" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val base = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("service_key"))
      val added = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("service_key"))
      val removed = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("service_key"))
      ServiceCalendar.resolve(base, added, removed).orderBy(col("service_key"))
    },

    // A9: operation-day trips shape — fact⋈fact join with first-stop
    // filter (l_linenumber = 1) and total order.
    "q_day_trips" -> { (s, dir) =>
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      val l = t(s, dir, "lineitem").filter(col("l_linenumber") === 1)
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(
          col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate")).as("order_date_us"),
          col("l_partkey"), col("l_quantity"),
          unix_micros(col("l_shipdate")).as("ship_date_us"))
        .orderBy(col("o_orderkey"))
    },

    // A10: monitor join — broadcast dims, left join to derived
    // "realtime" state, IS NOT NULL availability flag.
    "q_monitor_join" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      val openOrders = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .join(openOrders, c("c_custkey") === openOrders("o_custkey"), "left")
        .select(
          lit("SNAPSHOT").as("operation_day"),
          col("c_custkey"), col("c_name"),
          col("n_name").as("nation_name"),
          col("r_name").as("region_name"),
          col("o_custkey").isNotNull.as("realtime_available"),
          unix_micros(col("last_order")).as("realtime_last_update_us"))
        .orderBy(col("c_custkey"))
    },

    // A11: column-subset projection with pushed filter.
    "q_alert_projection" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_size") >= 40)
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
        .orderBy(col("p_partkey"))
    },

    // A12: latest-state upsert per key — the realtime queue drain
    // semantics as a single window dedup (one shuffle on the key).
    "q_latest_state" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },

    // A13: TTL expiry — live rows within the 2h review window of the
    // global max timestamp (scalar-aggregate cross join, no collect).
    "q_ttl_expiry" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val cutoff = e.agg((max(col("ts")) - expr("INTERVAL 2 HOURS")).as("cutoff"))
      e.crossJoin(cutoff).filter(col("ts") > col("cutoff"))
        .agg(count(lit(1)).as("n_live"))
    },

    // A15: composite candidate matching (route+start_time trip match
    // shape): sampled "realtime" rows matched to nominal candidates on
    // a composite bucket key, min candidate wins.
    "q_trip_match" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val rt = e.filter(col("event_id") % 97 === 0)
        .select(col("event_id"), col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      val nominal = e.select(
        col("event_id").as("cand_id"), col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      rt.join(nominal, Seq("event_type", "bucket"))
        .filter(col("cand_id") =!= col("event_id"))
        .groupBy(col("event_id"))
        .agg(min(col("cand_id")).as("matched_event"))
        .orderBy(col("event_id"))
    },

    // A16: ID mapping via a small dim — broadcast left join with
    // fall-back (the reference's map_id returns input when unmapped).
    "q_id_mapping" -> { (s, dir) =>
      val sup = t(s, dir, "supplier")
      val nat = broadcast(t(s, dir, "nation"))
      sup.join(nat, sup("s_nationkey") === nat("n_nationkey"), "left")
        .select(
          col("s_suppkey"), col("s_name"),
          coalesce(col("n_name"), lit("UNMAPPED")).as("nation_name"))
        .orderBy(col("s_suppkey"))
    },

    // A18: top-N — TakeOrderedAndProject, no global sort.
    "q_topn" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // A14: feed assembly — events mapped into GTFS-RT-shaped realtime
    // frames, nested into FeedMessage entities, then flattened back
    // into a canonical scalar projection (entity order, STU order,
    // descriptor fields) so the assembly is DuckDB-hash-comparable —
    // JSON text itself differs across engines by construction and
    // stays spec-covered (FeedAssemblerSpec).
    "q_feed_assembly" -> { (s, dir) =>
      val e = t(s, dir, "events").filter(col("user_id") < 20)
      val tripUpdates = e.groupBy(col("user_id"))
        .agg(max(col("ts")).as("last_ts"))
        .select(
          concat(lit("tu-"), col("user_id")).as("trip_update_id"),
          concat(lit("trip-"), col("user_id")).as("trip_id"),
          lit(null).cast("string").as("trip_route_id"),
          lit(null).cast("string").as("trip_direction_id"),
          lit("08:00:00").as("trip_start_time"),
          date_format(col("last_ts"), "yyyyMMdd").as("trip_start_date"),
          lit("SCHEDULED").as("trip_schedule_relationship"),
          lit(null).cast("string").as("vehicle_id"),
          lit(null).cast("string").as("vehicle_label"),
          lit(null).cast("string").as("vehicle_license_plate"),
          lit(null).cast("string").as("vehicle_wheelchair_accessible"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val stus = e
        .withColumn("seq", row_number().over(w))
        .select(
          concat(lit("tu-"), col("user_id")).as("trip_update_id"),
          col("seq").as("stop_sequence"),
          col("event_type").as("stop_id"),
          unix_micros(col("ts")).as("arrival_time"),
          // floor before the int cast: DuckDB CAST(double AS INT)
          // rounds while Spark truncates (SURVEY §4)
          floor(col("value")).cast("int").as("arrival_delay"),
          lit(null).cast("int").as("arrival_uncertainty"),
          lit(null).cast("bigint").as("departure_time"),
          lit(null).cast("int").as("departure_delay"),
          lit(null).cast("int").as("departure_uncertainty"),
          lit("SCHEDULED").as("schedule_relationship"))
      val entities = graft.gtfs.FeedAssembler.tripUpdateEntities(tripUpdates, stus)
      // canonical flatten of the ASSEMBLED nested entities: feed
      // entity position (the reference's start_date/start_time sort,
      // realtime.py #17), then one row per stop_time_update in its
      // sorted array position
      val wq = Window.orderBy(
        col("trip_update.trip.start_date"), col("trip_update.trip.start_time"), col("id"))
      entities
        .withColumn("entity_pos", row_number().over(wq).cast("bigint"))
        .select(col("entity_pos"), col("id").as("entity_id"),
          col("trip_update.trip.trip_id").as("trip_id"),
          col("trip_update.trip.start_date").as("start_date"),
          posexplode(col("trip_update.stop_time_update")).as(Seq("stu_idx", "stu")))
        .select(col("entity_pos"), col("entity_id"), col("trip_id"), col("start_date"),
          (col("stu_idx") + 1).cast("int").as("stu_pos"),
          col("stu.stop_sequence").as("stop_sequence"),
          col("stu.stop_id").as("stop_id"),
          col("stu.arrival.time").as("arrival_time"),
          col("stu.arrival.delay").as("arrival_delay"),
          col("stu.schedule_relationship").as("schedule_relationship"))
        .orderBy(col("entity_pos"), col("stu_pos"))
    },

    // A20: backward as-of join — for each purchase, the latest prior
    // click of the same user (union + running-window composition,
    // one shuffle; oracled against DuckDB's native ASOF LEFT JOIN).
    "q_asof_join" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      graft.ops.AsOfJoin.asofBackward(purchases, clicks,
          on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightPayload = Seq("ts"), tieBreak = "click_id")
        .select(col("event_id"),
          unix_micros(col("asof_match.ts")).as("prior_click_us"))
        .orderBy(col("event_id"))
    },

    // A21: sessionization — 30-minute inactivity gap starts a new
    // session; lag/new-session-flag/running-sum windows + aggregate.
    "q_sessionize" -> { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("u"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("u"))
        .withColumn("new_sess",
          when(col("u") - lag(col("u"), 1).over(byUser) > 1800000000L ||
            lag(col("u"), 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("sess", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("sess").as("session_seq"))
        .agg(min(col("u")).as("session_start_us"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_seq"))
    },

    // A22: rollup aggregation (subtotal + grand total lattice).
    "q_rollup" -> { (s, dir) =>
      t(s, dir, "events")
        .rollup(col("event_type"))
        .agg(grouping(col("event_type")).cast("int").as("is_total"),
          count(lit(1)).as("n"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type"),
          col("is_total"), col("n"), col("min_value"), col("max_value"))
        .orderBy(col("is_total"), col("event_type"))
    },

    // A23: top-N per group (ranked window + filter).
    "q_top_per_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // A28: pivot — event-type counts as columns per user.
    "q_pivot" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    },

    // A29: histogram binning (fixed-width buckets over a measure).
    "q_histogram" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(floor(col("value") / 5.0).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },

    // B2 (batch analog): tumbling-window aggregation by hour with
    // order-insensitive aggregates.
    "q_window_agg" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(
          unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy(col("hour_us"), col("event_type"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_schema_align" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, s_acctbal,
        | CAST(NULL AS VARCHAR) AS s_phone
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "q_remove_like" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_name NOT LIKE '%1' ORDER BY c_custkey""".stripMargin,

    "q_cascade_orphans" ->
      """WITH kept_customer AS (SELECT c_custkey FROM customer WHERE c_mktsegment <> 'BUILDING'),
        |kept_orders AS (SELECT o.o_orderkey FROM orders o
        |  WHERE EXISTS (SELECT 1 FROM kept_customer c WHERE c.c_custkey = o.o_custkey)),
        |kept_lineitem AS (SELECT l.l_orderkey FROM lineitem l
        |  WHERE EXISTS (SELECT 1 FROM kept_orders o WHERE o.o_orderkey = l.l_orderkey))
        |SELECT count(*) AS n_lineitem, count(DISTINCT l_orderkey) AS n_orders FROM kept_lineitem""".stripMargin,

    "q_upsert_merge" ->
      """WITH delta AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
        |         'UPDATED' AS c_mktsegment
        |  FROM customer WHERE c_custkey % 10 = 0)
        |SELECT coalesce(d.c_custkey, b.c_custkey) AS c_custkey,
        |       coalesce(d.c_name, b.c_name) AS c_name,
        |       coalesce(d.c_nationkey, b.c_nationkey) AS c_nationkey,
        |       coalesce(d.c_acctbal, b.c_acctbal) AS c_acctbal,
        |       coalesce(d.c_mktsegment, b.c_mktsegment) AS c_mktsegment
        |FROM customer b FULL OUTER JOIN delta d ON b.c_custkey = d.c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_sql_passthrough" -> PassthroughSql,

    "q_service_resolution" ->
      """SELECT o_custkey AS service_key FROM orders WHERE o_orderstatus = 'O'
        |UNION
        |SELECT o_custkey AS service_key FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT o_custkey AS service_key FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY service_key""".stripMargin,

    "q_day_trips" ->
      """SELECT o.o_orderkey, o.o_custkey, epoch_us(o.o_orderdate) AS order_date_us,
        |       l.l_partkey, l.l_quantity, epoch_us(l.l_shipdate) AS ship_date_us
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderstatus = 'O' AND l.l_linenumber = 1
        |ORDER BY o.o_orderkey""".stripMargin,

    "q_monitor_join" ->
      """WITH open_orders AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order FROM orders
        |  WHERE o_orderstatus = 'O' GROUP BY o_custkey)
        |SELECT 'SNAPSHOT' AS operation_day, c.c_custkey, c.c_name,
        |       n.n_name AS nation_name, r.r_name AS region_name,
        |       oo.o_custkey IS NOT NULL AS realtime_available,
        |       epoch_us(oo.last_order) AS realtime_last_update_us
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |LEFT JOIN open_orders oo ON oo.o_custkey = c.c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_alert_projection" ->
      """SELECT p_partkey, p_brand, p_type, p_size FROM part
        |WHERE p_size >= 40 ORDER BY p_partkey""".stripMargin,

    "q_latest_state" ->
      """SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, value
        |FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events e) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_ttl_expiry" ->
      """SELECT count(*) AS n_live FROM events
        |WHERE ts > (SELECT max(ts) - INTERVAL 2 HOUR FROM events)""".stripMargin,

    "q_trip_match" ->
      """SELECT e.event_id, min(c.event_id) AS matched_event
        |FROM events e JOIN events c
        |  ON c.event_type = e.event_type
        | AND date_trunc('hour', c.ts) = date_trunc('hour', e.ts)
        | AND c.event_id <> e.event_id
        |WHERE e.event_id % 97 = 0
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,

    "q_id_mapping" ->
      """SELECT s_suppkey, s_name, coalesce(n_name, 'UNMAPPED') AS nation_name
        |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,

    "q_topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_feed_assembly" ->
      """WITH fa_e AS (SELECT * FROM events WHERE user_id < 20),
        |fa_tu AS (
        |  SELECT 'tu-' || CAST(user_id AS VARCHAR) AS entity_id,
        |         'trip-' || CAST(user_id AS VARCHAR) AS trip_id,
        |         strftime(CAST(max(ts) AS TIMESTAMP), '%Y%m%d') AS start_date
        |  FROM fa_e GROUP BY user_id),
        |fa_stu AS (
        |  SELECT 'tu-' || CAST(user_id AS VARCHAR) AS entity_id,
        |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS stop_sequence,
        |         event_type AS stop_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS arrival_time,
        |         CAST(floor(value) AS INT) AS arrival_delay,
        |         'SCHEDULED' AS schedule_relationship
        |  FROM fa_e),
        |fa_ent AS (
        |  SELECT entity_id, trip_id, start_date,
        |    CAST(row_number() OVER (ORDER BY start_date, entity_id) AS BIGINT) AS entity_pos
        |  FROM fa_tu)
        |SELECT e.entity_pos, s.entity_id, e.trip_id, e.start_date,
        |  CAST(row_number() OVER (PARTITION BY s.entity_id ORDER BY s.stop_sequence) AS INT) AS stu_pos,
        |  s.stop_sequence, s.stop_id, s.arrival_time, s.arrival_delay, s.schedule_relationship
        |FROM fa_ent e JOIN fa_stu s USING (entity_id)
        |ORDER BY entity_pos, stu_pos""".stripMargin,

    "q_asof_join" ->
      """SELECT p.event_id, epoch_us(CAST(c.ts AS TIMESTAMP)) AS prior_click_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS u FROM events),
        |m AS (SELECT user_id, event_id, u,
        |        CASE WHEN u - lag(u) OVER w > 1800000000 OR lag(u) OVER w IS NULL
        |             THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY u, event_id)),
        |s AS (SELECT user_id, u,
        |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY u, event_id
        |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |      FROM m)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       min(u) AS session_start_us, count(*) AS n_events
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |       CAST(grouping(event_type) AS INT) AS is_total,
        |       count(*) AS n, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY ROLLUP(event_type)
        |ORDER BY is_total, event_type""".stripMargin,

    "q_top_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type = 'click') AS click,
        | count(*) FILTER (WHERE event_type = 'view') AS view,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | count(*) FILTER (WHERE event_type = 'signup') AS signup,
        | count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(value / 5.0) AS BIGINT) AS bucket, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_window_agg" ->
      """SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS hour_us, event_type,
        |       count(*) AS n, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
