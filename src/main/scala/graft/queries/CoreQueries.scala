package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 operator inventory, expressed over the driver testdata
  * (FIXTURES.md §B) so each query has an exact DuckDB oracle.
  *
  * Determinism discipline (the driver hash-compares values):
  *  - float aggregations go through integer cents
  *    (`CAST(round(v*100) AS BIGINT)`) so partial-aggregation order cannot
  *    perturb low bits; derived doubles come from identical scalar math on
  *    those exact integers.
  *  - every query ends in an ORDER BY over a unique key set, mirrored in
  *    the oracle SQL.
  *  - aggregate/computed columns are aliased identically on both sides.
  */
object CoreQueries {

  type QFn = (SparkSession, String) => DataFrame

  // -- S: scans / sources -------------------------------------------------

  /** S1 — catalog scan: projection + pushed filter.
    * Reference: variable-source catalog load `ap_proto.py:279-281`. */
  val s1CatalogScan: QFn = (s, d) => {
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      .where(col("l_quantity") > 25)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
  val s1Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM lineitem WHERE l_quantity > 25
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** S2 — spatial-region scan: pixel-range predicates over an indexed
    * table (envelope → ranges [low, high)).
    * Reference: `getDiaObjects(region)` `_executors.py:178-189`,
    * README.md:118-127. pixelId synthesized as a hash bucket of the key. */
  val s2RegionScan: QFn = (s, d) => {
    val li = Tables.lineitem(s, d).withColumn("pixel_id", pmod(col("l_orderkey") * 2654435761L, lit(4096L)))
    li.where(
        (col("pixel_id") >= 100 && col("pixel_id") < 200) ||
        (col("pixel_id") >= 1000 && col("pixel_id") < 1100) ||
        (col("pixel_id") >= 2000 && col("pixel_id") < 2050))
      .select(col("l_orderkey"), col("l_linenumber"), col("pixel_id"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
  val s2Sql =
    """SELECT l_orderkey, l_linenumber, (l_orderkey * 2654435761) % 4096 AS pixel_id
      |FROM lineitem
      |WHERE ((l_orderkey * 2654435761) % 4096 >= 100 AND (l_orderkey * 2654435761) % 4096 < 200)
      |   OR ((l_orderkey * 2654435761) % 4096 >= 1000 AND (l_orderkey * 2654435761) % 4096 < 1100)
      |   OR ((l_orderkey * 2654435761) % 4096 >= 2000 AND (l_orderkey * 2654435761) % 4096 < 2050)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** S3 — history read: fact rows for an ID set after a time cutoff.
    * Reference: `getDiaSources(region, ids, t)` `_executors.py:205-211`,
    * README.md:130-140. Semi-join (scales to large ID sets) + pushdown. */
  val s3SourceHistory: QFn = (s, d) => {
    val ids = Tables.customer(s, d).where(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("user_id"))
    Tables.events(s, d)
      .where(col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp"))
      .join(ids, Seq("user_id"), "left_semi")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .orderBy(col("event_id"))
  }
  val s3Sql =
    """SELECT event_id, user_id, ts, event_type FROM events
      |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
      |  AND user_id IN (SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0)
      |ORDER BY event_id""".stripMargin

  /** S4 — forced-source history: shorter window + type filter.
    * Reference: `_executors.py:213-215`, README.md:143-155. */
  val s4FsourceHistory: QFn = (s, d) => {
    val ids = Tables.customer(s, d).where(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("user_id"))
    Tables.events(s, d)
      .where(col("ts") >= lit("2024-01-02 12:00:00").cast("timestamp") &&
        col("event_type") === "purchase")
      .join(ids, Seq("user_id"), "left_semi")
      .select(col("event_id"), col("user_id"), col("ts"))
      .orderBy(col("event_id"))
  }
  val s4Sql =
    """SELECT event_id, user_id, ts FROM events
      |WHERE ts >= TIMESTAMP '2024-01-02 12:00:00' AND event_type = 'purchase'
      |  AND user_id IN (SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0)
      |ORDER BY event_id""".stripMargin

  // -- F: filters ---------------------------------------------------------

  /** F2 — Bernoulli sampling (`detection_fraction`, `DIA.py:78-80`), made
    * deterministic for the oracle via key-hash modulus (the engine's real
    * sampler is `df.sample(p, seed)`; see VisitPipeline). */
  val f2Sample: QFn = (s, d) => {
    Tables.orders(s, d)
      .where(pmod(col("o_orderkey") * 1103515245L + 12345L, lit(100L)) < 10)
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy(col("o_orderkey"))
  }
  val f2Sql =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE (o_orderkey * 1103515245 + 12345) % 100 < 10
      |ORDER BY o_orderkey""".stripMargin

  /** F6 — forced-photometry eligibility: `nDiaSources > 1 AND
    * lastNonForcedSource > cutoff` (`_executors.py:353-357`). Expressed as
    * per-customer order recency/count. */
  val f6ForcedEligibility: QFn = (s, d) => {
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), max(col("o_orderdate")).as("last_order"))
      .where(col("n_orders") > 1 &&
        col("last_order") > lit("1997-06-01 00:00:00").cast("timestamp"))
      .orderBy(col("o_custkey"))
  }
  val f6Sql =
    """SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_orderdate) AS last_order
      |FROM orders GROUP BY o_custkey
      |HAVING COUNT(*) > 1 AND MAX(o_orderdate) > TIMESTAMP '1997-06-01 00:00:00'
      |ORDER BY o_custkey""".stripMargin

  /** F7 — forced-source projection: column subset + batch literals
    * (`_executors.py:362-371`). */
  val f7ForcedProjection: QFn = (s, d) => {
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        lit(42).as("visit"), lit(7).as("detector"),
        lit(60000.5).as("midpoint_mjd"))
      .orderBy(col("o_orderkey"))
  }
  val f7Sql =
    """SELECT o_orderkey, o_custkey, CAST(42 AS INTEGER) AS visit,
      |  CAST(7 AS INTEGER) AS detector, CAST(60000.5 AS DOUBLE) AS midpoint_mjd
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** F8 — day/night predicate: visits only outside 06:00–20:00
    * (`ap_proto.py:66-81`). */
  val f8NightFilter: QFn = (s, d) => {
    Tables.events(s, d)
      .where(hour(col("ts")) < 6 || hour(col("ts")) >= 20)
      .select(col("event_id"), col("ts"), col("user_id"))
      .orderBy(col("event_id"))
  }
  val f8Sql =
    """SELECT event_id, ts, user_id FROM events
      |WHERE hour(ts) < 6 OR hour(ts) >= 20
      |ORDER BY event_id""".stripMargin

  /** F9 — duty-cycle gate: `visit % period < period*fraction`
    * (`_executors.py:162-164`, `config.py:79-86`). */
  val f9DutyCycle: QFn = (s, d) => {
    Tables.events(s, d)
      .where(pmod(col("event_id"), lit(1000L)) < 300)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }
  val f9Sql =
    """SELECT event_id, user_id, event_type FROM events
      |WHERE event_id % 1000 < 300 ORDER BY event_id""".stripMargin

  // -- J: joins -----------------------------------------------------------

  /** J1 — source-to-object match: detections ⟕ known objects on id;
    * matched rows get prior+1, unmatched get 1 (`_executors.py:315-323`).
    * Broadcast hash join replaces the reference's dict probe. */
  val j1S2oMatch: QFn = (s, d) => {
    val objects = Tables.orders(s, d)
      .where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("l_orderkey"),
        (col("o_orderkey") % 5).cast("long").as("prior_n"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"))
      .join(broadcast(objects), Seq("l_orderkey"), "left_outer")
      .withColumn("n_dia_sources", coalesce(col("prior_n"), lit(0L)) + 1L)
      .select(col("l_orderkey"), col("l_linenumber"), col("n_dia_sources"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
  val j1Sql =
    """SELECT l.l_orderkey, l.l_linenumber,
      |  COALESCE(o.prior_n, 0) + 1 AS n_dia_sources
      |FROM lineitem l LEFT JOIN
      |  (SELECT o_orderkey, o_orderkey % 5 AS prior_n
      |   FROM orders WHERE o_orderkey % 3 = 0) o
      |ON l.l_orderkey = o.o_orderkey
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin

  /** J2 — history semi-join by ID collection (`_executors.py:207-213`). */
  val j2HistorySemijoin: QFn = (s, d) => {
    val ids = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("user_id"))
    Tables.events(s, d)
      .join(ids, Seq("user_id"), "left_semi")
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))
  }
  val j2Sql =
    """SELECT event_id, user_id, value FROM events
      |WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |ORDER BY event_id""".stripMargin

  /** J5 — forced-photometry anti-join: objects NOT among new detections
    * (`_executors.py:338-341`). Customers with orders but none recent. */
  val j5ForcedAntijoin: QFn = (s, d) => {
    val recent = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1998-06-01 00:00:00").cast("timestamp"))
      .select(col("o_custkey"))
    Tables.orders(s, d).select(col("o_custkey")).distinct()
      .join(recent, Seq("o_custkey"), "left_anti")
      .orderBy(col("o_custkey"))
  }
  val j5Sql =
    """SELECT DISTINCT o_custkey FROM orders
      |WHERE o_custkey NOT IN (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00')
      |ORDER BY o_custkey""".stripMargin

  // -- A: aggregations ----------------------------------------------------

  /** A1 — per-object source count bootstrap: groupBy(id).count()
    * (`_executors.py:315-323`). */
  val a1Ndiasources: QFn = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_dia_sources"))
      .orderBy(col("l_orderkey"))
  }
  val a1Sql =
    """SELECT l_orderkey, COUNT(*) AS n_dia_sources
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** A2 — transient-vs-known classification count: `sum(id >= 1e9)`
    * (`_executors.py:327-328`). */
  val a2TransientCount: QFn = (s, d) => {
    Tables.lineitem(s, d).agg(
      sum(when(col("l_orderkey") >= 30000L, 1L).otherwise(0L)).as("n_transient"),
      count(lit(1)).as("n_total"))
  }
  val a2Sql =
    """SELECT CAST(SUM(CASE WHEN l_orderkey >= 30000 THEN 1 ELSE 0 END) AS BIGINT) AS n_transient,
      |  COUNT(*) AS n_total FROM lineitem""".stripMargin

  /** A3 — per-visit row counters (read/store counts, `metrics.md:15-19`):
    * counts per stream partition. */
  val a3VisitCounts: QFn = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }
  val a3Sql =
    """SELECT event_type, COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** A4 — `_Stat` mean accumulator (`log2csv.py:62-91`): cnt/sum/avg with
    * NULL-on-empty. Exact via integer cents; avg derived by identical
    * scalar math on both sides. */
  val a4StatAvg: QFn = (s, d) => {
    Tables.events(s, d)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("cents")).as("sum_cents"))
      .withColumn("avg_value", col("sum_cents") / (col("cnt") * 100.0))
      .orderBy(col("event_type"))
  }
  val a4Sql =
    """SELECT event_type, cnt, sum_cents, sum_cents / (cnt * 100.0) AS avg_value
      |FROM (
      |  SELECT event_type, COUNT(*) AS cnt,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |  FROM events GROUP BY event_type)
      |ORDER BY event_type""".stripMargin

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** A5 — group-by visit, multi-metric pivot (`log2csv.py:94-153`): one
    * row per user with one avg column per event type. Conditional
    * aggregation (map-side combine) rather than a second shuffle. */
  val a5VisitPivot: QFn = (s, d) => {
    val ev = Tables.events(s, d)
      .withColumn("cents", round(col("value") * 100).cast("long"))
    val aggs = eventTypes.flatMap { t =>
      Seq(sum(when(col("event_type") === t, col("cents"))).as(s"${t}_cents"),
        count(when(col("event_type") === t, lit(1))).as(s"${t}_n"))
    }
    ev.groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("user_id") +: eventTypes.map { t =>
        (col(s"${t}_cents") / (col(s"${t}_n") * 100.0)).as(s"avg_$t")
      }: _*)
      .orderBy(col("user_id"))
  }
  val a5Sql = {
    val cols = eventTypes.map { t =>
      s"SUM(CASE WHEN event_type = '$t' THEN CAST(round(value*100) AS BIGINT) END) " +
        s"/ (COUNT(CASE WHEN event_type = '$t' THEN 1 END) * 100.0) AS avg_$t"
    }.mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** A6 — derived aggregate column: NULL-aware sum of selected averages
    * (`log2csv.py:191-203`). */
  val a6DerivedSum: QFn = (s, d) => {
    val piv = a5VisitPivot(s, d)
    piv.select(col("user_id"),
        (coalesce(col("avg_click"), lit(0.0)) +
          coalesce(col("avg_view"), lit(0.0)) +
          coalesce(col("avg_purchase"), lit(0.0))).as("sum_select_real"))
      .orderBy(col("user_id"))
  }
  val a6Sql =
    s"""SELECT user_id,
       |  COALESCE(avg_click, 0.0) + COALESCE(avg_view, 0.0) + COALESCE(avg_purchase, 0.0)
       |    AS sum_select_real
       |FROM (${a5Sql.replace("ORDER BY user_id", "")}) ORDER BY user_id""".stripMargin

  /** A7 — running max for ID high-water mark (`ap_proto.py:286-287`). */
  val a7MaxId: QFn = (s, d) => {
    Tables.orders(s, d).agg(max(col("o_orderkey")).as("last_object_id"),
      count(lit(1)).as("n_rows"))
  }
  val a7Sql =
    "SELECT MAX(o_orderkey) AS last_object_id, COUNT(*) AS n_rows FROM orders"

  /** A10 — per-(timer, kind) rollup for influx emission
    * (`log2influx.py:92-95,187-294`): two-key grouped counters. */
  val a10TimerRollup: QFn = (s, d) => {
    Tables.events(s, d)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("event_type"), (col("user_id") % 10).as("shard"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .orderBy(col("event_type"), col("shard"))
  }
  val a10Sql =
    """SELECT event_type, user_id % 10 AS shard, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  MIN(CAST(round(value*100) AS BIGINT)) AS min_cents,
      |  MAX(CAST(round(value*100) AS BIGINT)) AS max_cents
      |FROM events GROUP BY event_type, user_id % 10
      |ORDER BY event_type, shard""".stripMargin

  // -- W: windows ---------------------------------------------------------

  /** W1 — latest-version-per-key (DiaObjectLast semantics,
    * README.md:118-120): row_number over versions desc. */
  val w1LatestVersion: QFn = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("o_custkey"))
  }
  val w1Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** W2 — deterministic per-partition ID sequence:
    * `(visit*n_det + det)*1e6 + rownum` (`_executors.py:426-428`). */
  val w2IdSequence: QFn = (s, d) => {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    Tables.lineitem(s, d)
      .withColumn("src_id", col("l_orderkey") * 1000000L + row_number().over(w))
      .select(col("l_orderkey"), col("l_linenumber"), col("src_id"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
  val w2Sql =
    """SELECT l_orderkey, l_linenumber,
      |  l_orderkey * 1000000 + row_number() OVER (
      |    PARTITION BY l_orderkey ORDER BY l_linenumber) AS src_id
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** W3 — SCD-2 validity truncation: `validityEnd = lead(validityStart)`
    * (`metrics.md:57`). */
  val w3ValidityIntervals: QFn = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").as("validity_start"),
        lead(col("o_orderdate"), 1).over(w).as("validity_end"))
      .orderBy(col("o_custkey"), col("validity_start"), col("o_orderkey"))
  }
  val w3Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate AS validity_start,
      |  lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS validity_end
      |FROM orders ORDER BY o_custkey, validity_start, o_orderkey""".stripMargin

  /** W4 — bounded out-of-order sort: log lines re-ordered by timestamp
    * (`log2influx.py:98-116`); batch form = global orderBy. */
  val w4OooSort: QFn = (s, d) => {
    Tables.events(s, d)
      .select(col("ts"), col("event_id"), col("user_id"))
      .orderBy(col("ts"), col("event_id"))
  }
  val w4Sql =
    "SELECT ts, event_id, user_id FROM events ORDER BY ts, event_id"

  /** W5 — as-of lookup via the generic [[graft.operators.AsOfJoin]]
    * operator (the reference's "version current at visit time" shape,
    * README.md:157-166, generalized): for each customer × probe date,
    * the latest order at or before the probe. Versions are pre-deduped
    * to one per (customer, date) — max orderkey wins — so the match is
    * deterministic; oracle is DuckDB's native ASOF LEFT JOIN. */
  val w5AsofLookup: QFn = (s, d) => {
    import s.implicits._
    val versions = Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("version_key"))
    val probes = Tables.customer(s, d)
      .where(col("c_custkey") < 300)
      .select(col("c_custkey").as("o_custkey"))
      .crossJoin(Seq("1993-06-01 00:00:00", "1996-01-01 00:00:00", "1998-06-01 00:00:00")
        .toDF("probe_s")
        .select(col("probe_s").cast("timestamp").as("probe")))
    graft.operators.AsOfJoin.leftAsOf(probes, versions,
      key = "o_custkey", leftTime = "probe", rightTime = "o_orderdate")
      .orderBy(col("o_custkey"), col("probe"))
  }
  val w5Sql =
    """WITH v AS (
      |  SELECT o_custkey, o_orderdate, CAST(max(o_orderkey) AS BIGINT) AS version_key
      |  FROM orders GROUP BY 1, 2),
      |probes AS (
      |  SELECT c_custkey AS o_custkey, CAST(p AS TIMESTAMP) AS probe
      |  FROM customer, (VALUES ('1993-06-01 00:00:00'), ('1996-01-01 00:00:00'),
      |                         ('1998-06-01 00:00:00')) t(p)
      |  WHERE c_custkey < 300)
      |SELECT p.o_custkey, p.probe,
      |  v.o_orderdate AS matched_o_orderdate, v.version_key
      |FROM probes p ASOF LEFT JOIN v
      |  ON p.o_custkey = v.o_custkey AND p.probe >= v.o_orderdate
      |ORDER BY p.o_custkey, p.probe""".stripMargin

  /** W7 (registry key w7_asof_forward) — the FORWARD as-of lookup:
    * for each probe instant, the next version at or after it (the
    * scheduling dual of w5's "current at T"; DuckDB oracles it natively
    * with `ASOF LEFT JOIN … ON probe <= o_orderdate`). Same
    * single-shuffle union+window operator, descending scan. */
  val w7AsofForward: QFn = (s, d) => {
    import s.implicits._
    val versions = Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("version_key"))
    val probes = Tables.customer(s, d)
      .where(col("c_custkey") < 300)
      .select(col("c_custkey").as("o_custkey"))
      .crossJoin(Seq("1993-06-01 00:00:00", "1996-01-01 00:00:00", "1998-06-01 00:00:00")
        .toDF("probe_s")
        .select(col("probe_s").cast("timestamp").as("probe")))
    graft.operators.AsOfJoin.leftAsOf(probes, versions,
      key = "o_custkey", leftTime = "probe", rightTime = "o_orderdate",
      direction = "forward")
      .orderBy(col("o_custkey"), col("probe"))
  }
  val w7Sql =
    """WITH v AS (
      |  SELECT o_custkey, o_orderdate, CAST(max(o_orderkey) AS BIGINT) AS version_key
      |  FROM orders GROUP BY 1, 2),
      |probes AS (
      |  SELECT c_custkey AS o_custkey, CAST(p AS TIMESTAMP) AS probe
      |  FROM customer, (VALUES ('1993-06-01 00:00:00'), ('1996-01-01 00:00:00'),
      |                         ('1998-06-01 00:00:00')) t(p)
      |  WHERE c_custkey < 300)
      |SELECT p.o_custkey, p.probe,
      |  v.o_orderdate AS matched_o_orderdate, v.version_key
      |FROM probes p ASOF LEFT JOIN v
      |  ON p.o_custkey = v.o_custkey AND p.probe <= v.o_orderdate
      |ORDER BY p.o_custkey, p.probe""".stripMargin

  /** X19 — gap-based sessionization (the classic event-analytics /
    * training-data operator Spark expresses as lag + running sum): a new
    * session starts when a user's inter-event gap exceeds 12 h; emit
    * per-session row counts and integer-exact microsecond durations.
    * One shuffle by user; ties broken by event_id on both engines. */
  val SessionGapMicros: Long = 12L * 3600 * 1000000
  val x19Sessionize: QFn = (s, d) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val events = Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > SessionGapMicros, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    events.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("start_us"), col("end_us"), col("duration_us"))
      .orderBy(col("user_id"), col("session_seq"))
  }
  val x19Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS prev_us
       |  FROM events),
       |marked AS (
       |  SELECT user_id, event_id, us,
       |    CASE WHEN prev_us IS NULL OR us - prev_us > $SessionGapMicros
       |      THEN 1 ELSE 0 END AS new_session
       |  FROM e),
       |sessions AS (
       |  SELECT user_id, us,
       |    SUM(new_session) OVER (PARTITION BY user_id
       |      ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM marked)
       |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       |  COUNT(*) AS n_events,
       |  CAST(MIN(us) AS BIGINT) AS start_us, CAST(MAX(us) AS BIGINT) AS end_us,
       |  CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
       |FROM sessions GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq""".stripMargin

  // -- x36: z-order layout scan ------------------------------------------

  /** x36 box bounds: users [100, 300] × ts [Jan 8, Jan 12) 2024. */
  val ZUserLo = 100L
  val ZUserHi = 300L
  private[queries] val ZTsLo = java.time.LocalDateTime.of(2024, 1, 8, 0, 0)
    .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
  private[queries] val ZTsHi = java.time.LocalDateTime.of(2024, 1, 12, 0, 0)
    .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L

  /** x36 — multi-dimensional layout scan: the (user × time-window) box
    * query rewritten as Z-ORDER curve ranges. `z_interleave(user_id,
    * minute)` ([[graft.plans.ZInterleaveExpr]], codegen'd) linearizes
    * the two dimensions; [[graft.plans.ZCurve.boxRanges]] decomposes the
    * box into ≤ 64 z ranges by quad-tree descent (the same
    * prune-then-refine contract as the spatial region reads); the exact
    * box predicate refines coarsened false positives away, so the
    * result is identical to the plain predicate the oracle runs. On a
    * z-SORTED table the same ranges hit parquet row-group min/max stats
    * and the scan skips everything outside the box's curve segments —
    * the standard clustering layout for "user AND time" scans over
    * 100 TB fact tables (ZOrderSpec demonstrates the file-level
    * pruning). */
  val x36ZorderScan: QFn = (s, d) => {
    import graft.plans.{SpatialFunctions, ZCurve}
    val tLoMin = ZTsLo / 60000000L
    val tHiMin = ZTsHi / 60000000L // boundary minute stays in the prune box
    // 16 coarsened ranges: a few false-positive curve segments (refined
    // away below) in exchange for a compact pushable predicate — a long
    // OR chain costs codegen time and pushdown clarity
    val ranges = ZCurve.boxRanges(ZUserLo, ZUserHi, tLoMin, tHiMin,
      maxRanges = 16)
    val ev = Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("z", SpatialFunctions.z_interleave(
        col("user_id"), expr("us div 60000000")))
    val zPrune = ranges.map { case (lo, hi) =>
      col("z") >= lo && col("z") < hi
    }.reduce(_ || _)
    ev.where(zPrune) // curve-range prune (pushable on a z-sorted layout)
      .where(col("user_id").between(ZUserLo, ZUserHi) &&
        col("us") >= ZTsLo && col("us") < ZTsHi) // exact refine
      .select(col("event_id"), col("user_id"), col("us"))
      .orderBy(col("event_id"))
  }
  val x36Sql =
    s"""SELECT event_id, user_id, epoch_us(ts) AS us FROM events
       |WHERE user_id BETWEEN $ZUserLo AND $ZUserHi
       |  AND epoch_us(ts) >= $ZTsLo AND epoch_us(ts) < $ZTsHi
       |ORDER BY event_id""".stripMargin

  // -- U: set ops ---------------------------------------------------------

  /** U1 — union of detection streams (`DIA.py:85-87`). */
  val u1UnionSources: QFn = (s, d) => {
    val c = Tables.customer(s, d)
    val vars = c.where(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), lit("variable").as("kind"))
    val trans = c.where(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), lit("transient").as("kind"))
    vars.unionByName(trans).orderBy(col("c_custkey"))
  }
  val u1Sql =
    """SELECT c_custkey, 'variable' AS kind FROM customer WHERE c_custkey % 2 = 0
      |UNION ALL
      |SELECT c_custkey, 'transient' AS kind FROM customer WHERE c_custkey % 2 = 1
      |ORDER BY c_custkey""".stripMargin

  // -- C: scalar functions ------------------------------------------------

  /** C7 — time math: MJD from epoch (exact integer micros), +45 s visit
    * cadence (`ap_proto.py:71-80`, `config.py:108-123`). */
  val c7TimeMath: QFn = (s, d) => {
    Tables.events(s, d)
      .select(col("event_id"),
        (unix_micros(col("ts")) / 86400000000.0 + 40587.0).as("mjd"),
        (col("ts") + expr("INTERVAL 45 SECONDS")).as("next_visit_ts"))
      .orderBy(col("event_id"))
  }
  val c7Sql =
    """SELECT event_id, epoch_us(ts) / 86400000000.0 + 40587.0 AS mjd,
      |  ts + INTERVAL 45 SECOND AS next_visit_ts
      |FROM events ORDER BY event_id""".stripMargin

  /** C8 — comma-millisecond log timestamp round trip
    * (`log2influx.py:119-127`): format `2020-02-10 18:40:00,148`,
    * re-parsed via comma→dot normalization. */
  val c8TsParse: QFn = (s, d) => {
    Tables.events(s, d)
      .withColumn("ts_log", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss,SSS"))
      .select(col("event_id"), col("ts_log"),
        to_timestamp(regexp_replace(col("ts_log"), ",", "."),
          "yyyy-MM-dd HH:mm:ss.SSS").as("ts_parsed"))
      .orderBy(col("event_id"))
  }
  val c8Sql =
    """SELECT event_id, ts_log,
      |  strptime(replace(ts_log, ',', '.'), '%Y-%m-%d %H:%M:%S.%g') AS ts_parsed
      |FROM (SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S,%g') AS ts_log
      |      FROM events)
      |ORDER BY event_id""".stripMargin

  /** C9 — regex extraction from semi-structured text
    * (`log2influx.py:130-139`). */
  val c9RegexExtract: QFn = (s, d) => {
    Tables.events(s, d)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int").as("k_value"))
      .orderBy(col("event_id"))
  }
  val c9Sql =
    """SELECT event_id,
      |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k_value
      |FROM events ORDER BY event_id""".stripMargin

  /** C10 — JSON decode of metric records (`log2csv.py:322-328`). */
  val c10JsonParse: QFn = (s, d) => {
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_value"))
      .orderBy(col("event_id"))
  }
  val c10Sql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
      |FROM events ORDER BY event_id""".stripMargin

  /** C11 — positional word extraction from log lines
    * (`log2influx.py:165-294`). */
  val c11WordExtract: QFn = (s, d) => {
    // guard: <3-word docs yield NULL word3 on BOTH sides (Spark
    // element_at past the end throws under ANSI / returns NULL;
    // DuckDB split_part returns '') — an explicit CASE keeps the
    // engines agreeing if testdata ever includes short documents
    val w = split(col("text"), " ")
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(size(w) >= 3, element_at(w, 3)).as("word3"),
        element_at(w, -1).as("last_word"))
      .orderBy(col("doc_id"))
  }
  val c11Sql =
    """SELECT doc_id,
      |  CASE WHEN length(string_split(text, ' ')) >= 3
      |    THEN split_part(text, ' ', 3) END AS word3,
      |  split_part(text, ' ', -1) AS last_word
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- registry -----------------------------------------------------------

  val queries: Map[String, QFn] = Map(
    "s1_catalog_scan" -> s1CatalogScan,
    "s2_region_scan" -> s2RegionScan,
    "s3_source_history" -> s3SourceHistory,
    "s4_fsource_history" -> s4FsourceHistory,
    "f2_sample" -> f2Sample,
    "f6_forced_eligibility" -> f6ForcedEligibility,
    "f7_forced_projection" -> f7ForcedProjection,
    "f8_night_filter" -> f8NightFilter,
    "f9_duty_cycle" -> f9DutyCycle,
    "j1_s2o_match" -> j1S2oMatch,
    "j2_history_semijoin" -> j2HistorySemijoin,
    "j5_forced_antijoin" -> j5ForcedAntijoin,
    "a1_ndiasources" -> a1Ndiasources,
    "a2_transient_count" -> a2TransientCount,
    "a3_visit_counts" -> a3VisitCounts,
    "a4_stat_avg" -> a4StatAvg,
    "a5_visit_pivot" -> a5VisitPivot,
    "a6_derived_sum" -> a6DerivedSum,
    "a7_max_id" -> a7MaxId,
    "a10_timer_rollup" -> a10TimerRollup,
    "w1_latest_version" -> w1LatestVersion,
    "w2_id_sequence" -> w2IdSequence,
    "w3_validity_intervals" -> w3ValidityIntervals,
    "w4_ooo_sort" -> w4OooSort,
    "w5_asof_lookup" -> w5AsofLookup,
    "w7_asof_forward" -> w7AsofForward,
    "x19_sessionize" -> x19Sessionize,
    "x36_zorder_scan" -> x36ZorderScan,
    "u1_union_sources" -> u1UnionSources,
    "c7_time_math" -> c7TimeMath,
    "c8_ts_parse" -> c8TsParse,
    "c9_regex_extract" -> c9RegexExtract,
    "c10_json_parse" -> c10JsonParse,
    "c11_word_extract" -> c11WordExtract,
  )

  val oracleSql: Map[String, String] = Map(
    "s1_catalog_scan" -> s1Sql,
    "s2_region_scan" -> s2Sql,
    "s3_source_history" -> s3Sql,
    "s4_fsource_history" -> s4Sql,
    "f2_sample" -> f2Sql,
    "f6_forced_eligibility" -> f6Sql,
    "f7_forced_projection" -> f7Sql,
    "f8_night_filter" -> f8Sql,
    "f9_duty_cycle" -> f9Sql,
    "j1_s2o_match" -> j1Sql,
    "j2_history_semijoin" -> j2Sql,
    "j5_forced_antijoin" -> j5Sql,
    "a1_ndiasources" -> a1Sql,
    "a2_transient_count" -> a2Sql,
    "a3_visit_counts" -> a3Sql,
    "a4_stat_avg" -> a4Sql,
    "a5_visit_pivot" -> a5Sql,
    "a6_derived_sum" -> a6Sql,
    "a7_max_id" -> a7Sql,
    "a10_timer_rollup" -> a10Sql,
    "w1_latest_version" -> w1Sql,
    "w2_id_sequence" -> w2Sql,
    "w3_validity_intervals" -> w3Sql,
    "w4_ooo_sort" -> w4Sql,
    "w5_asof_lookup" -> w5Sql,
    "w7_asof_forward" -> w7Sql,
    "x19_sessionize" -> x19Sql,
    "x36_zorder_scan" -> x36Sql,
    "u1_union_sources" -> u1Sql,
    "c7_time_math" -> c7Sql,
    "c8_ts_parse" -> c8Sql,
    "c9_regex_extract" -> c9Sql,
    "c10_json_parse" -> c10Sql,
    "c11_word_extract" -> c11Sql,
  )
}
