package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin}

/** Temporal and range join surface: as-of joins (last-click-before-
  * purchase attribution, funnel conversion) and interval banding via
  * the bucketed range join — operator families the reference engine
  * lacks entirely (SURVEY.md §2.8) that a training-data/event pipeline
  * needs at scale. Both operators avoid the nested-loop shapes Spark
  * would otherwise pick: AsofJoin is one window pass over a union,
  * RangeJoin is a broadcast hash join on computed bucket ids.
  *
  * Timestamps are compared at epoch-millisecond resolution on BOTH
  * engines (the events table stores nanos; strictness must be defined
  * on one clock, so the oracle's ASOF JOIN also runs on epoch_ms).
  */
object JoinQueries extends QueryRegistry {
  import Tables._

  private val Dec = "decimal(18,4)"

  private def evMs(s: SparkSession, dir: String): DataFrame =
    events(s, dir).withColumn("ms", unix_millis(col("ts")))

  /** Irregular price bands covering the observed l_extendedprice range. */
  private val PriceBands = Seq(
    (0.0, 5000.0, "budget"), (5000.0, 20000.0, "mainstream"),
    (20000.0, 45000.0, "premium"), (45000.0, 80000.0, "luxury"),
    (80000.0, 110000.0, "flagship"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // as-of join: for each purchase (first 20 users), the gap to the
    // same user's most recent strictly-earlier click
    "asof_last_click" -> ((s, dir) => {
      val ev = evMs(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase" && col("user_id") < 20)
        .select(col("event_id"), col("user_id"), col("ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ms"))
      AsofJoin.asofJoin(purchases, clicks, Seq("user_id"), "ms", "ms", Seq("ms"))
        .select(col("event_id"), col("user_id"),
          (col("ms") - col("matched.ms")).cast("long").as("gap_ms"))
        .orderBy(col("event_id"))
    }),

    // FORWARD as-of join: for each click (first 20 users), the same
    // user's earliest strictly-later purchase — "time to conversion"
    // per click; the reversed-scan twin of asof_last_click
    "asof_next_purchase" -> ((s, dir) => {
      val ev = evMs(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click" && col("user_id") < 20)
        .select(col("event_id"), col("user_id"), col("ms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ms"), col("event_id").as("p_id"))
      AsofJoin.asofJoin(clicks, purchases, Seq("user_id"), "ms", "ms",
        payload = Seq("ms", "p_id"), tiebreak = Some("p_id"), forward = true)
        .select(col("event_id"), col("user_id"),
          col("matched.p_id").cast("long").as("purchase_id"),
          (col("matched.ms") - col("ms")).cast("long").as("gap_ms"))
        .orderBy(col("event_id"))
    }),

    // funnel: users whose purchase followed a click within 30 min;
    // per-user best (minimum) click→purchase gap, then corpus rollup —
    // the as-of join composed into a conversion metric
    "funnel_conversion" -> ((s, dir) => {
      val ev = evMs(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ms"))
      AsofJoin.asofJoin(purchases, clicks, Seq("user_id"), "ms", "ms", Seq("ms"))
        .select(col("user_id"), (col("ms") - col("matched.ms")).as("gap_ms"))
        .filter(col("gap_ms") <= 1800000L)
        .groupBy(col("user_id"))
        .agg(min(col("gap_ms")).as("min_gap_ms"))
        .agg(count(lit(1)).as("n_converted_users"),
          round(avg(col("min_gap_ms")), 6).as("avg_min_gap_ms"))
    }),

    // range join: lineitem prices matched to irregular [lo, hi) bands
    // through the bucketed equi-join (no nested loop in the plan)
    "price_band_rollup" -> ((s, dir) => {
      import s.implicits._
      val bands = PriceBands.toDF("lo", "hi", "band")
      RangeJoin.bandJoin(
        lineitem(s, dir).select(col("l_extendedprice")),
        bands, "l_extendedprice", "lo", "hi", bucketWidth = 2500.0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(Dec)).cast("double").as("total_price"))
        .orderBy(col("band"))
    }),

    // TPC-H Q6: single-table forecast-revenue filter-aggregate — the
    // pure predicate-pushdown + map-side-partial shape
    "q6_forecast_revenue" -> ((s, dir) =>
      lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          coalesce(sum(col("l_extendedprice").cast("decimal(14,2)") *
            col("l_discount").cast("decimal(4,2)")), lit(0).cast("decimal(20,4)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))),
  )

  override def oracle: Map[String, String] = Map(
    "asof_last_click" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
        |           WHERE event_type = 'purchase' AND user_id < 20),
        |c AS (SELECT user_id, epoch_ms(ts) AS ms FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, CAST(p.ms - c.ms AS BIGINT) AS gap_ms
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ms > c.ms
        |ORDER BY p.event_id""".stripMargin,

    // DuckDB ASOF is backward-only; the forward join replays as an
    // inequality join + row_number (fine for an oracle, which never
    // needs to scale)
    "asof_next_purchase" ->
      """WITH c AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
        |           WHERE event_type = 'click' AND user_id < 20),
        |p AS (SELECT event_id AS p_id, user_id, epoch_ms(ts) AS ms FROM events
        |      WHERE event_type = 'purchase'),
        |j AS (SELECT c.event_id, c.user_id, p.p_id, p.ms - c.ms AS gap_ms,
        |        row_number() OVER (PARTITION BY c.event_id
        |                           ORDER BY p.ms ASC, p.p_id ASC) AS rn
        |      FROM c JOIN p ON c.user_id = p.user_id AND p.ms > c.ms)
        |SELECT event_id, user_id, CAST(p_id AS BIGINT) AS purchase_id,
        |       CAST(gap_ms AS BIGINT) AS gap_ms
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "funnel_conversion" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_ms(ts) AS ms FROM events WHERE event_type = 'click'),
        |g AS (SELECT p.user_id, p.ms - c.ms AS gap_ms
        |      FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ms > c.ms
        |      WHERE p.ms - c.ms <= 1800000),
        |u AS (SELECT user_id, min(gap_ms) AS min_gap_ms FROM g GROUP BY user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted_users,
        |       round(avg(min_gap_ms), 6) AS avg_min_gap_ms
        |FROM u""".stripMargin,

    "price_band_rollup" ->
      """WITH bands(lo, hi, band) AS (VALUES
        |  (0.0, 5000.0, 'budget'), (5000.0, 20000.0, 'mainstream'),
        |  (20000.0, 45000.0, 'premium'), (45000.0, 80000.0, 'luxury'),
        |  (80000.0, 110000.0, 'flagship'))
        |SELECT b.band, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        |FROM lineitem l
        |JOIN bands b ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
        |GROUP BY b.band ORDER BY b.band""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(4,2))), 0) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
  )
}
