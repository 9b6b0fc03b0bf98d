package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import QueryDef.moneySum

/** Block A extension — temporal joins Spark has no built-in operator for:
  * as-of join and interval (range) join. Both are re-expressed as
  * shuffle-friendly compositions (the preference order of SURVEY §4:
  * compose existing ops before dropping to custom plans):
  *
  *  - as-of join = union both sides tagged, one window sort per key,
  *    running "last right-side value" — ONE shuffle+sort total,
  *    independent of how many left rows match each right row. The naive
  *    formulation (theta-join on ts ranges, or per-left-row subquery)
  *    is quadratic per key and unusable at 100 TB.
  *  - range join = explode each interval into the fixed-width time
  *    buckets it covers, equi-join on the bucket key, then apply the
  *    exact range predicate as a residual filter. Turns a non-equi join
  *    (nested-loop in Spark) into a hash join whose cost is
  *    |events| + Σ interval_width/bucket_width.
  *
  * All timestamp math happens in epoch microseconds (BIGINT) on both the
  * Spark and DuckDB sides: integer µs floor identically everywhere,
  * whereas raw TIMESTAMP comparisons depend on the oracle engine's
  * parquet ns→µs conversion.
  */
object Temporal {

  /** For each event: the most recent purchase time of the same user at or
    * before the event (classic as-of / point-in-time join — e.g. "join
    * each reading to the latest calibration before it").
    *
    * side ordering at equal ts: right (0) sorts before left (1), so a
    * purchase AT the event's own timestamp is visible to it — matching
    * ASOF JOIN's `l.ts >= r.ts` contract.
    */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val left = ev.select(col("user_id"), col("us"),
      col("event_id"), lit(1).as("side"))
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us")).distinct()
      .select(col("user_id"), col("us"),
        lit(null).cast("long").as("event_id"), lit(0).as("side"))
    val w = Window.partitionBy("user_id").orderBy("us", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    right.union(left)
      .withColumn("last_purchase_us",
        max(when(col("side") === 0, col("us"))).over(w))
      .filter(col("side") === 1)
      .select("event_id", "user_id", "us", "last_purchase_us")
  }

  val qAsofJoinSql: String =
    """SELECT l.event_id, l.user_id, l.us, r.us AS last_purchase_us
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events) l
      |ASOF LEFT JOIN (
      |  SELECT DISTINCT user_id, epoch_us(ts) AS us
      |  FROM events WHERE event_type = 'purchase') r
      |ON l.user_id = r.user_id AND l.us >= r.us""".stripMargin

  /** The same as-of join through the NATIVE physical operator
    * (plans/AsOfJoin.scala — custom LogicalPlan + SparkStrategy +
    * SparkPlan): each side shuffles once on user_id, sorts on
    * (user_id, us), and a forward-only per-partition merge attaches
    * the latest purchase — no union, no window, O(1) merge state.
    * Same oracle as q_asof_join; AsofNativeSpec asserts row parity
    * with the composition AND the plan shape (AsOfJoinExec present,
    * no Window/Union in the plan).
    */
  def qAsofNative(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("p_us")).distinct()
    graft.plans.AsOfJoin.asofJoin(
        ev.select("user_id", "event_id", "us"), purchases,
        Seq("user_id"), Seq("p_user"), "us", "p_us")
      .select(col("event_id"), col("user_id"), col("us"),
        col("p_us").as("last_purchase_us"))
  }

  /** Interval join: hour-aligned 30-minute windows (generated from the
    * data's own time span) joined to the events falling inside each.
    * The window set is small here and gets broadcast, but the bucket
    * explode + equi-join shape is the one that survives when BOTH sides
    * are large: each interval lands in every hour bucket it overlaps,
    * the join is hash-on-bucket, and the exact [ws, we) predicate runs
    * as a residual filter.
    */
  private val BucketUs: Long = 3600L * 1000000 // 1-hour buckets

  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
    // windows from the data's own span: every hour from trunc(min) to max
    val windows = ev
      .agg(unix_micros(date_trunc("hour", min(col("ts")))).as("lo"),
        unix_micros(max(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(BucketUs))).as("ws_us"))
      .select(col("ws_us"), (col("ws_us") + BucketUs / 2).as("we_us"))
    // general interval→bucket explode (here each 30-min window covers one
    // bucket; intervals wider than BucketUs would land in several)
    val winBuckets = windows.select(col("ws_us"), col("we_us"),
      explode(sequence(expr(s"ws_us div ${BucketUs}L"),
        expr(s"(we_us - 1) div ${BucketUs}L"))).as("bkt"))
    ev.withColumn("bkt", expr(s"us div ${BucketUs}L"))
      .join(broadcast(winBuckets), Seq("bkt"))
      .filter(col("us") >= col("ws_us") && col("us") < col("we_us"))
      .groupBy("ws_us")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }

  val qRangeJoinSql: String =
    """WITH bounds AS (
      |  SELECT epoch_us(date_trunc('hour', MIN(ts))) AS lo, epoch_us(MAX(ts)) AS hi
      |  FROM events),
      |wins AS (
      |  SELECT unnest(generate_series(lo, hi, 3600000000)) AS ws_us FROM bounds)
      |SELECT w.ws_us, COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_users
      |FROM wins w JOIN (SELECT user_id, epoch_us(ts) AS us FROM events) e
      |  ON e.us >= w.ws_us AND e.us < w.ws_us + 1800000000
      |GROUP BY w.ws_us""".stripMargin

  /** RANGE-frame window: per user, how many events and how much value
    * landed in the trailing 30 minutes of EVENT TIME at each event —
    * a physical-time frame (rangeBetween on epoch-µs), not a row-count
    * frame: peers with the same timestamp all see the same frame, and
    * the frame width is data-dependent. One shuffle+sort per user key,
    * same as any window — the frame bound changes per-row evaluation,
    * not the exchange.
    */
  def qWindowRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-1800000000L, 0L)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .withColumn("n_30m", count(lit(1)).over(w))
      .withColumn("sum_30m",
        sum(QueryDef.dec(col("value"))).over(w).cast("double"))
      .select("event_id", "user_id", "us", "n_30m", "sum_30m")
  }

  val qWindowRangeSql: String =
    """SELECT event_id, user_id, us,
      |  COUNT(*) OVER w AS n_30m,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_30m
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY us
      |             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** SCD type-2 build — each order is a "version" of its customer's
    * state; lead() over (orderdate, orderkey) closes every version's
    * validity interval, the last version stays open (NULL valid_to).
    * This is the standard warehouse-dimension construction the
    * reference's latest-by-key snapshot is the degenerate (keep only
    * current) case of. One window per customer key — no self-join; the
    * naive "join each version to the next" formulation shuffles twice
    * and breaks on duplicate dates.
    */
  def pScd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("valid_from_us", "o_orderkey")
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        // o_orderdate reads as TIMESTAMP_NTZ; the session tz is pinned
        // UTC, so the cast matches DuckDB's epoch_us on the naive value
        unix_micros(col("o_orderdate").cast("timestamp")).as("valid_from_us"),
        col("o_totalprice"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  val pScd2Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  epoch_us(o_orderdate) AS valid_from_us, o_totalprice,
      |  LEAD(epoch_us(o_orderdate), 1) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY epoch_us(o_orderdate), o_orderkey) AS valid_to_us,
      |  LEAD(epoch_us(o_orderdate), 1) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY epoch_us(o_orderdate), o_orderkey) IS NULL AS is_current
      |FROM orders""".stripMargin

  /** A-block: INTERVAL×INTERVAL overlap join — distinct from
    * q_range_join's point-in-interval: both sides are intervals (here
    * each user's click sessions vs purchase sessions, 30-min half-open),
    * and a pair matches iff the intervals intersect. The naive form is
    * a per-user theta join (quadratic in per-user density — a hot user
    * with 10⁵ clicks × 10⁵ purchases is 10¹⁰ comparisons); instead both
    * sides explode into the HOUR BUCKETS they cover (≤2 each at these
    * widths) and equi-join on (user, bucket) — a hash join Catalyst can
    * shuffle-partition, with work linear in intervals × buckets-covered.
    * Duplicate pairs (intervals sharing several buckets) are killed
    * WITHOUT a distinct: a pair reports only in the bucket containing
    * the overlap's start, max(c_s, p_s) — the standard spatial-join
    * de-dup trick, per-row arithmetic instead of a second shuffle.
    */
  private val IvSessUs = 1800000000L

  def qIntervalJoin(s: SparkSession, d: String): DataFrame = {
    def side(t: String, p: String) = Tables.events(s, d)
      .filter(col("event_type") === t)
      .select(col("user_id"), col("event_id").as(s"${p}_id"),
        unix_micros(col("ts")).as(s"${p}_s"),
        (unix_micros(col("ts")) + IvSessUs).as(s"${p}_e"))
      .withColumn("bkt", explode(sequence(
        expr(s"${p}_s DIV ${BucketUs}L"),
        expr(s"(${p}_e - 1) DIV ${BucketUs}L"))))
    side("click", "c").join(side("purchase", "p"), Seq("user_id", "bkt"))
      .filter(col("c_s") < col("p_e") && col("p_s") < col("c_e"))
      .filter(col("bkt") ===
        expr(s"greatest(c_s, p_s) DIV ${BucketUs}L"))
      .select(col("user_id"), col("c_id"), col("p_id"),
        (least(col("c_e"), col("p_e")) - greatest(col("c_s"), col("p_s")))
          .as("overlap_us"))
  }

  val qIntervalJoinSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
       |c AS (SELECT user_id, event_id AS c_id, us AS c_s, us + $IvSessUs AS c_e
       |      FROM e WHERE event_type = 'click'),
       |p AS (SELECT user_id, event_id AS p_id, us AS p_s, us + $IvSessUs AS p_e
       |      FROM e WHERE event_type = 'purchase')
       |SELECT c.user_id, c_id, p_id,
       |  LEAST(c_e, p_e) - GREATEST(c_s, p_s) AS overlap_us
       |FROM c JOIN p ON c.user_id = p.user_id AND c_s < p_e AND p_s < c_e""".stripMargin

  /** A-block: POINT-IN-TIME feature join (the feature-store PIT /
    * Feast-style training-set build): every purchase (label event) is
    * enriched with feature values AS OF its timestamp — cumulative
    * click count and cumulative view spend — with strictly-no-leakage
    * semantics (a feature row at exactly the label's time counts;
    * anything later never does; ties are pinned by (us, side,
    * event_id) so "as of" is a total order, not a race).
    *
    * Scale shape: ONE union + ONE user_id window sweep computes every
    * feature cumulatively in place — labels read the running value at
    * their own sort position, so the whole training-set build is one
    * shuffle and one sorted pass. The textbook form (one correlated
    * subquery or one as-of join PER FEATURE TABLE, which is what the
    * oracle twin replays) pays a pass per feature; this folds k
    * features into the same sweep, which is why feature stores
    * co-partition their event logs by entity. Spend stays
    * DECIMAL(18,2) through the cumulative sum (Money contract), cast
    * to DOUBLE once at the label row.
    */
  def qPitJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        when(col("event_type") === "view",
          col("value").cast("decimal(18,2)")).as("val"))
      .withColumn("side", when(col("event_type") === "purchase", 1).otherwise(0))
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("clicks_before",
        count(when(col("event_type") === "click", 1)).over(w))
      .withColumn("spend_cum", sum(col("val")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"),
        col("clicks_before"),
        coalesce(col("spend_cum").cast("double"), lit(0.0)).as("spend_before"))
  }

  val qPitJoinSql: String =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'),
      |v AS (SELECT user_id, epoch_us(ts) AS us, CAST(value AS DECIMAL(18,2)) AS val
      |      FROM events WHERE event_type = 'view')
      |SELECT p.event_id, p.user_id, p.us,
      |  CAST((SELECT COUNT(*) FROM c
      |        WHERE c.user_id = p.user_id AND c.us <= p.us) AS BIGINT) AS clicks_before,
      |  COALESCE((SELECT CAST(SUM(val) AS DOUBLE) FROM v
      |            WHERE v.user_id = p.user_id AND v.us <= p.us), 0.0) AS spend_before
      |FROM p""".stripMargin

  /** T-bi: BITEMPORAL as-of — the missing axis pair of the temporal
    * family: p_time_travel answers "as recorded at T" (transaction
    * time), q_asof answers "as valid at V" (valid time); a bitemporal
    * query answers BOTH at once ("what did we believe on T about the
    * state at V" — the audit/backtest question). Versions derive from
    * orders: v1 at order date; orders ≡ 0 (mod 5) gain a retroactive
    * correction (valid from +1 day, recorded +3 days, status 'X').
    * Three (valid_at, tx_at) anchors probe the grid: knowledge and
    * validity mid-corpus; past validity with full knowledge (sees
    * corrections); current validity with early knowledge (cannot).
    * Plan: the 3-row anchor frame broadcast non-equi-joins the version
    * table (bounded nested loop — 3 anchor rows, never data × data),
    * one (anchor, id) window picks the max (valid_us, tx_us) visible
    * version, then a tiny status aggregate. All time math is integer
    * epoch-µs on both engines; anchor literals are computed once here
    * and interpolated into both plans.
    */
  private val BiDayUs = 86400000000L
  private def biUs(date: String): Long =
    java.time.LocalDate.parse(date).toEpochDay * BiDayUs
  private[graft] val BiAnchors: Seq[(String, Long, Long)] = Seq(
    ("mid_mid", biUs("1998-06-01"), biUs("1998-06-01")),
    ("past_full", biUs("1998-06-01"), biUs("2002-01-01")),
    ("now_early", biUs("2002-01-01"), biUs("1997-01-01")))

  def qBitemporal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // o_orderdate is TIMESTAMP_NTZ in the fixture parquet; the session
    // runs UTC so the cast is wall-clock-identity and epoch_us agrees
    val o = Tables.orders(s, d).select(col("o_orderkey").as("id"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
      col("o_orderstatus").as("status"), col("o_totalprice"))
    val v1 = o.select(col("id"), col("us").as("valid_us"), col("us").as("tx_us"),
      col("status"), col("o_totalprice"))
    val v2 = o.filter(col("id") % 5 === 0)
      .select(col("id"), (col("us") + BiDayUs).as("valid_us"),
        (col("us") + 3 * BiDayUs).as("tx_us"),
        lit("X").as("status"), col("o_totalprice"))
    val versions = v1.unionByName(v2)
    val anchors = BiAnchors.toDF("anchor", "v_at", "t_at")
    val visible = versions.join(broadcast(anchors),
      col("valid_us") <= col("v_at") && col("tx_us") <= col("t_at"))
    val w = Window.partitionBy("anchor", "id")
      .orderBy(col("valid_us").desc, col("tx_us").desc)
    visible.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("anchor", "status")
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
  }

  val qBitemporalSql: String = {
    val anchors = BiAnchors
      .map { case (a, v, t) => s"('$a', $v, $t)" }.mkString(", ")
    s"""WITH o AS (
       |  SELECT o_orderkey AS id, epoch_us(o_orderdate) AS us,
       |    o_orderstatus AS status, o_totalprice
       |  FROM orders),
       |versions AS (
       |  SELECT id, us AS valid_us, us AS tx_us, status, o_totalprice FROM o
       |  UNION ALL
       |  SELECT id, us + $BiDayUs, us + 3 * $BiDayUs, 'X', o_totalprice
       |  FROM o WHERE id % 5 = 0),
       |anchors(anchor, v_at, t_at) AS (VALUES $anchors),
       |visible AS (
       |  SELECT a.anchor, v.*,
       |    ROW_NUMBER() OVER (PARTITION BY a.anchor, v.id
       |      ORDER BY v.valid_us DESC, v.tx_us DESC) AS rn
       |  FROM versions v JOIN anchors a
       |    ON v.valid_us <= a.v_at AND v.tx_us <= a.t_at)
       |SELECT anchor, status, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       |FROM visible WHERE rn = 1 GROUP BY 1, 2""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_bitemporal", qBitemporal, Some(qBitemporalSql)),
    QueryDef("q_pit_join", qPitJoin, Some(qPitJoinSql)),
    QueryDef("q_interval_join", qIntervalJoin, Some(qIntervalJoinSql)),
    QueryDef("q_asof_join", qAsofJoin, Some(qAsofJoinSql)),
    QueryDef("q_asof_native", qAsofNative, Some(qAsofJoinSql)),
    QueryDef("q_range_join", qRangeJoin, Some(qRangeJoinSql)),
    QueryDef("q_window_range", qWindowRange, Some(qWindowRangeSql)),
    QueryDef("p_scd2", pScd2, Some(pScd2Sql)),
  )
}
