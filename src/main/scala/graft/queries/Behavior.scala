package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import QueryDef._

/** Block A additions — behavioral / product analytics over the `events`
  * stream table: ordered funnel conversion, cohort retention, and
  * last-touch revenue attribution. These are the classic event-analytics
  * queries a warehouse team runs daily over exactly the kind of
  * Kafka-sourced event stream the reference ingests (one envelope per
  * user action, /root/reference/steps/ingesters.py:30); the reference
  * stops at landing the records — these are the first queries the landed
  * table exists to answer.
  *
  * Scale shape (all three): ONE shuffle on `user_id`, then per-user
  * linear work. The funnel walks each user's sorted event list once with
  * an `aggregate` HOF (state = stage reached + match position — O(1)
  * per event, never materializing per-stage joins); retention compresses
  * each user to (first week, distinct active weeks ≤ 53) map-side via
  * collect_set before the tiny cohort aggregate; attribution is one
  * running `last(_, ignoreNulls)` window pass. At 100 TB of events none
  * of these ever shuffles more than the events table once, and the
  * post-shuffle state per user is bounded by that user's event count
  * (funnel/attribution) or the number of calendar weeks (retention).
  */
object Behavior {

  /** Anchored conversion window: every later stage must land within 3
    * days of the user's FIRST signup. With the deadline fixed by stage 1,
    * greedy earliest-match per stage is provably optimal (taking an
    * earlier qualifying event never shrinks the remaining candidate set),
    * so the single-pass walk and the oracle's chained first-match CTEs
    * compute the same conversion set.
    */
  private[graft] val GapUs = 3L * 86400000000L
  private[graft] val Stages = Seq("signup", "view", "click", "purchase")

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("user_id"), unix_micros(col("ts")).as("us"),
      col("event_id"), col("event_type"), col("value"))

  /** Ordered funnel signup → view → click → purchase, 3-day anchored
    * conversion window. Per user: sort events once, walk them once
    * (aggregate HOF; state = (stage, us, id, deadline)); ties on `us`
    * broken by `event_id` so the walk order is total and engine-exact.
    */
  def qFunnel(s: SparkSession, d: String): DataFrame =
    funnelOf(events(s, d))

  /** Core over any (user_id, us, event_id, event_type) frame — specs feed
    * doctored fixtures (ties, expired windows, out-of-order stages).
    */
  def funnelOf(ev: DataFrame): DataFrame = {
    val walked = ev
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("us"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(expr(
        s"""aggregate(evs,
           |  named_struct('stage', 0, 'us', CAST(0 AS BIGINT), 'deadline', CAST(0 AS BIGINT)),
           |  (acc, e) -> CASE
           |    WHEN acc.stage = 0 AND e.event_type = 'signup'
           |      THEN named_struct('stage', 1, 'us', e.us, 'deadline', e.us + ${GapUs}L)
           |    WHEN acc.stage > 0 AND acc.stage < 4 AND e.us <= acc.deadline
           |         AND e.event_type = element_at(array('signup','view','click','purchase'), acc.stage + 1)
           |      THEN named_struct('stage', acc.stage + 1, 'us', e.us, 'deadline', acc.deadline)
           |    ELSE acc END,
           |  acc -> acc.stage)""".stripMargin).as("reached"))
    stageCounts(walked)
  }

  /** (user, reached stage) → the funnel table: users reaching stage ≥ k
    * per step. Shared with the streaming twin (st_funnel), which derives
    * `reached` from flatMapGroupsWithState state instead of the batch
    * walk.
    */
  private[graft] def stageCounts(walked: DataFrame): DataFrame =
    walked.agg(
      count(when(col("reached") >= 1, 1)).as("u1"),
      count(when(col("reached") >= 2, 1)).as("u2"),
      count(when(col("reached") >= 3, 1)).as("u3"),
      count(when(col("reached") >= 4, 1)).as("u4"))
      .selectExpr(
        """stack(4, '1_signup', u1, '2_view', u2, '3_click', u3,
          |         '4_purchase', u4) AS (step, users)""".stripMargin)
      .orderBy("step")

  val qFunnelSql: String = {
    val g = GapUs
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
       |s1 AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'signup'
       |       QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) = 1),
       |s2 AS (SELECT e.user_id, e.us, e.event_id, s1.us + $g AS deadline
       |       FROM e JOIN s1 USING (user_id)
       |       WHERE e.event_type = 'view' AND (e.us, e.event_id) > (s1.us, s1.event_id)
       |         AND e.us <= s1.us + $g
       |       QUALIFY row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) = 1),
       |s3 AS (SELECT e.user_id, e.us, e.event_id, s2.deadline
       |       FROM e JOIN s2 USING (user_id)
       |       WHERE e.event_type = 'click' AND (e.us, e.event_id) > (s2.us, s2.event_id)
       |         AND e.us <= s2.deadline
       |       QUALIFY row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) = 1),
       |s4 AS (SELECT e.user_id, e.us, e.event_id
       |       FROM e JOIN s3 USING (user_id)
       |       WHERE e.event_type = 'purchase' AND (e.us, e.event_id) > (s3.us, s3.event_id)
       |         AND e.us <= s3.deadline
       |       QUALIFY row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) = 1)
       |SELECT * FROM (
       |  SELECT '1_signup' AS step, count(*) AS users FROM s1
       |  UNION ALL SELECT '2_view', count(*) FROM s2
       |  UNION ALL SELECT '3_click', count(*) FROM s3
       |  UNION ALL SELECT '4_purchase', count(*) FROM s4)
       |ORDER BY step""".stripMargin
  }

  /** Weekly cohort retention: cohort = the user's first active epoch-week;
    * one cell per (cohort, week offset 0..3) counting distinct users
    * still active. Each user is compressed map-side to
    * (min week, collect_set(week)) — the set is bounded by the number of
    * calendar weeks in the data, not by event count — so the shuffle
    * carries O(users · weeks) tiny rows and the final aggregate is a few
    * hundred cells at any corpus size.
    */
  def qRetention(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"), expr("us div 604800000000").as("wk"))
      .groupBy("user_id")
      .agg(min("wk").as("cohort_wk"), collect_set("wk").as("weeks"))
      .select(col("cohort_wk"), explode(col("weeks")).as("wk"))
      .withColumn("off", col("wk") - col("cohort_wk"))
      .filter(col("off") <= 3)
      .groupBy("cohort_wk", "off")
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_wk", "off")

  val qRetentionSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1),
      |a AS (SELECT DISTINCT e.user_id, c.cohort_wk, e.wk FROM e JOIN c USING (user_id))
      |SELECT cohort_wk, wk - cohort_wk AS off, count(*) AS users
      |FROM a WHERE wk - cohort_wk <= 3
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Last-touch revenue attribution: each purchase's value is credited to
    * the channel (event type) of the user's most recent preceding
    * non-purchase event — `direct` when the purchase is the user's first
    * touch. One running `last(_, ignoreNulls)` window per user (single
    * shuffle+sort), then a tiny channel aggregate in Money decimals.
    */
  def qAttribution(s: SparkSession, d: String): DataFrame =
    attributionOf(events(s, d))

  /** Core over any (user_id, us, event_id, event_type, value) frame. */
  def attributionOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel", coalesce(col("touch"), lit("direct")))
      .groupBy("channel")
      .agg(count(lit(1)).as("purchases"), moneySum(col("value")).as("revenue"))
      .orderBy("channel")
  }

  val qAttributionSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type, value FROM events),
      |t AS (SELECT *, last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |        OVER (PARTITION BY user_id ORDER BY us, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |      FROM e)
      |SELECT coalesce(touch, 'direct') AS channel, count(*) AS purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** MATCH_RECOGNIZE-style row-pattern matching (SQL:2016; the
    * Flink/Trino/Oracle CEP surface) over per-user event sequences:
    * PATTERN (V+ C P) — one or more views immediately followed by a
    * click then a purchase, contiguous in the user's (ts, event_id)
    * order — with AFTER MATCH SKIP PAST LAST ROW. Spark has no
    * MATCH_RECOGNIZE clause, so the semantics are re-expressed by
    * SYMBOLIZATION: each user's ordered events compress to a one-char-
    * per-row symbol string ('v'iew/'c'lick/'p'urchase/'s'ignup/
    * 'e'rror) and the row pattern becomes a plain regex scanned
    * left-to-right — `Matcher.find` IS leftmost, non-overlapping,
    * skip-past-last-row. Per matching user: match count, the longest
    * V+ run inside any match, and total matched rows.
    *
    * Engine parity: `v+cp` contains no alternation, so leftmost-first
    * (java.util.regex, Spark) and leftmost-longest (RE2, DuckDB) agree
    * on every match — both take the maximal view run ending at the
    * anchoring 'cp'. The symbol alphabet is the event types' distinct
    * first letters.
    *
    * Scale shape: ONE shuffle on user_id (same as the funnel); the
    * per-user state is one byte per event, and the regex scan is a
    * single linear pass over it. No joins, no window re-sorts; at
    * 100 TB of events the pattern match costs the events shuffle plus
    * O(events-per-user) local work.
    */
  def qMatchRecognize(s: SparkSession, d: String): DataFrame =
    matchRecognizeOf(events(s, d))

  /** Core over any (user_id, us, event_id, event_type) frame — specs
    * feed doctored sequences (overlap candidates, greedy-run ties).
    */
  def matchRecognizeOf(ev: DataFrame): DataFrame =
    ev.groupBy("user_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("us"), col("event_id"),
          col("event_type")))),
        e => substring(e("event_type"), 1, 1)), "").as("sym"))
      .select(col("user_id"),
        expr("regexp_extract_all(sym, 'v+cp', 0)").as("ms"))
      .filter(size(col("ms")) > 0)
      .select(col("user_id"),
        size(col("ms")).cast("long").as("n_matches"),
        array_max(transform(col("ms"), x => length(x) - 2))
          .cast("long").as("max_views"),
        aggregate(transform(col("ms"), x => length(x)),
          lit(0), (a, x) => a + x).cast("long").as("matched_rows"))
      .orderBy("user_id")

  val qMatchRecognizeSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
      |s AS (SELECT user_id,
      |        array_to_string(list(substr(event_type, 1, 1) ORDER BY us, event_id), '') AS sym
      |      FROM e GROUP BY user_id),
      |m AS (SELECT user_id, regexp_extract_all(sym, 'v+cp') AS ms FROM s)
      |SELECT user_id, CAST(len(ms) AS BIGINT) AS n_matches,
      |  CAST(list_max(list_transform(ms, x -> length(x) - 2)) AS BIGINT) AS max_views,
      |  CAST(list_sum(list_transform(ms, x -> length(x))) AS BIGINT) AS matched_rows
      |FROM m WHERE len(ms) > 0 ORDER BY user_id""".stripMargin

  /** A-block: peak concurrency (max simultaneously-open sessions) per
    * event_type — the classic "concurrent viewers" sweep-line. Each event
    * opens a half-open 30-minute session [us, us+30m); peak = max running
    * sum of +1/−1 deltas ordered by (t, delta) (the −1 first, so a session
    * ending exactly when another starts never overlaps).
    *
    * Scale shape: the textbook single ORDER BY t window would serialize
    * each key's entire history through one task — with 5 event types
    * that is 5 tasks for 100 TB. Instead a SEGMENTED scan: deltas hash
    * into (key, hour-bucket) groups — one well-distributed shuffle —
    * where a sorted HOF walk yields each bucket's (delta sum, local max
    * prefix, first time achieving it); a second, tiny window over the
    * per-bucket rows (bounded by time span / bucket width, not by event
    * count) turns bucket sums into running offsets, and
    * peak = max(offset + local max). Same associative-scan decomposition
    * Flink/kdb use for parallel interval stabbing.
    */
  private[graft] val SessUs = 1800000000L
  private[graft] val BucketUs = 3600000000L

  def qConcurrency(s: SparkSession, d: String): DataFrame =
    concurrencyOf(events(s, d))

  /** Core over any (event_type, us) frame — specs feed doctored
    * fixtures (end-meets-start ties, cross-bucket plateaus).
    */
  def concurrencyOf(ev: DataFrame): DataFrame = {
    val deltas = ev.select(col("event_type"),
        explode(array(
          struct(col("us").as("t"), lit(1).as("delta")),
          struct((col("us") + SessUs).as("t"), lit(-1).as("delta")))).as("e"))
      .select(col("event_type"), col("e.t").as("t"), col("e.delta").as("delta"))
    val buckets = deltas
      .withColumn("bucket", expr(s"t DIV ${BucketUs}L"))
      .groupBy("event_type", "bucket")
      .agg(sort_array(collect_list(struct(col("t"), col("delta")))).as("ds"),
        sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_open"))
      .select(col("event_type"), col("bucket"), col("n_open"),
        expr("""aggregate(ds,
          |  named_struct('run', CAST(0 AS BIGINT),
          |               'best', CAST(-4611686018427387904 AS BIGINT),
          |               'bestT', CAST(0 AS BIGINT)),
          |  (acc, e) -> named_struct(
          |    'run', acc.run + e.delta,
          |    'best', CASE WHEN acc.run + e.delta > acc.best
          |                 THEN acc.run + e.delta ELSE acc.best END,
          |    'bestT', CASE WHEN acc.run + e.delta > acc.best
          |                  THEN e.t ELSE acc.bestT END))""".stripMargin).as("st"))
      .select(col("event_type"), col("bucket"), col("n_open"),
        col("st.run").as("dsum"), col("st.best").as("lbest"),
        col("st.bestT").as("lbestT"))
    val w = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    buckets
      .withColumn("gbest", coalesce(sum("dsum").over(w), lit(0L)) + col("lbest"))
      .groupBy("event_type")
      .agg(
        max(struct(col("gbest"), (-col("bucket")).as("nb"),
          col("lbestT"))).as("m"),
        sum("n_open").as("n_sessions"))
      .select(col("event_type"), col("m.gbest").as("peak"),
        col("m.lbestT").as("peak_at_us"), col("n_sessions"))
  }

  val qConcurrencySql: String =
    s"""WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
       |d AS (
       |  SELECT event_type, us AS t, 1 AS delta FROM e
       |  UNION ALL
       |  SELECT event_type, us + $SessUs, -1 FROM e),
       |r AS (SELECT event_type, t, delta,
       |        SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
       |      FROM d),
       |r2 AS (SELECT *, MAX(run) OVER (PARTITION BY event_type) AS pk FROM r)
       |SELECT event_type, CAST(pk AS BIGINT) AS peak,
       |  CAST(MIN(CASE WHEN run = pk THEN t END) AS BIGINT) AS peak_at_us,
       |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
       |FROM r2 GROUP BY event_type, pk""".stripMargin

  /** A-block: deterministic per-group reservoir sample — EXACTLY k
    * events per user, uniform over the user's history, reproducible
    * across runs and engines. Where Bernoulli `TABLESAMPLE` gives a
    * random-sized sample and a true reservoir is stateful/sequential,
    * ordering each group by a keyed hash (md5 of user:event) and taking
    * row_number ≤ k IS a reservoir draw (any k-subset equally likely
    * under the hash's uniformity) with a deterministic seed.
    *
    * Scale shape: the rank filter plans as WindowGroupLimit (partial
    * below the exchange, final above — plan-pinned in BehaviorSpec), so
    * each mapper locally top-k's its groups and at most k rows per
    * (group, mapper) ever cross the shuffle: sampling 5 of a billion
    * events per user shuffles ~5·mappers rows, not the billion. The
    * full-history sort the naive window implies never happens.
    */
  private[graft] val ReservoirK = 5

  def qReservoir(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("rk"), col("event_id"))
    events(s, d)
      .withColumn("rk", md5(concat_ws(":", col("user_id"), col("event_id"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= ReservoirK)
      .select(col("user_id"), col("rn").as("sample_rank"),
        col("event_id"), col("event_type"))
  }

  val qReservoirSql: String =
    s"""SELECT user_id, CAST(rn AS INTEGER) AS sample_rank, event_id, event_type
       |FROM (
       |  SELECT user_id, event_id, event_type,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY md5(CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR)),
       |               event_id) AS rn
       |  FROM events) t WHERE rn <= $ReservoirK""".stripMargin

  /** A-block: gaps-and-islands — per user, the maximal runs of
    * CONSECUTIVE active days (streak detection: activity streaks,
    * uptime islands, contiguous-coverage audits). The rn-diff trick
    * makes it one declarative pass: within a user's sorted distinct
    * days, `day − row_number()` is constant exactly along a consecutive
    * run, so grouping on it materializes the islands with no iterative
    * logic. ONE shuffle on user_id (the distinct and both windows share
    * it); per-user state is its day list, bounded by the calendar.
    * Longest-streak argmax is struct-max (len, −start), so ties pick
    * the earliest streak deterministically on both engines.
    */
  def qIslands(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
    islands.groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"),
        max(struct(col("len"), (-col("start_day")).as("ns"))).as("m"))
      .select(col("user_id"), col("n_streaks"),
        col("m.len").as("longest"), (-col("m.ns")).as("longest_start_day"))
  }

  val qIslandsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |i AS (
      |  SELECT user_id, day,
      |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days),
      |st AS (
      |  SELECT user_id, grp, COUNT(*) AS len, MIN(day) AS start_day
      |  FROM i GROUP BY 1, 2),
      |st2 AS (SELECT *, MAX(len) OVER (PARTITION BY user_id) AS ml FROM st)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(ml AS BIGINT) AS longest,
      |  MIN(CASE WHEN len = ml THEN start_day END) AS longest_start_day
      |FROM st2 GROUP BY user_id, ml""".stripMargin

  /** A-mon: first-order MARKOV transition matrix over per-user event
    * sequences — P(next event_type | current), the classic "what do
    * users do after X" behavioral table (and the base model for
    * next-event prediction / anomalous-path scoring). ONE shuffle on
    * user_id for the lead() window (ties broken by event_id — total
    * order, engine-exact), then two tiny aggregates keyed by event
    * type; the transition matrix is |types|² rows at any corpus size.
    * prob = cnt/total is a single IEEE-exact division of BIGINT-exact
    * scalars — full-precision oracle match, no fixed point needed.
    */
  def qMarkov(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val pairs = events(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val c = pairs.groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("cnt"))
    val tot = c.groupBy("prev_type").agg(sum("cnt").as("t"))
    c.join(tot, Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("cnt"),
        col("t").cast("long").as("total"),
        (col("cnt").cast("double") / col("t").cast("double")).as("prob"))
  }

  val qMarkovSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
      |p AS (SELECT event_type AS prev_type,
      |        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_type
      |      FROM e),
      |c AS (SELECT prev_type, next_type, COUNT(*) AS cnt
      |      FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT prev_type, SUM(cnt) AS total FROM c GROUP BY 1)
      |SELECT c.prev_type, c.next_type, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(total AS BIGINT) AS total,
      |  CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS prob
      |FROM c JOIN t USING (prev_type)""".stripMargin

  /** A-seg: RFM segmentation (recency / frequency / monetary) over
    * purchases — the classic retail user-value grid. Scores use FIXED
    * business bins (days-since-last, order count, lifetime cents), NOT
    * quantiles: quantile scoring needs a global NTILE — a single-task
    * sort at 100 TB — while fixed bins are one per-user aggregate plus
    * a broadcast of the 1-row corpus max-timestamp, fully map-side
    * combinable and integer-exact across engines (recency uses
    * truncating integer division on nonnegative microseconds). Output
    * is the segment grid (≤125 cells), not per-user rows.
    */
  def qRfm(s: SparkSession, d: String): DataFrame = {
    val p = events(s, d).filter(col("event_type") === "purchase")
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
    val nowUs = p.agg(max("us").as("now_us"))
    val perUser = p.groupBy("user_id")
      .agg(max("us").as("last_us"), count(lit(1)).as("f"), sum("cents").as("m"))
      .crossJoin(broadcast(nowUs))
      .withColumn("rd", expr("(now_us - last_us) div 86400000000"))
    val rScore = when(col("rd") <= 2, 5).when(col("rd") <= 5, 4)
      .when(col("rd") <= 10, 3).when(col("rd") <= 20, 2).otherwise(1)
    val fScore = when(col("f") >= 50, 5).when(col("f") >= 20, 4)
      .when(col("f") >= 10, 3).when(col("f") >= 5, 2).otherwise(1)
    val mScore = when(col("m") >= 500000, 5).when(col("m") >= 200000, 4)
      .when(col("m") >= 50000, 3).when(col("m") >= 10000, 2).otherwise(1)
    perUser
      .select(rScore.as("r_score"), fScore.as("f_score"), mScore.as("m_score"),
        col("m"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"), sum("m").cast("long").as("total_cents"))
  }

  val qRfmSql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |nowt AS (SELECT MAX(us) AS now_us FROM p),
      |u AS (
      |  SELECT user_id, (MAX(now_us) - MAX(us)) // 86400000000 AS rd,
      |    COUNT(*) AS f, SUM(cents) AS m
      |  FROM p CROSS JOIN nowt GROUP BY user_id),
      |scored AS (
      |  SELECT
      |    CASE WHEN rd <= 2 THEN 5 WHEN rd <= 5 THEN 4 WHEN rd <= 10 THEN 3
      |         WHEN rd <= 20 THEN 2 ELSE 1 END AS r_score,
      |    CASE WHEN f >= 50 THEN 5 WHEN f >= 20 THEN 4 WHEN f >= 10 THEN 3
      |         WHEN f >= 5 THEN 2 ELSE 1 END AS f_score,
      |    CASE WHEN m >= 500000 THEN 5 WHEN m >= 200000 THEN 4
      |         WHEN m >= 50000 THEN 3 WHEN m >= 10000 THEN 2 ELSE 1 END AS m_score,
      |    m
      |  FROM u)
      |SELECT r_score, f_score, m_score, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(m) AS BIGINT) AS total_cents
      |FROM scored GROUP BY 1, 2, 3""".stripMargin

  /** A-ts: EWMA smoothing of the per-type daily purchase-value series
    * (α = 0.2, 8-tap truncated kernel) — the ops-dashboard smoother
    * next to q_gap_fill (which owns gap densification; this runs over
    * observed days). Float discipline: the eight kernel weights
    * α(1−α)ʲ are computed ONCE here and interpolated into BOTH plans
    * as 17-significant-digit literals (exact double round-trip), and
    * the dot product is written as the same left-associated expression
    * tree in both engines over integer-exact daily cent totals — so
    * every multiply/add pairs identically and the result is
    * bit-identical with no fixed point and no libm exposure.
    */
  private[graft] val EwmaTaps = 8
  private[graft] val EwmaWeights: Seq[Double] =
    (0 until EwmaTaps).map(j => 0.2 * math.pow(0.8, j))

  def qEwma(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d).filter(col("event_type") === "purchase")
      .groupBy(col("event_type"), expr("us div 86400000000").as("day"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("cents"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val terms = EwmaWeights.zipWithIndex.map { case (wt, j) =>
      lit(wt) * coalesce(lag(col("cents"), j).over(w), lit(0L)).cast("double")
    }
    daily
      .withColumn("ewma", terms.reduceLeft(_ + _))
      .select(col("event_type"), (col("day") * 86400000000L).as("day_us"),
        col("cents").cast("long").as("cents"), col("ewma"))
  }

  val qEwmaSql: String = {
    val terms = EwmaWeights.zipWithIndex.map { case (wt, j) =>
      // Double.toString is shortest-roundtrip; the E0 suffix makes the
      // DuckDB lexer type it DOUBLE (a plain decimal literal would be
      // DECIMAL and shift the arithmetic off the IEEE path — measured
      // as a last-ulp ewma drift under %.17g formatting)
      val lit = s"${wt}E0"
      s"$lit * CAST(COALESCE(LAG(cents, $j) OVER (PARTITION BY event_type ORDER BY day), 0) AS DOUBLE)"
    }.mkString(" + ")
    s"""WITH p AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |daily AS (
       |  SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS cents
       |  FROM p GROUP BY 1, 2)
       |SELECT event_type, day * 86400000000 AS day_us, cents,
       |  $terms AS ewma
       |FROM daily""".stripMargin
  }

  /** A-stat: equi-DEPTH histogram of purchase values per event type —
    * the planner/profiler statistic q_histogram (equi-width) doesn't
    * give: decile boundaries under skew. NTILE(10) within each type
    * over the total order (cents, event_id) — deterministic across
    * engines. The per-type "partition" is the purchase filter's ONE
    * surviving type, i.e. corpus-linear rows through one sort task —
    * so (round 15) the tile comes from the two-phase distributed range
    * rank ([[graft.operators.RangeRank]], grouped by event_type):
    * boundary sketch → monotone buckets → exact offsets → local
    * row_number, then NTILE is pure (i, n) arithmetic. Round 16:
    * tieSplit=true (row_number-only consumer) — composite
    * (cents, event_id) boundaries keep a degenerate price point (one
    * value at half the purchases) from re-creating a single-task
    * sort. Bit-identical
    * to the window formulation (rank math is exact), so the
    * NTILE-based oracle holds unchanged; PlanShapeSpec pins that no
    * unpartitioned window sort remains. Output: 10 rows per type with
    * bucket count and [min, max] cents.
    */
  def qHistogramEqd(s: SparkSession, d: String): DataFrame = {
    val p = events(s, d).filter(col("event_type") === "purchase")
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .select("event_type", "event_id", "cents")
    graft.operators.RangeRank
      .withRowNumber(p, "cents", asc = true, tiebreak = Seq("event_id"),
        out = "i", nOut = "n_all", group = Seq("event_type"), tieSplit = true)
      .withColumn("tile", graft.operators.RangeRank.ntileExpr("i", "n_all", 10))
      .groupBy("event_type", "tile")
      .agg(count(lit(1)).as("n"), min("cents").as("lo"), max("cents").as("hi"))
  }

  val qHistogramEqdSql: String =
    """WITH p AS (
      |  SELECT event_type, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |tiled AS (
      |  SELECT event_type, cents,
      |    NTILE(10) OVER (PARTITION BY event_type ORDER BY cents, event_id) AS tile
      |  FROM p)
      |SELECT event_type, CAST(tile AS INTEGER) AS tile,
      |  CAST(COUNT(*) AS BIGINT) AS n, MIN(cents) AS lo, MAX(cents) AS hi
      |FROM tiled GROUP BY 1, 2""".stripMargin

  /** A-mon: CUSUM change-point detection over the per-type daily
    * purchase-value series — the classic "did the level shift, and
    * when" monitor next to q_drift_psi (distribution shift) and
    * st_anomaly (outliers). One-sided CUSUM with slack:
    * s_t = max(0, s_{t−1} + x_t − mean − k), k = mean/20, all in
    * BIGINT cents (mean/k by truncating div — nonneg series), so the
    * recursion is integer-EXACT in both engines: Spark walks each
    * type's sorted (day, cents) list in one aggregate HOF (bounded by
    * calendar days, the q_retention compression argument); the oracle
    * replays it as a recursive CTE over day indexes. Output: per type
    * the max cusum and the FIRST day achieving it (strict > keeps the
    * first — mirrored exactly).
    */
  def qChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), expr("us div 86400000000").as("day"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("cents"))
    val g = "GREATEST(0L, acc.s + e.cents - mean - k)"
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("cents")))).as("evs"),
        sum("cents").as("tot"), count(lit(1)).as("n_days"))
      .withColumn("mean", expr("tot div n_days"))
      .withColumn("k", expr("mean div 20"))
      .select(col("event_type"), col("n_days"),
        expr(
          s"""aggregate(evs,
             |  named_struct('s', 0L, 'best', 0L, 'bd', CAST(-1 AS BIGINT)),
             |  (acc, e) -> named_struct(
             |    's', $g,
             |    'best', IF($g > acc.best, $g, acc.best),
             |    'bd', IF($g > acc.best, e.day, acc.bd)),
             |  acc -> named_struct('max_cusum', acc.best,
             |    'change_day_us', IF(acc.bd < 0, CAST(-1 AS BIGINT), acc.bd * 86400000000)))""".stripMargin)
          .as("r"))
      .select(col("event_type"), col("n_days"),
        col("r.max_cusum").as("max_cusum"),
        col("r.change_day_us").as("change_day_us"))
  }

  val qChangepointSql: String =
    """WITH RECURSIVE p AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |daily AS (
      |  SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS cents,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS idx
      |  FROM p GROUP BY 1, 2),
      |params AS (
      |  SELECT event_type, COUNT(*) AS n_days,
      |    CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean,
      |    CAST((SUM(cents) // COUNT(*)) // 20 AS BIGINT) AS k
      |  FROM daily GROUP BY 1),
      |walk AS (
      |  SELECT event_type, 0 AS idx, CAST(0 AS BIGINT) AS s,
      |    CAST(0 AS BIGINT) AS best, CAST(-1 AS BIGINT) AS bd
      |  FROM params
      |  UNION ALL
      |  SELECT w.event_type, d.idx,
      |    GREATEST(0, w.s + d.cents - pr.mean - pr.k),
      |    CASE WHEN GREATEST(0, w.s + d.cents - pr.mean - pr.k) > w.best
      |         THEN GREATEST(0, w.s + d.cents - pr.mean - pr.k) ELSE w.best END,
      |    CASE WHEN GREATEST(0, w.s + d.cents - pr.mean - pr.k) > w.best
      |         THEN d.day ELSE w.bd END
      |  FROM walk w
      |    JOIN daily d ON d.event_type = w.event_type AND d.idx = w.idx + 1
      |    JOIN params pr ON pr.event_type = w.event_type)
      |SELECT w.event_type, CAST(pr.n_days AS BIGINT) AS n_days,
      |  CAST(w.best AS BIGINT) AS max_cusum,
      |  CAST(CASE WHEN w.bd < 0 THEN -1 ELSE w.bd * 86400000000 END AS BIGINT) AS change_day_us
      |FROM walk w JOIN params pr ON pr.event_type = w.event_type
      |WHERE w.idx = pr.n_days""".stripMargin

  /** A-path: top user paths — the length-3 event-type sequences users
    * actually take (the Sankey/path-analysis table; q_markov gives the
    * one-step matrix, this gives the routes). Two lead() taps on the
    * same (us, event_id)-total-ordered user window, one path aggregate;
    * the final top-10 window runs over ≤ |types|³ rows — bounded at
    * any corpus size.
    */
  def qPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events(s, d)
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("path"))))
      .filter(col("rk") <= 10)
      .select(col("rk"), col("path"), col("cnt"))
  }

  val qPathsSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
      |t AS (
      |  SELECT event_type AS t1,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t2,
      |    LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t3
      |  FROM e),
      |c AS (
      |  SELECT t1 || '>' || t2 || '>' || t3 AS path, COUNT(*) AS cnt
      |  FROM t WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1)
      |SELECT CAST(rk AS INTEGER) AS rk, path, CAST(cnt AS BIGINT) AS cnt FROM (
      |  SELECT path, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, path) AS rk
      |  FROM c)
      |WHERE rk <= 10""".stripMargin

  /** A-fraud: Benford first-digit screen over purchase amounts — the
    * classic forensic-accounting test (organic amounts follow
    * log10(1+1/d); fabricated ones don't). First digit via the cents
    * string head (identical across engines, no float log); observed
    * share is one IEEE-exact division; expected shares are nine
    * literals computed once here and interpolated into both plans
    * (the q_ewma literal discipline — E0 suffix so DuckDB types them
    * DOUBLE).
    */
  private[graft] val BenfordExpected: Seq[(Int, Double)] =
    (1 to 9).map(dg => dg -> math.log10(1.0 + 1.0 / dg))

  def qBenford(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val digits = events(s, d).filter(col("event_type") === "purchase")
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
    val expected = BenfordExpected.toDF("digit", "expected")
    val c = digits.groupBy("digit").agg(count(lit(1)).as("cnt"))
    val t = sum("cnt").over(Window.partitionBy())
    c.select(col("digit"), col("cnt"), (col("cnt").cast("double") / t.cast("double")).as("share"))
      .join(broadcast(expected), Seq("digit"))
  }

  val qBenfordSql: String = {
    val exp = BenfordExpected.map { case (dg, e) => s"($dg, ${e}E0)" }.mkString(", ")
    s"""WITH p AS (
       |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |d AS (
       |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
       |  FROM p WHERE cents > 0),
       |c AS (SELECT digit, COUNT(*) AS cnt FROM d GROUP BY 1),
       |ex(digit, expected) AS (VALUES $exp)
       |SELECT c.digit, CAST(c.cnt AS BIGINT) AS cnt,
       |  CAST(c.cnt AS DOUBLE) / CAST(SUM(c.cnt) OVER () AS DOUBLE) AS share,
       |  ex.expected
       |FROM c JOIN ex USING (digit)""".stripMargin
  }

  /** A-ts: day-of-week seasonality profile — the seasonal-index table
    * (observed day-of-week mean vs overall daily mean) every
    * retail/ops dashboard keeps next to the smoother (q_ewma) and the
    * level-shift monitor (q_changepoint). Two tiny aggregates over the
    * daily series; the index is a ratio of integer-exact means —
    * division of BIGINT-derived doubles, IEEE-identical. Day-of-week
    * from epoch days ((day + 4) mod 7: 1970-01-01 was a Thursday) —
    * pure integer math, no calendar functions to disagree on.
    */
  def qSeasonality(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d).filter(col("event_type") === "purchase")
      .groupBy(expr("us div 86400000000").as("day"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("cents"))
    val byDow = daily
      .groupBy(expr("(day + 4) % 7").as("dow"))
      .agg(count(lit(1)).as("n_days"), sum("cents").as("tot"))
    val totC = sum("tot").over(Window.partitionBy())
    val totD = sum("n_days").over(Window.partitionBy())
    byDow.select(col("dow"), col("n_days"), col("tot").cast("long").as("cents"),
      ((col("tot").cast("double") / col("n_days").cast("double")) /
        (totC.cast("double") / totD.cast("double"))).as("seasonal_index"))
  }

  val qSeasonalitySql: String =
    """WITH p AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |daily AS (SELECT day, CAST(SUM(cents) AS BIGINT) AS cents FROM p GROUP BY 1),
      |dw AS (
      |  SELECT (day + 4) % 7 AS dow, COUNT(*) AS n_days, SUM(cents) AS tot
      |  FROM daily GROUP BY 1)
      |SELECT dow, CAST(n_days AS BIGINT) AS n_days, CAST(tot AS BIGINT) AS cents,
      |  (CAST(tot AS DOUBLE) / CAST(n_days AS DOUBLE)) /
      |  (CAST(SUM(tot) OVER () AS DOUBLE) / CAST(SUM(n_days) OVER () AS DOUBLE))
      |    AS seasonal_index
      |FROM dw""".stripMargin

  /** A-exp: two-proportion A/B significance test — users split into
    * variants by a deterministic hash of user_id (the reproducible
    * experiment-assignment convention, same family as q_reservoir's
    * keyed sampling), conversion = "did the user purchase", and the
    * pooled two-proportion z-score decides the experiment. Assignment
    * is md5-based so both engines derive it nibble-for-nibble;
    * conversions/exposures are integer-exact; z is a few IEEE-exact
    * ops (÷, √) on those scalars — full-precision oracle match, the
    * st_anomaly float discipline. One per-user aggregate + a 2-row
    * variant aggregate; output is the experiment read-out table.
    */
  def qAbTest(s: SparkSession, d: String): DataFrame =
    abReadout(events(s, d)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted")))

  /** The experiment read-out over any (user_id, converted 0/1) frame —
    * shared by the batch operator and st_ab_test's streaming
    * conversion-state machine (offline/online parity hashes against
    * the same oracle).
    */
  def abReadout(perUserConv: DataFrame): DataFrame = {
    // first md5 hex nibble of the user id, as its value 0..15 — Spark
    // derives it with conv(hex, 16, 10), the oracle with DuckDB's
    // strpos-over-'123456789abcdef' trick (the simhash convention);
    // both map '0'→0 … 'f'→15, so assignment is nibble-identical
    val perUser = perUserConv
      .withColumn("variant",
        expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 1), 16, 10) AS BIGINT) % 2"))
    val v = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
    val totN = sum("n").over(Window.partitionBy())
    val totConv = sum("conv").over(Window.partitionBy())
    val rate = col("conv").cast("double") / col("n").cast("double")
    val pPool = totConv.cast("double") / totN.cast("double")
    // degenerate experiments (pooled rate 0 or 1 — e.g. every fixture
    // user converts) have zero pooled variance: z is defined 0 rather
    // than dividing by zero (the st_anomaly zero-variance convention)
    val se = sqrt(pPool * (lit(1.0) - pPool) / col("n").cast("double"))
    v.select(col("variant"), col("n").cast("long").as("n"),
      col("conv").cast("long").as("conv"), rate.as("rate"),
      when(se > 0.0, (rate - pPool) / se).otherwise(lit(0.0)).as("z"))
  }

  val qAbTestSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT strpos('123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 AS variant,
      |    converted
      |  FROM u),
      |v AS (SELECT variant, COUNT(*) AS n, SUM(converted) AS conv FROM a GROUP BY 1),
      |withp AS (
      |  SELECT variant, n, conv,
      |    CAST(conv AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
      |    CAST(SUM(conv) OVER () AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS pool
      |  FROM v)
      |SELECT CAST(variant AS BIGINT) AS variant, CAST(n AS BIGINT) AS n,
      |  CAST(conv AS BIGINT) AS conv, rate,
      |  CASE WHEN sqrt(pool * (1.0 - pool) / CAST(n AS DOUBLE)) > 0.0
      |       THEN (rate - pool) / sqrt(pool * (1.0 - pool) / CAST(n AS DOUBLE))
      |       ELSE 0.0 END AS z
      |FROM withp""".stripMargin

  /** A-ltv: cohort LTV curves — q_retention's activity matrix turned
    * into MONEY: per (first-active-week cohort, week offset 0..3) the
    * cohort's cumulative purchase revenue and per-user LTV. Same
    * scale shape as retention (one user_id shuffle compressing each
    * user to its cohort + per-offset purchase cents, bounded by
    * calendar weeks), then a ≤4-row-per-cohort cumulative window.
    * Cents stay BIGINT through the cumsum; ltv is one IEEE division.
    */
  def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).withColumn("wk", expr("us div 604800000000"))
    // cached: the per-user aggregate feeds BOTH the cohort-size table
    // and the cells join — uncached it would re-shuffle events twice
    val perUser = graft.Stage.cached(e.groupBy("user_id")
      .agg(min("wk").as("cohort_wk"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .otherwise(0L)).as("user_cents")))
    val sizes = perUser.groupBy("cohort_wk")
      .agg(count(lit(1)).as("n_users"))
    val cells = e.filter(col("event_type") === "purchase")
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .join(perUser.select("user_id", "cohort_wk"), Seq("user_id"))
      .withColumn("off", col("wk") - col("cohort_wk"))
      .filter(col("off") <= 3)
      .groupBy("cohort_wk", "off")
      .agg(sum("cents").as("cents"))
    val wcum = Window.partitionBy("cohort_wk").orderBy("off")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum("cents").over(wcum).cast("long"))
      .join(sizes, Seq("cohort_wk"))
      .select(col("cohort_wk"), col("off"), col("n_users"),
        col("cum_cents"),
        (col("cum_cents").cast("double") / col("n_users").cast("double"))
          .as("ltv_cents_per_user"))
  }

  val qCohortLtvSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY 1),
      |sizes AS (SELECT cohort_wk, COUNT(*) AS n_users FROM c GROUP BY 1),
      |cells AS (
      |  SELECT c.cohort_wk, e.wk - c.cohort_wk AS off, SUM(e.cents) AS cents
      |  FROM e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.wk - c.cohort_wk <= 3
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort_wk, off,
      |    CAST(SUM(cents) OVER (PARTITION BY cohort_wk ORDER BY off
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      |  FROM cells)
      |SELECT cum.cohort_wk, cum.off, CAST(s.n_users AS BIGINT) AS n_users,
      |  cum.cum_cents,
      |  CAST(cum.cum_cents AS DOUBLE) / CAST(s.n_users AS DOUBLE) AS ltv_cents_per_user
      |FROM cum JOIN sizes s USING (cohort_wk)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_cohort_ltv", qCohortLtv, Some(qCohortLtvSql)),
    QueryDef("q_seasonality", qSeasonality, Some(qSeasonalitySql)),
    QueryDef("q_ab_test", qAbTest, Some(qAbTestSql)),
    QueryDef("q_changepoint", qChangepoint, Some(qChangepointSql)),
    QueryDef("q_paths", qPaths, Some(qPathsSql)),
    QueryDef("q_benford", qBenford, Some(qBenfordSql)),
    QueryDef("q_markov", qMarkov, Some(qMarkovSql)),
    QueryDef("q_rfm", qRfm, Some(qRfmSql)),
    QueryDef("q_ewma", qEwma, Some(qEwmaSql)),
    QueryDef("q_histogram_eqd", qHistogramEqd, Some(qHistogramEqdSql)),
    QueryDef("q_islands", qIslands, Some(qIslandsSql)),
    QueryDef("q_funnel", qFunnel, Some(qFunnelSql)),
    QueryDef("q_retention", qRetention, Some(qRetentionSql)),
    QueryDef("q_attribution", qAttribution, Some(qAttributionSql)),
    QueryDef("q_match_recognize", qMatchRecognize, Some(qMatchRecognizeSql)),
    QueryDef("q_concurrency", qConcurrency, Some(qConcurrencySql)),
    QueryDef("q_reservoir", qReservoir, Some(qReservoirSql)))
}
