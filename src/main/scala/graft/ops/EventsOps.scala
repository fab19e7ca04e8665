package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import QueryPack._

/** Event-time windowing family — SURVEY.md §2.9. The reference is batch
  * with resumable increments (T1-T5); the streaming-native upgrades
  * (tumbling/sliding/session windows, event-time dedup) are expressed here
  * as batch queries over the `events` table so the driver can oracle-check
  * them; `graft.streaming.EventStreams` runs the same logic through
  * Structured Streaming with watermarks (covered by ScalaTest — streaming
  * is not SQL-oracle-expressible).
  *
  * Scale notes: tumbling/sliding buckets come from `window()`, which is a
  * map-side projection + ordinary hash aggregate on (bucket, key) — no
  * per-window state explosion; session windows use Spark's native
  * session_window merge.
  */
object EventsOps extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 10-minute windows per event type.
    "t_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneyRound(sum(decMoney(col("value")))).as("total_value"))
        .select(tsStr(col("window.start")).as("window_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // Sliding 30-minute window, 10-minute slide (each event in 3 windows).
    "t_sliding_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
        .agg(count(lit(1)).as("n"), moneyRound(sum(decMoney(col("value")))).as("total_value"))
        .select(tsStr(col("window.start")).as("window_start"), col("n"), col("total_value"))
        .orderBy(col("window_start"))
    }),

    // Session windows: 30-minute inactivity gap per user.
    "t_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), moneyRound(sum(decMoney(col("value")))).as("total_value"))
        .select(col("user_id"),
          tsStrUs(col("session_window.start")).as("session_start"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // CDC merge (SCD1 upsert + delete): the latest pre-cutoff state per
    // user is the base snapshot; post-cutoff events are the change feed,
    // applied last-wins, with a latest-change 'error' acting as a delete
    // tombstone. One window per side + one full-outer join on the key —
    // the MERGE INTO shape without a table format. At scale both sides
    // shuffle once on user_id and the join is co-partitioned.
    "t_cdc_upsert" -> ((s, d) => {
      val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      def latest(df: DataFrame) =
        df.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1).drop("rk")
      val ev = Tables.events(s, d)
      val base = latest(ev.filter(col("ts") < cutoff))
        .select(col("user_id"), col("ts").as("b_ts"),
          col("event_type").as("b_type"), col("value").as("b_value"))
      val chg = latest(ev.filter(col("ts") >= cutoff))
        .select(col("user_id"), col("ts").as("c_ts"),
          col("event_type").as("c_type"), col("value").as("c_value"))
      base.join(chg, Seq("user_id"), "full_outer")
        .filter(col("c_type").isNull || col("c_type") =!= "error")
        .select(col("user_id"),
          tsStrUs(coalesce(col("c_ts"), col("b_ts"))).as("ts"),
          coalesce(col("c_type"), col("b_type")).as("event_type"),
          coalesce(col("c_value"), col("b_value")).as("value"),
          when(col("c_ts").isNotNull, "update").otherwise("base").as("src"))
        .orderBy(col("user_id"))
    }),

    // Stream-static enrichment: the event fact stream broadcast-joined
    // to a customer→nation dimension, aggregated per nation. Batch form
    // of EventStreams.enrichWithDim (StreamingSpec runs the same logic
    // through an actual stream and asserts parity). The stream side
    // never shuffles for the join — the dim broadcasts.
    "t_stream_static_enrich" -> ((s, d) => {
      val dim = Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      graft.streaming.EventStreams
        .enrichWithDim(Tables.events(s, d), dim, "user_id", "c_custkey")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_events"),
          moneyRound(sum(decMoney(col("value")))).as("total_value"))
        .orderBy(col("n_name"))
    }),

    // Batch form of EventStreams.purchaseClickLeftJoin — the interval
    // left-outer join (every purchase, matched clicks from the preceding
    // hour or a null click side). In streaming the null rows are
    // watermark-deferred; in batch the same plan is a plain range-predicate
    // outer join. At scale both sides shuffle once on user_id and the
    // range predicate evaluates inside the join — no post-filter blowup.
    "t_stream_left_outer" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("click_user"), col("ts").as("click_ts"))
      purchases.join(clicks,
          col("user_id") === col("click_user") &&
            col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
            col("click_ts") <= col("purchase_ts"), "left_outer")
        .select(col("purchase_id"), col("user_id"),
          tsStrUs(col("purchase_ts")).as("purchase_ts"),
          col("click_id"), tsStrUs(col("click_ts")).as("click_ts"))
        .orderBy(col("purchase_id"), coalesce(col("click_id"), lit(-1L)))
    }),

    // Batch form of EventStreams.purchaseClickFullJoin — both unmatched
    // directions survive with null padding. Same single user_id shuffle
    // per side as the left variant.
    "t_stream_full_outer" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("click_user"), col("ts").as("click_ts"))
      purchases.join(clicks,
          col("user_id") === col("click_user") &&
            col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
            col("click_ts") <= col("purchase_ts"), "full_outer")
        .select(col("purchase_id"),
          coalesce(col("user_id"), col("click_user")).as("uid"),
          tsStrUs(col("purchase_ts")).as("purchase_ts"),
          col("click_id"), tsStrUs(col("click_ts")).as("click_ts"))
        .orderBy(coalesce(col("purchase_id"), lit(-1L)),
          coalesce(col("click_id"), lit(-1L)))
    }),

    // Event-time dedup: first event per (user, type) — T1/T2 exactly-once
    // upgrade of the reference's at-least-once ledger (app.js:438-455).
    "t_dedup_first" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          tsStrUs(col("ts")).as("first_ts"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // ORDERED funnel (view → click → purchase): each stage's timestamp
    // is the earliest event of that type STRICTLY AFTER the previous
    // stage — min-aggregate per stage, stage N joins stage N-1 on the
    // user key. At scale every frame is user-keyed, so the three joins
    // co-partition on one shuffle key and each stage's frame is one row
    // per user (the funnels themselves never hold event-sized state).
    "e_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("view_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("click_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          tsStrUs(col("view_ts")).as("first_view"),
          tsStrUs(col("click_ts")).as("first_click"),
          tsStrUs(col("purchase_ts")).as("first_purchase"),
          (lit(1) + when(col("click_ts").isNotNull, 1).otherwise(0)
            + when(col("purchase_ts").isNotNull, 1).otherwise(0))
            .cast("int").as("stage"))
        .orderBy(col("user_id"))
    }),

    // Cohort retention triangle: cohort = the user's first active DAY,
    // cell = distinct users of that cohort active at each day offset.
    // One user-keyed aggregate for cohorts, then a (cohort, offset)
    // distinct-count — the curve every growth dashboard draws.
    "e_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val first = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort_day"))
      ev.join(first, "user_id")
        .select(col("cohort_day"), col("user_id"),
          datediff(to_date(col("ts")), col("cohort_day")).as("day_offset"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Conversion attribution: purchases within ONE HOUR after any view
    // by the same user, deduplicated by purchase id (a purchase after
    // several views still counts once), rolled up to per-user counts
    // and exact-decimal attributed revenue. Both sides are user-keyed —
    // one shuffle key, co-partitioned band join.
    "e_conversion" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      p.join(v, Seq("user_id"))
        .filter(col("view_ts") < col("ts")
          && col("ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("user_id"), col("event_id"), col("value")).distinct()
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_conversions"),
          moneyRound(sum(decMoney(col("value")))).as("attributed_value"))
        .orderBy(col("user_id"))
    }),

    // Last-touch attribution: each converting user's FIRST purchase is
    // credited to the channel (event_type) of the latest event strictly
    // before it. (ts, event_id) is a total order — timestamp collisions
    // break on the id — so both the first-purchase min-struct and the
    // last-touch max-struct are deterministic aggregates, never windows.
    // Users whose first purchase has no prior event credit 'direct'.
    // At scale: every frame is user-keyed (one shuffle key, the join
    // co-partitions), per-user state is ONE struct in partial agg — the
    // classic sort-based sessionize replaced by two hash aggregates.
    "e_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val firstP = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(struct(col("ts"), col("event_id"))).as("fp"))
      val touch = ev.join(firstP, "user_id")
        .filter(struct(col("ts"), col("event_id")) < col("fp"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
          .as("lt"))
      firstP.join(touch, Seq("user_id"), "left")
        .select(coalesce(col("lt.event_type"), lit("direct")).as("channel"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("channel"))
    }),

    // Rate-normalized cohort retention: e_retention's triangle with
    // each cell divided by its cohort's size — the fraction a growth
    // dashboard actually plots — and a deliberately different plan
    // shape: ONE user-keyed aggregate carries
    // both the cohort min and the distinct-day set (bounded by the
    // horizon's day count, so collect_set state is constant-sized per
    // user no matter how many raw events they emit); the explode then
    // makes count(*) per (cohort, offset) already user-distinct. Cohort
    // sizes are a tiny per-day aggregate, explicitly broadcast. No
    // window anywhere; the only wide exchanges are user-keyed and
    // (cohort, offset)-keyed hash aggregates.
    "e_retention_rate" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"),
          collect_set(col("day")).as("days"))
      val sizes = perUser.groupBy(col("cohort_day"))
        .agg(count(lit(1)).as("cohort_n"))
      perUser
        .select(col("cohort_day"), explode(col("days")).as("day"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .join(broadcast(sizes), "cohort_day")
        .select(col("cohort_day"), col("day_offset"), col("n_users"),
          r6(col("n_users").cast("double") / col("cohort_n").cast("double"))
            .as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Sessionization ROLLUP: the w_session_number gaps-and-islands
    // sessions (30-min inactivity, (ts, event_id) total order) reduced
    // to the per-user engagement stats a product dashboard reports —
    // session count, events, mean events/session, mean session seconds,
    // longest session. Durations stay exact BIGINT micros until the one
    // final division (round-6); the windows are user-keyed (bounded
    // frames), both rollups are partial-aggregating hash aggregates on
    // the same user_id shuffle key.
    "e_session_stats" -> ((s, d) => {
      Windows.sessionNumbered(Tables.events(s, d))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_ev"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("dur_us"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_ev")).as("n_events"),
          // UN-rounded on purpose: each average is ONE correctly-rounded
          // IEEE division of exact BIGINTs, bit-identical in both
          // engines — r6 here would INTRODUCE the half-boundary hazard
          // (Spark rounds the shortest decimal rendering, DuckDB the
          // binary value; caught at the sf0.1 gate on a .xxx0175 secs
          // value)
          (sum(col("n_ev")).cast("double") / count(lit(1)))
            .as("avg_session_events"),
          (sum(col("dur_us")).cast("double") /
            (count(lit(1)) * lit(1000000.0))).as("avg_session_secs"),
          max(col("n_ev")).as("max_session_events"))
        .orderBy(col("user_id"))
    }),

    // Datetime-extraction pack (the §2.6 F10 family widened): every
    // field in both engines' shared semantics — Spark dayofweek is
    // Sunday=1 (DuckDB's dayofweek+1); Spark weekday()+1 is ISO dow
    // (DuckDB isodow); weekofyear is ISO week in both.
    "f_datetime_pack" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          year(col("ts")).as("y"), quarter(col("ts")).as("q"),
          month(col("ts")).as("mo"), dayofmonth(col("ts")).as("dom"),
          dayofweek(col("ts")).as("dow"),
          (weekday(col("ts")) + 1).as("iso_dow"),
          weekofyear(col("ts")).as("woy"), dayofyear(col("ts")).as("doy"),
          hour(col("ts")).as("hr"), minute(col("ts")).as("mi"),
          second(col("ts")).as("sec"))
        .orderBy(col("event_id"))
    }),

    // Z-score anomaly flagging per event type: mean/std derived from
    // EXACT decimal sums (the agg_stats convention — both engines
    // divide bit-identical doubles), events with |z| > 2.5 surface.
    // One grouped aggregate broadcast back over the stream — the
    // monitoring query that must not re-sort the corpus.
    "e_anomaly" -> ((s, d) => {
      val st = Tables.events(s, d).groupBy(col("event_type"))
        .agg(sum(decMoney(col("value"))).as("s1"),
          sum(decMoney(col("value")) * decMoney(col("value"))).as("s2"),
          count(lit(1)).as("n"))
        .select(col("event_type"),
          (col("s1").cast("double") / col("n")).as("mean_v"),
          sqrt((col("s2").cast("double")
            - col("s1").cast("double") * col("s1").cast("double") / col("n"))
            / (col("n") - 1)).as("sd_v"))
      Tables.events(s, d).join(broadcast(st), "event_type")
        .withColumn("z", (col("value") - col("mean_v")) / col("sd_v"))
        .filter(abs(col("z")) > 2.5)
        .select(col("event_id"), col("event_type"), col("value"),
          r6(col("z")).as("z_score"))
        .orderBy(col("event_id"))
    }),

    // Behavioral diversity: Shannon entropy of each user's event-type
    // mix, per-term fixed point (round-6 integer space, the
    // ns_char_entropy convention) so libm ln drift cannot reach the
    // per-user sum. Two user-keyed aggregates, no window.
    "e_user_entropy" -> ((s, d) => {
      val cnt = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy(col("user_id")).agg(sum(col("n")).as("nt"))
      val p = col("n").cast("double") / col("nt").cast("double")
      cnt.join(tot, "user_id")
        .select(col("user_id"),
          round(-(p * log(p)) * lit(1e6)).cast("long").as("cfix"),
          col("nt"))
        .groupBy(col("user_id"))
        .agg(max(col("nt")).as("n_events"),
          count(lit(1)).as("n_types"),
          r6(sum(col("cfix")).cast("double") / lit(1e6)).as("type_entropy"))
        .orderBy(col("user_id"))
    }),

    // Trailing-7-day distinct users per active day (rolling MAU/WAU
    // shape): distinct (day, user) pairs band-joined to the tiny
    // day dimension — the dimension broadcasts, so the corpus-sized
    // side never reshuffles per window and no per-day pass exists.
    "e_rolling_users" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = du.select(col("day").as("asof_day")).distinct()
      du.join(broadcast(days),
          col("day") > date_sub(col("asof_day"), 7)
            && col("day") <= col("asof_day"))
        .groupBy(col("asof_day"))
        .agg(countDistinct(col("user_id")).as("users_7d"))
        .orderBy(col("asof_day"))
    }),

    // Fixed-width value histogram (10 × 50-unit buckets): a pure
    // map-side bucket projection + one hash aggregate — the profile
    // query that must NOT need a sort or a pass per bucket.
    "e_hist_value" -> ((s, d) => {
      Tables.events(s, d)
        .select(least(floor(col("value") / 50.0), lit(9.0)).cast("int")
          .as("bucket"), col("value"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          moneyRound(sum(decMoney(col("value")))).as("sum_value"))
        .orderBy(col("bucket"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "t_tumbling_window" ->
      """SELECT strftime(time_bucket(INTERVAL '10 minutes', ts),
        |    '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "t_sliding_window" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS w0, value FROM events),
        |w AS (
        |  SELECT w0 - INTERVAL 20 MINUTES AS wstart, value FROM b
        |  UNION ALL SELECT w0 - INTERVAL 10 MINUTES, value FROM b
        |  UNION ALL SELECT w0, value FROM b)
        |SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  CAST(count(*) AS BIGINT) AS n, CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        |FROM w GROUP BY wstart ORDER BY window_start""".stripMargin,

    "t_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                >= INTERVAL 30 MINUTES
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  CAST(count(*) AS BIGINT) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "t_cdc_upsert" ->
      """WITH b AS (SELECT user_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |c AS (SELECT user_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |bl AS (SELECT user_id, ts AS b_ts, event_type AS b_type,
        |         value AS b_value FROM b WHERE rk = 1),
        |cl AS (SELECT user_id, ts AS c_ts, event_type AS c_type,
        |         value AS c_value FROM c WHERE rk = 1)
        |SELECT user_id,
        |  strftime(coalesce(c_ts, b_ts), '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  coalesce(c_type, b_type) AS event_type,
        |  coalesce(c_value, b_value) AS value,
        |  CASE WHEN c_ts IS NOT NULL THEN 'update' ELSE 'base' END AS src
        |FROM bl FULL OUTER JOIN cl USING (user_id)
        |WHERE c_type IS NULL OR c_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "t_stream_static_enrich" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    // Nullable click_id is kept out of the sort key via coalesce so both
    // engines order null-padded rows identically (Spark sorts nulls
    // first ASC, DuckDB last — -1 sidesteps the difference).
    "t_stream_left_outer" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |  c.event_id AS click_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY purchase_id, coalesce(click_id, -1)""".stripMargin,

    "t_stream_full_outer" ->
      """SELECT p.event_id AS purchase_id,
        |  coalesce(p.user_id, c.user_id) AS uid,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |  c.event_id AS click_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY coalesce(purchase_id, -1), coalesce(click_id, -1)""".stripMargin,

    "t_dedup_first" ->
      """SELECT user_id, event_type, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
        |FROM (SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "e_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS vt FROM events
        |       WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e
        |       JOIN v ON e.user_id = v.user_id
        |       WHERE e.event_type = 'click' AND e.ts > v.vt
        |       GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e
        |       JOIN c ON e.user_id = c.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > c.ct
        |       GROUP BY e.user_id)
        |SELECT v.user_id,
        |  strftime(v.vt, '%Y-%m-%d %H:%M:%S.%f') AS first_view,
        |  strftime(c.ct, '%Y-%m-%d %H:%M:%S.%f') AS first_click,
        |  strftime(p.pt, '%Y-%m-%d %H:%M:%S.%f') AS first_purchase,
        |  CAST(1 + CASE WHEN c.ct IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN p.pt IS NULL THEN 0 ELSE 1 END AS INT) AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |  LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    "e_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |       FROM events GROUP BY user_id)
        |SELECT f.cohort_day,
        |  CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INT)
        |    AS day_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    "e_conversion" ->
      """WITH v AS (SELECT user_id, ts AS vt FROM events
        |       WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id, ts, value FROM events
        |       WHERE event_type = 'purchase'),
        |conv AS (SELECT DISTINCT p.user_id, p.event_id, p.value
        |  FROM p JOIN v ON p.user_id = v.user_id
        |    AND v.vt < p.ts AND p.ts <= v.vt + INTERVAL 1 HOUR)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
        |    AS attributed_value
        |FROM conv GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Attribution replay: row_number emulates the struct min/max with
    // the identical (ts, event_id) total order.
    "e_attribution" ->
      """WITH p AS (SELECT user_id, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |fp AS (SELECT user_id, ts AS fts, event_id AS fid
        |  FROM p WHERE rn = 1),
        |t AS (SELECT e.user_id, e.event_type,
        |    row_number() OVER (PARTITION BY e.user_id
        |                       ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM events e JOIN fp ON e.user_id = fp.user_id
        |  WHERE e.ts < fp.fts OR (e.ts = fp.fts AND e.event_id < fp.fid)),
        |lt AS (SELECT user_id, event_type FROM t WHERE rn = 1)
        |SELECT coalesce(lt.event_type, 'direct') AS channel,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM fp LEFT JOIN lt ON fp.user_id = lt.user_id
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    // Rate replay: DISTINCT (user, day) first so count(*) per
    // (cohort, offset) is user-distinct, exactly like the exploded set.
    "e_retention_rate" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |fu AS (SELECT user_id, min(day) AS cohort_day FROM ev
        |  GROUP BY user_id),
        |sz AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_n
        |  FROM fu GROUP BY cohort_day),
        |r AS (SELECT fu.cohort_day,
        |    CAST(date_diff('day', fu.cohort_day, ev.day) AS INT)
        |      AS day_offset,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM ev JOIN fu USING (user_id) GROUP BY 1, 2)
        |SELECT r.cohort_day, day_offset, n_users,
        |  round(CAST(n_users AS DOUBLE) / cohort_n, 6) + 0 AS retention
        |FROM r JOIN sz ON r.cohort_day = sz.cohort_day
        |ORDER BY r.cohort_day, day_offset""".stripMargin,

    // Session-stats replay: identical 30-min gaps-and-islands window,
    // durations exact BIGINT micros until the final round-6 divisions.
    "e_session_stats" ->
      """WITH g AS (SELECT user_id, event_id, ts,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        |  FROM events),
        |sn AS (SELECT user_id, event_id, ts,
        |    sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM g),
        |p AS (SELECT user_id, session_seq, CAST(count(*) AS BIGINT) AS n_ev,
        |    epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |  FROM sn GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n_ev) AS BIGINT) AS n_events,
        |  CAST(sum(n_ev) AS DOUBLE) / count(*) AS avg_session_events,
        |  CAST(sum(dur_us) AS DOUBLE) / (count(*) * 1000000.0)
        |    AS avg_session_secs,
        |  CAST(max(n_ev) AS BIGINT) AS max_session_events
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    "f_datetime_pack" ->
      """SELECT event_id,
        |  CAST(year(ts) AS INT) AS y, CAST(quarter(ts) AS INT) AS q,
        |  CAST(month(ts) AS INT) AS mo, CAST(dayofmonth(ts) AS INT) AS dom,
        |  CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |  CAST(isodow(ts) AS INT) AS iso_dow,
        |  CAST(weekofyear(ts) AS INT) AS woy,
        |  CAST(dayofyear(ts) AS INT) AS doy,
        |  CAST(hour(ts) AS INT) AS hr, CAST(minute(ts) AS INT) AS mi,
        |  CAST(second(ts) AS INT) AS sec
        |FROM events ORDER BY event_id""".stripMargin,

    "e_anomaly" ->
      """WITH st AS (SELECT event_type,
        |    CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(12,2)) *
        |             CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s2,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type),
        |g AS (SELECT event_type, s1 / n AS mean_v,
        |    sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd_v FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - g.mean_v) / g.sd_v, 6) + 0 AS z_score
        |FROM events e JOIN g ON e.event_type = g.event_type
        |WHERE abs((e.value - g.mean_v) / g.sd_v) > 2.5
        |ORDER BY e.event_id""".stripMargin,

    "e_user_entropy" ->
      """WITH cnt AS (SELECT user_id, event_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS nt
        |  FROM cnt GROUP BY 1),
        |fx AS (SELECT cnt.user_id,
        |    CAST(round(-((CAST(n AS DOUBLE) / CAST(nt AS DOUBLE)) *
        |        ln(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))) * 1e6)
        |      AS BIGINT) AS cfix,
        |    nt
        |  FROM cnt JOIN tot ON cnt.user_id = tot.user_id)
        |SELECT user_id, max(nt) AS n_events,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  round(CAST(sum(cfix) AS BIGINT) / 1e6, 6) + 0 AS type_entropy
        |FROM fx GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e_rolling_users" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |       FROM events),
        |days AS (SELECT DISTINCT day AS asof_day FROM du)
        |SELECT asof_day, CAST(count(DISTINCT user_id) AS BIGINT) AS users_7d
        |FROM days JOIN du ON du.day > asof_day - 7 AND du.day <= asof_day
        |GROUP BY asof_day ORDER BY asof_day""".stripMargin,

    "e_hist_value" ->
      """SELECT CAST(least(floor(value / 50.0), 9.0) AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
        |    AS sum_value
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}
