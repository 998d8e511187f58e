package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables => T}
import graft.functions.Exact

/** Event-time analytics over the `events` table — the batch-parity
  * face of the streaming surface (SURVEY §7.3): tumbling / sliding /
  * session windows, deterministic first-event dedup, JSON prop
  * extraction, SQL surface, as-of join, and range join. The same
  * window/session operators run under Structured Streaming with
  * watermarks in `StreamingEventsSpec` — here each query has a DuckDB
  * oracle so results sit under the hash-match gate.
  *
  * Determinism: window starts/ends are emitted as epoch integers
  * (seconds for hour-aligned starts, microseconds for session bounds) —
  * never raw timestamps; money-ish doubles go through Exact.
  *
  * Scale notes (100 TB): every window groups by (bucket, key) — a plain
  * hash aggregation with map-side partials, no global window; the
  * session query shuffles once on user_id; the as-of join is the
  * union–sort–window algorithm (one shuffle on user_id, no range
  * explosion); the range join broadcasts a 4-row literal dim.
  */
object Events extends QueryPack {

  /** Arrival-lateness table behind the q187 watermark audit AND s24's
    * tuned stream: for each candidate watermark delay, how many events
    * would arrive LATE — event time below the running previous-arrival
    * maximum minus the delay (arrival order = event_id, the producer
    * sequence). The running prefix max uses the q124 band
    * decomposition so no corpus-scale single-partition window exists:
    * per-band prefix-max windows inside 10k-row bands, prior-band
    * offsets via the tiny bands-table window (band width is the knob
    * at scale). Returns (delay_us, n_events, n_dropped). */
  /** Per-arrival prefix-max event time — (event_id, event_type,
    * ts_us, prev_max), band-decomposed (event_id div 10000 bands) so
    * no corpus-grain global window exists; shared by
    * [[watermarkLateness]] (q187/s24/s27's delay tuning) and q265's
    * quarantine manifest. */
  private[operators] def arrivalPrevMax(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = T.events(s, d)
      .select($"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
      .withColumn("band", expr("event_id div 10000"))
    val wb = Window.orderBy($"band").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ev.groupBy($"band").agg(max($"ts_us").as("bmax"))
      .withColumn("prior_max", coalesce(max($"bmax").over(wb), lit(0L)))
      .select($"band", $"prior_max")
    val ww = Window.partitionBy($"band").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.join(broadcast(offsets), Seq("band"))
      .withColumn("in_band_prev", coalesce(max($"ts_us").over(ww), lit(0L)))
      .withColumn("prev_max", greatest($"prior_max", $"in_band_prev"))
      .select($"event_id", $"event_type", $"ts_us", $"prev_max")
  }

  private[operators] def watermarkLateness(s: SparkSession,
                                           d: String): DataFrame = {
    import s.implicits._
    val delays = Seq(60000000L, 300000000L, 600000000L, 3600000000L)
      .toDF("delay_us")
    arrivalPrevMax(s, d).crossJoin(broadcast(delays))
      .groupBy($"delay_us")
      .agg(count(lit(1)).as("n_events"),
        sum(($"prev_max" - $"ts_us" > $"delay_us").cast("long"))
          .as("n_dropped"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // ---- tumbling window (1 h) --------------------------------------
    "q23_tumbling_window" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), Exact.sumMoney($"value").as("sum_value"))
        .select(unix_timestamp($"w.start").as("start_s"), $"event_type", $"n", $"sum_value")
    }),

    // ---- sliding window (2 h window, 1 h slide) ---------------------
    "q24_sliding_window" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(window($"ts", "2 hours", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), Exact.sumMoney($"value").as("sum_value"))
        .select(unix_timestamp($"w.start").as("start_s"), $"event_type", $"n", $"sum_value")
    }),

    // ---- sliding distinct users (DAU-style) -------------------------
    // Exact per-window distinct counting over overlapping windows: the
    // daily/rolling-active-users surface. Each event lands in 4 of the
    // 24h/6h-slide windows; Spark's distinct aggregation pre-reduces to
    // (window, user) partials map-side, so the shuffle carries one row
    // per (window, user), not one per event — the shape that survives
    // when "events" is 100 TB but |windows|×|users| is not.
    "q114_sliding_dau" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(window($"ts", "24 hours", "6 hours").as("w"))
        .agg(countDistinct($"user_id").as("dau"), count(lit(1)).as("n"))
        .select(unix_timestamp($"w.start").as("start_s"), $"dau", $"n")
    }),

    // ---- session window (30 min gap) per user -----------------------
    "q25_session_window" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n"), Exact.sumMoney($"value").as("sum_value"))
        .select($"user_id", unix_micros($"w.start").as("sess_start_us"),
          unix_micros($"w.end").as("sess_end_us"), $"n", $"sum_value")
    }),

    // ---- session engagement metrics (bounce / dwell) ----------------
    // The product-analytics layer ON TOP of q25's sessionization: per
    // user, session count, bounce count (single-event sessions), total
    // dwell time and the busiest session. Dwell is actual activity
    // span (last−first event), recovered from the session_window
    // bounds by subtracting the 30-minute gap padding the window's
    // `end` carries. Shape: the session_window groupBy shuffles once
    // on user_id and the per-user rollup reuses that partitioning —
    // two aggs, one exchange, at any scale.
    "q173_session_metrics" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select($"user_id",
          (unix_micros($"w.end") - unix_micros($"w.start") - 1800000000L)
            .as("dwell_us"), $"n")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when($"n" === 1, 1L).otherwise(0L)).as("n_bounce"),
          sum($"dwell_us").as("total_dwell_us"),
          max($"n").as("max_session_events"))
    }),

    // ---- peak concurrent sessions (sweep line, band-decomposed) -----
    // Capacity planning over the sessionized stream: per hour, the
    // PEAK number of simultaneously open sessions (open = from first
    // event until the 30-minute timeout, i.e. the session_window
    // bounds). Classic sweep line: +1 at each session start, −1 at
    // each end, running level, max per hour. The running sum is
    // BAND-DECOMPOSED (q154's prefix-sum trick): an in-hour window
    // partitioned by hour plus a per-hour offset window over the
    // tiny hour table — no global single-partition window anywhere,
    // so the sweep survives any corpus size. Peak within an hour is
    // the entering level or the best in-hour running level, whichever
    // is higher (ends-only hours peak at entry). Ties at one
    // timestamp process ends before starts (ORDER BY t, d) — the
    // half-open [start, end) interval convention — and tied marks
    // commute under max, so the result is order-deterministic.
    "q176_peak_concurrency" -> ((s, d) => {
      import s.implicits._
      val sess = T.events(s, d)
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select(unix_micros($"w.start").as("s_us"), unix_micros($"w.end").as("e_us"))
      val marks = sess.select($"s_us".as("t"), lit(1L).as("d"))
        .unionAll(sess.select($"e_us".as("t"), lit(-1L).as("d")))
        .withColumn("hour", expr("t div 3600000000"))
      val inHour = Window.partitionBy($"hour").orderBy($"t", $"d")
        .rowsBetween(Window.unboundedPreceding, 0)
      val overHours = Window.orderBy($"hour")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = marks.withColumn("cum_in", sum($"d").over(inHour))
      val peaks = cum.groupBy($"hour")
        .agg(max($"cum_in").as("max_in"), sum($"d").as("hd"))
      peaks
        .withColumn("off", coalesce(sum($"hd").over(overHours), lit(0L)))
        .select(($"hour" * 3600L).as("hour_start_s"),
          ($"off" + greatest(lit(0L), $"max_in")).as("peak_sessions"))
    }),

    // ---- deterministic first-event dedup per (user, type) -----------
    "q26_first_event" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
      T.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id", unix_micros($"ts").as("ts_us"))
    }),

    // ---- JSON prop extraction (array/map/json category) -------------
    "q27_json_props" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .select($"event_type",
          from_json($"props", org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").cast("bigint").as("sum_k"),
          countDistinct($"k").as("n_distinct_k"))
    }),

    // ---- Spark 4 VARIANT semi-structured extraction -----------------
    // The open-schema path q27's from_json can't cover: parse_json
    // ingests props as VARIANT (no schema declared anywhere), typed
    // values come out via variant_get path extraction at query time,
    // and a missing path is a plain NULL through try_variant_get — the
    // shred-on-read model for heterogeneous 100 TB JSON where forcing
    // one StructType up front would drop unknown keys.
    "q111_variant_props" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .select($"event_type",
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"),
          expr("try_variant_get(parse_json(props), '$.missing', 'int')").as("miss"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").cast("bigint").as("sum_k"),
          min($"k").cast("bigint").as("min_k"),
          max($"k").cast("bigint").as("max_k"),
          count($"miss").as("n_miss"))
    }),

    // ---- SQL surface: same text runs on Spark SQL and DuckDB --------
    "q28_sql_surface" -> ((s, d) => {
      T.registerAll(s, d)
      s.sql(Events.sqlSurfaceText)
    }),

    // ---- sequential funnel (view → click → purchase) ----------------
    // The product-analytics funnel as ordered event-time milestones:
    // first view, first click AFTER that view, first purchase AFTER
    // that click, and the stage reached (0–3). Three chained
    // min-over-user windows — each references the previous milestone,
    // all share the user_id partitioning, so the plan pays ONE
    // shuffle on user_id for the whole chain (no ordered sort is
    // needed: min() over an unordered partition). At 100 TB this is
    // the funnel shape that beats per-stage self-joins (3 shuffles)
    // or per-user sequence collection (unbounded rows per user).
    "q81_funnel" -> ((s, d) => {
      import s.implicits._
      val wu = Window.partitionBy($"user_id")
      T.events(s, d)
        .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
        .withColumn("first_view",
          min(when($"event_type" === "view", $"ts_us")).over(wu))
        .withColumn("first_click",
          min(when($"event_type" === "click" && $"ts_us" > $"first_view", $"ts_us")).over(wu))
        .withColumn("first_purchase",
          min(when($"event_type" === "purchase" && $"ts_us" > $"first_click", $"ts_us")).over(wu))
        .groupBy($"user_id")
        .agg(first($"first_view").as("first_view"),
          first($"first_click").as("first_click"),
          first($"first_purchase").as("first_purchase"))
        .select($"user_id", $"first_view", $"first_click", $"first_purchase",
          when($"first_purchase".isNotNull, 3L)
            .when($"first_click".isNotNull, 2L)
            .when($"first_view".isNotNull, 1L)
            .otherwise(0L).as("stage"))
    }),

    // ---- GROUPING SETS (beyond rollup/cube) -------------------------
    "q50_grouping_sets" -> ((s, d) => {
      T.registerAll(s, d)
      s.sql(Events.groupingSetsText)
    }),

    // ---- RECURSIVE CTE (Spark 4 SQL surface): month series ----------
    // The same text runs on Spark SQL and DuckDB (q28's convention):
    // a recursive CTE generates the complete month series between the
    // first and last order (pure INTEGER yyyymm recursion — no date
    // arithmetic, so both engines step identically), LEFT-joined to
    // monthly revenue so zero-order months appear explicitly — the
    // classic gap-filled-calendar recursion every BI layer needs.
    // Scale note: the recursion is O(months) rows and Spark
    // re-evaluates in-loop CTEs per step, so CORPUS-scale work must
    // stay OUT of the loop (here: bounds and revenue are aggregated
    // once, outside) — graph-scale iteration belongs to the native
    // fixpoint operators (q56/q145/q164), not recursive SQL.
    "q170_recursive_series" -> ((s, d) => {
      T.registerAll(s, d)
      s.sql(Events.recursiveSeriesText)
    }),

    // ---- SQL scalar UDFs (CREATE TEMPORARY FUNCTION) ----------------
    // Spark 4's declarative SQL UDF surface: named scalar functions
    // defined IN SQL (no JVM closure — the body inlines into the plan
    // and stays inside whole-stage codegen, unlike a Scala UDF), here
    // composing cents-exact money handling with a tier CASE. The
    // oracle inlines the same bodies, so the gate proves the UDF
    // expansion is semantics-preserving.
    "q171_sql_udf" -> ((s, d) => {
      T.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION order_cents(x DOUBLE)
              |RETURNS BIGINT RETURN CAST(round(x * 100) AS BIGINT)""".stripMargin)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION price_tier(c BIGINT)
              |RETURNS STRING RETURN CASE WHEN c < 5000000 THEN 'low'
              |  WHEN c < 15000000 THEN 'mid' ELSE 'high' END""".stripMargin)
      s.sql("""SELECT price_tier(order_cents(o_totalprice)) AS tier,
              |  count(*) AS n,
              |  CAST(sum(order_cents(o_totalprice)) AS BIGINT) AS rev_c
              |FROM orders GROUP BY 1""".stripMargin)
    }),

    // ---- as-of join: latest prior click for each purchase -----------
    // Scalable shape: union the two event kinds, one shuffle on
    // user_id, carry the last click forward with an ignore-nulls
    // running window — no per-row range scan, no join explosion.
    "q29_asof_join" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      T.events(s, d)
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", $"ts", $"event_id", $"event_type", $"value",
          when($"event_type" === "click", $"event_id").as("click_id"))
        .withColumn("last_click", last($"click_id", ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          $"last_click")
    }),

    // ---- as-of join WITH TOLERANCE: prior click only within 1 h -----
    // q29's as-of semantics plus the tolerance bound every time-series
    // merge tool exposes (pandas merge_asof(tolerance), kdb wj with a
    // window): a purchase matches its latest prior click ONLY if it is
    // at most 1 hour old — a stale click is no attribution signal.
    // Same scalable shape as q29 (one user_id shuffle, carry-forward
    // ignore-nulls window, no range-scan join): the click timestamp
    // rides along and the tolerance is a post-window predicate, so
    // the bound costs nothing extra at any scale.
    "q169_asof_tolerance" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      T.events(s, d)
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", $"ts", $"event_id", $"event_type",
          when($"event_type" === "click", $"event_id").as("click_id"),
          when($"event_type" === "click", unix_micros($"ts")).as("click_us"))
        .withColumn("lc", last($"click_id", ignoreNulls = true).over(w))
        .withColumn("lcu", last($"click_us", ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          when(unix_micros($"ts") - $"lcu" <= 3600000000L, $"lc")
            .as("click_within_1h"),
          when(unix_micros($"ts") - $"lcu" <= 3600000000L,
            unix_micros($"ts") - $"lcu").as("gap_us"))
    }),

    // ---- interval join: purchases within 1 h after a click ----------
    // Equi-join on user_id with a time-interval predicate — the
    // interval-join family. Scale: the equi key carries the shuffle;
    // the interval predicate filters inside the join, so there is no
    // unbounded range explosion (pairs are bounded per user by the
    // 1 h window).
    "q47_interval_join" -> ((s, d) => {
      import s.implicits._
      val clicks = T.events(s, d).filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      val purchases = T.events(s, d).filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"),
          $"value")
      clicks.join(purchases, Seq("user_id"))
        .filter($"purchase_ts" > $"click_ts" &&
          $"purchase_ts" <= $"click_ts" + expr("INTERVAL 1 HOUR"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct($"purchase_id").as("n_purchases"),
          Exact.sumMoney($"value").as("attributed_value"))
    }),

    // ---- rolling event-time features per user -----------------------
    // Time-series feature engineering (the per-entity trailing-window
    // aggregate every behavioral-features pipeline computes): for each
    // event, the sum/count of that user's events in the trailing hour,
    // via a RANGE frame over event-time micros. One shuffle on
    // user_id; the frame never crosses users. Values are int64-
    // quantized (round(v·1024)) so the running sums are exact and
    // order-independent across engines.
    "q68_rolling_user_features" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          expr("CAST(round(value * 1024) AS BIGINT)").as("v_q"))
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
        .rangeBetween(-3600000000L, 0L) // trailing hour, micros
      ev.withColumn("hr_sum_q", sum($"v_q").over(w))
        .withColumn("hr_n", count(lit(1)).over(w).cast("bigint"))
        .select($"event_id", $"user_id", $"hr_sum_q", $"hr_n")
    }),

    // ---- change-interval historization (gaps-and-islands / SCD) -----
    // CDC-log → validity-interval compaction: per user, each run of
    // consecutive equal event_types collapses to one interval row
    // (type, start, end, n) — the slowly-changing-dimension
    // historization step of an ingest pipeline. A change flag via lag,
    // a running sum to number the islands, then one hash agg on
    // (user, island). One shuffle on user_id for the whole chain; the
    // window never crosses users; time compared as epoch micros.
    "q84_change_intervals" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("ts_us"))
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      ev
        .withColumn("chg",
          when(lag($"event_type", 1).over(w).isNull ||
               lag($"event_type", 1).over(w) =!= $"event_type", 1L).otherwise(0L))
        .withColumn("seg", sum($"chg").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"seg")
        .agg(min($"event_type").as("event_type"),
          min($"ts_us").as("start_us"), max($"ts_us").as("end_us"),
          count(lit(1)).as("n_events"))
    }),

    // ---- time-series gap-fill + forward fill ------------------------
    // Regularize an irregular event stream onto an hourly grid: per
    // user, sum the hour's quantized value, generate the user's FULL
    // hour range from its (min,max) span — the grid comes from the
    // tiny spans aggregate via sequence+explode, never from a
    // calendar cross join — left-join the observed hours back, and
    // forward-fill gaps with the last observed value (last_value
    // IGNORE NULLS). Two aggs + one equi-join, all partitioned by
    // user; the fill window never crosses users. The first grid row
    // per user is always observed (the span starts at an observed
    // hour), so the fill never reads an empty frame.
    "q88_gap_fill" -> ((s, d) => {
      import s.implicits._
      val hourly = T.events(s, d)
        .select($"user_id", expr("unix_micros(ts) div 3600000000").as("hr"),
          expr("coalesce(CAST(round(value * 1024) AS BIGINT), CAST(0 AS BIGINT))").as("vq"))
        .groupBy($"user_id", $"hr").agg(sum($"vq").as("hr_vq"))
      val grid = hourly.groupBy($"user_id")
        .agg(min($"hr").as("h0"), max($"hr").as("h1"))
        .select($"user_id", explode(sequence($"h0", $"h1")).as("hr"))
      val w = Window.partitionBy($"user_id").orderBy($"hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hr"), "left")
        .select($"user_id", $"hr",
          last($"hr_vq", ignoreNulls = true).over(w).as("vq_fill"),
          when($"hr_vq".isNull, 1L).otherwise(0L).as("is_gap"))
    }),

    // ---- cohort retention matrix -------------------------------------
    // The classic product-analytics cohort table: users grouped by
    // first-activity week, activity counted per week offset, retention
    // as an exact ppm ratio against the offset-0 cohort size. One
    // shuffle on user_id (the cohort-week window), one agg shuffle on
    // (cohort, offset), and a window over the TINY aggregated matrix —
    // nothing after the first agg scales with the data.
    "q89_cohort_retention" -> ((s, d) => {
      import s.implicits._
      val wu = Window.partitionBy($"user_id")
      val wc = Window.partitionBy($"cohort_wk")
      T.events(s, d)
        .select($"user_id", expr("unix_micros(ts) div 604800000000").as("wk"))
        .withColumn("cohort_wk", min($"wk").over(wu))
        .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("wk_offset"))
        .agg(countDistinct($"user_id").as("n_active"))
        .withColumn("cohort_size",
          max(when($"wk_offset" === 0, $"n_active")).over(wc))
        .select($"cohort_wk", $"wk_offset", $"n_active", $"cohort_size",
          expr("(n_active * 1000000) div cohort_size").as("ret_ppm"))
    }),

    // ---- last-touch revenue attribution -----------------------------
    // Marketing attribution: each purchase credits its full value to
    // the latest STRICTLY-PRECEDING click's channel (the `k` prop of
    // that click), then revenue is rolled up per channel. Same
    // as-of-window shape as q29 (last_value IGNORE NULLS over a
    // trailing frame — one shuffle on user_id, no self-join), plus the
    // channel rollup; purchases with no prior click land in the NULL
    // "unattributed" bucket. Money goes through the exact-cents layer.
    "q92_last_touch" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      T.events(s, d)
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", $"event_type", $"event_id", $"value",
          unix_micros($"ts").as("ts_us"),
          get_json_object($"props", "$.k").cast("long").as("k"))
        .withColumn("attr_k",
          last(when($"event_type" === "click", $"k"), ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .groupBy($"attr_k")
        .agg(count(lit(1)).as("n_purchases"),
          Exact.sumMoney($"value").as("attr_value"))
    }),

    // ---- position-based (U-shaped) attribution ------------------------
    // The third attribution model beside q92 (last-touch) and q268
    // (Markov removal effects): position-based credit — the industry
    // "U-shape" — splits each user's FIRST-purchase value 40/20/40
    // across the click path strictly preceding it: first touch 40%,
    // last touch 40%, middles share the 20% evenly (1 touch → 100%,
    // 2 → 50/50). Credits are exact integer ppm with per-touch
    // floors identical in both engines; pathless conversions land in
    // the NULL "unattributed" bucket at full credit (q92's rule).
    // Shape: one (user)-keyed window for the first purchase + one for
    // path positions — per-user partitions only, never global; the
    // channel rollup is the q92 agg. Money through exact cents.
    "q333_ushape_attribution" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", $"event_type", $"event_id",
          unix_micros($"ts").as("ts_us"),
          get_json_object($"props", "$.k").cast("long").as("k"),
          Exact.cents($"value").as("cents"))
      val firstp = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(min(struct($"ts_us", $"event_id", $"cents")).as("fp"))
        .select($"user_id", $"fp.ts_us".as("pts"),
          $"fp.event_id".as("pid"), $"fp.cents".as("conv_cents"))
      val path = ev.filter($"event_type" === "click")
        .join(firstp, Seq("user_id"))
        .filter($"ts_us" < $"pts" ||
          ($"ts_us" === $"pts" && $"event_id" < $"pid"))
      val wp = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val wn = Window.partitionBy($"user_id")
      val credited = path
        .withColumn("p", row_number().over(wp).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("credit_ppm",
          when($"n" === 1L, 1000000L)
            .when($"n" === 2L, 500000L)
            .when($"p" === 1L || $"p" === $"n", 400000L)
            .otherwise(expr("200000L div (n - 2)")))
        .select($"user_id", $"k", $"credit_ppm",
          expr("conv_cents * credit_ppm div 1000000").as("attr_cents"))
      val unattributed = firstp
        .join(credited.select($"user_id").distinct(),
          Seq("user_id"), "left_anti")
        .select($"user_id", lit(null).cast("long").as("k"),
          lit(1000000L).as("credit_ppm"),
          $"conv_cents".as("attr_cents"))
      credited.unionAll(unattributed)
        .groupBy($"k".as("attr_k"))
        .agg(count(lit(1)).as("n_touches"),
          sum($"credit_ppm").cast("bigint").as("credit_ppm_sum"),
          sum($"attr_cents").cast("bigint").as("attr_cents"))
    }),

    // ---- per-user z-score anomaly flags -----------------------------
    // Anomaly detection without floats: hourly per-user totals, then
    // |z| > 3 expressed as the exact integer predicate
    // (n·x − Σx)² > 9·(n·Σx² − (Σx)²)  — both sides are the z²
    // inequality multiplied through by n²·var, so no division, no
    // sqrt, no float drift. Hours gated on n ≥ 24 observed hours so
    // tiny histories don't flag. One agg shuffle on (user, hr), one
    // window shuffle on user — per-user windows only, never global.
    // At extreme scale the power sums move to decimal(38,0) (q82
    // note); the per-user row counts here keep every product < 2^63.
    "q95_zscore_anomaly" -> ((s, d) => {
      import s.implicits._
      val wu = Window.partitionBy($"user_id")
      T.events(s, d)
        .select($"user_id", expr("unix_micros(ts) div 3600000000").as("hr"),
          expr("CAST(round(value) AS BIGINT)").as("v"))
        .groupBy($"user_id", $"hr").agg(sum($"v").as("x"))
        .withColumn("n", count(lit(1)).over(wu))
        .withColumn("sx", sum($"x").over(wu))
        .withColumn("sx2", sum($"x" * $"x").over(wu))
        .select($"user_id", $"hr", $"x",
          when($"n" >= 24 &&
            ($"n" * $"x" - $"sx") * ($"n" * $"x" - $"sx") >
              lit(9L) * ($"n" * $"sx2" - $"sx" * $"sx"), 1L)
            .otherwise(0L).as("is_anomaly"))
    }),

    // ---- bipartite weight propagation (PageRank-style hop) ----------
    // One power-iteration hop over the user↔channel click graph:
    // every user splits a unit weight (1e6 ppm) equally across the
    // distinct channels it clicked; a channel's score is the sum of
    // its incoming shares. The iterative-graph shape (degree agg →
    // edge join → score agg) that composes to full PageRank; each
    // extra hop is one more broadcast-or-shuffle join on the edge
    // list, never a self-cartesian. Exact integer arithmetic:
    // non-negative numerators, so Spark div == DuckDB //.
    "q96_bipartite_prop" -> ((s, d) => {
      import s.implicits._
      val edges = T.events(s, d)
        .filter($"event_type" === "click")
        .select($"user_id",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .distinct()
      val deg = edges.groupBy($"user_id").agg(count(lit(1)).as("user_deg"))
      edges.join(deg, Seq("user_id"))
        .groupBy($"k")
        .agg(count(lit(1)).as("channel_deg"),
          sum(expr("1000000L div user_deg")).as("score_ppm"))
    }),

    // ---- time-weighted average (TWAP) -------------------------------
    // Each event's value is held until the user's next event; the
    // time-weighted mean weights each value by its holding duration —
    // the irregular-sampling average (financial TWAP / sensor duty
    // cycle) that a plain avg() gets wrong. lead() over the per-user
    // event order produces the interval, then one agg forms
    // Σ(v·dur) div Σ(dur) in exact quantized integers (non-negative,
    // so trunc == floor). One shuffle on user_id shared by the window
    // and the aggregation.
    "q98_twap" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      T.events(s, d)
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
          expr("CAST(round(value * 1024) AS BIGINT)").as("vq"))
        .withColumn("dur_us", lead($"ts_us", 1).over(w) - $"ts_us")
        .filter($"dur_us".isNotNull && $"dur_us" > 0L)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum($"dur_us").as("sum_dur_us"),
          expr("sum(vq * dur_us) div sum(dur_us)").as("twap_q"))
    }),

    // ---- Markov transition matrix -----------------------------------
    // First-order behavioral model: P(next event type | current) from
    // per-user ordered event pairs. lag() forms the transitions (one
    // shuffle on user_id), one hash agg counts the (prev, cur) matrix,
    // and the row-normalizing window runs over the |types|² post-agg
    // rows — the same "heavy lifting below, tiny window above" shape
    // as q97. Probabilities are exact integer ppm (non-negative, so
    // trunc == floor). This is q70's bigram-LM shape on the event
    // stream instead of text.
    "q99_markov_transitions" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      T.events(s, d)
        .select($"user_id", $"event_type", $"event_id", unix_micros($"ts").as("ts_us"))
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("row_total", sum($"n").over(Window.partitionBy($"prev_type")))
        .select($"prev_type", $"event_type", $"n",
          expr("(n * 1000000L) div row_total").as("p_ppm"))
    }),

    // ---- Markov next-event backtest ---------------------------------
    // Does q99's transition model actually predict? The house
    // train/test rule applied to the behavioral model: transitions
    // whose TARGET event lands before the data-derived day midpoint
    // ((min+max) div 2 over observed days) train the matrix; later
    // transitions are scored — predicted next type = the train-count
    // argmax per source type (tie: lexicographically smallest, a total
    // order), accuracy = exact ppm per source type. The per-user lag
    // window is the one corpus-scale pass (q99's shape); the matrix,
    // argmax and scoring run on |types|²-bounded tables. A model that
    // beats the global-mode baseline here earns its place in a
    // next-action system; this fixture's near-uniform chain honestly
    // scores near 1/|types|.
    "q228_markov_backtest" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val tr = T.events(s, d)
        .select($"user_id", $"event_type", $"event_id",
          unix_micros($"ts").as("ts_us"),
          datediff(to_date($"ts"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull)
      val mid = tr.agg(
        expr("(min(day) + max(day)) div 2").as("mid_day"))
      val marked = tr.crossJoin(broadcast(mid))
      val pred = marked.filter($"day" < $"mid_day")
        .groupBy($"prev_type", $"event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy($"prev_type")
        .agg(min(struct((-$"n").as("nn"), $"event_type".as("t"))).as("m"))
        .select($"prev_type", $"m.t".as("predicted"))
      marked.filter($"day" >= $"mid_day")
        .join(pred, Seq("prev_type"), "left")
        .groupBy($"prev_type")
        .agg(count(lit(1)).as("n_test"),
          sum(when($"event_type" === $"predicted", 1L).otherwise(0L))
            .cast("bigint").as("n_correct"),
          max($"predicted").as("predicted"))
        .select($"prev_type", $"predicted", $"n_test", $"n_correct",
          expr("(n_correct * 1000000L) div n_test").as("acc_ppm"))
    }),

    // ---- Holt linear-trend smoothing + forecast ---------------------
    // [Holt, ONR'57] double exponential smoothing over the per-type
    // daily volume series — the level+trend forecaster one step up
    // from q188's naive baselines and q108's single EWMA:
    // l' = (y + 3(l+t)) floordiv 4, t' = (l'−l+3t) floordiv 4
    // (α = β = ¼), forecast_d7 = l + 7t. The trend is SIGNED, so both
    // engines run the HOUSE SHIFTED-NUMERATOR FLOOR (ADVICE r11: the
    // old form leaned on DuckDB 1.0's truncating integer `//`, a
    // version-specific behavior its own docs contradict): adding
    // S = 4e15 (a multiple of 4) makes the numerator non-negative —
    // valid to |numerator| < 4e15, i.e. daily volumes to ~1e15, far
    // past 100 TB — where truncation and floor coincide, then S/4 is
    // subtracted back. The driver fold and the recursive-CTE oracle
    // replay the identical floor trajectory on ANY engine version.
    // Corpus-scale work is ONE (day, type) hash agg; the fold runs on
    // the collected grid — timespan×|types| rows, bounded regardless
    // of corpus size, MECHANICALLY asserted via T.boundedCollect
    // (100 years × 64 types; a per-day recursion in Spark would pay a
    // scheduler round per day). Gap days advance the recurrence one
    // step like observed days (documented: the fixture grid is dense;
    // a sparse deployment would gap-fill first — q88).
    "q223_holt_smoothing" -> ((s, d) => {
      import s.implicits._
      val grid = T.events(s, d)
        .select(datediff(to_date($"ts"), to_date(lit("2024-01-01")))
          .cast("long").as("day"), $"event_type")
        .groupBy($"day", $"event_type").agg(count(lit(1)).as("y"))
      val daily = T.boundedCollect(grid, 36500L * 64L, "q223 daily grid")
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val S = 4000000000000000L // 4e15, multiple of 4
      val rows = daily.groupBy(_._2).toSeq.map { case (tpe, rs) =>
        val ys = rs.sortBy(_._1).map(_._3)
        var l = ys.head
        var t = 0L
        ys.tail.foreach { y =>
          val l2 = (y + 3L * (l + t) + S) / 4L - S / 4L
          t = (l2 - l + 3L * t + S) / 4L - S / 4L
          l = l2
        }
        (tpe, ys.size.toLong, l, t, l + 7L * t)
      }
      rows.sortBy(_._1)
        .toDF("event_type", "n_days", "level", "trend", "forecast_d7")
    }),

    // ---- Fano dispersion index of daily volumes ---------------------
    // Is each event type's arrival process Poisson-like, bursty, or
    // over-regular? The index of dispersion D = var/mean over the
    // per-type DAILY count series — D ≈ 1 for Poisson arrivals, ≫ 1
    // for bursty traffic (the capacity-planning companion to q183's
    // seasonal profile and q108's EWMA): reported as exact floor ppm,
    // fano_ppm = ((n·Σy² − (Σy)²)·1e6) div ((n−1)·Σy), with the
    // squared sums through DECIMAL(38)/HUGEINT (the q209 rule — daily
    // volumes square past int64 at 100 TB). The numerator is the
    // Cauchy–Schwarz variance form, non-negative, so div == // with
    // no shift. Corpus-scale work is ONE (type, day) hash agg; the
    // index runs on the timespan×|types|-bounded grid.
    "q234_dispersion_index" -> ((s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .select(datediff(to_date($"ts"), to_date(lit("2024-01-01")))
          .cast("long").as("day"), $"event_type")
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("y"))
      daily.groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          sum($"y").cast("bigint").as("sum_y"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("sum_y2"))
        .select($"event_type", $"n_days", $"sum_y",
          expr("CAST(CASE WHEN n_days > 1 AND sum_y > 0 THEN " +
            "((CAST(n_days AS DECIMAL(38,0)) * sum_y2 - " +
            "CAST(sum_y AS DECIMAL(38,0)) * sum_y) * 1000000) div " +
            "((CAST(n_days AS DECIMAL(38,0)) - 1) * sum_y) " +
            "ELSE 0 END AS BIGINT)").as("fano_ppm"))
    }),

    // ---- Pettitt changepoint test on daily volumes ------------------
    // [Pettitt, JRSS-C'79] — WHEN did each event type's volume regime
    // shift? The rank-based (distribution-free) changepoint companion
    // to q201's CUSUM: U_t = Σ_{i≤t} Σ_{j>t} sgn(y_i − y_j) over the
    // per-type daily count series, K = max|U_t|, changepoint = the
    // earliest day attaining K. Computed EXACTLY via the doubled-
    // midrank identity U_t = Σ_{i≤t} r2_i − t·(n+1) with r2 = 2·avg
    // rank = 2·cum_before + ties + 1 from the per-type value-band
    // table (the q208 Mann–Whitney decomposition; proven against the
    // brute sgn double sum in RankStatsPropertySpec) — integer-exact
    // under ties, no n² pair join in either engine. Corpus-scale work
    // is ONE (type, day) hash agg; every window below is partitioned
    // per type over the timespan-bounded daily grid. Types with a
    // single observed day have no interior split point and drop out
    // (t < n filters them), identically in both engines.
    "q237_pettitt_changepoint" -> ((s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .select(datediff(to_date($"ts"), to_date(lit("2024-01-01")))
          .cast("long").as("day"), $"event_type")
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("y"))
      val wv = Window.partitionBy($"event_type").orderBy($"y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r2 = daily.groupBy($"event_type", $"y")
        .agg(count(lit(1)).as("nb"))
        .withColumn("cum_le", sum($"nb").over(wv))
        .select($"event_type", $"y",
          (lit(2L) * ($"cum_le" - $"nb") + $"nb" + lit(1L)).as("r2"))
      val wd = Window.partitionBy($"event_type").orderBy($"day")
      val ut = daily.join(r2, Seq("event_type", "y"))
        .withColumn("t", row_number().over(wd).cast("long"))
        .withColumn("s2",
          sum($"r2").over(wd.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy($"event_type")))
        .filter($"t" < $"n")
        .select($"event_type", $"day", $"n",
          ($"s2" - $"t" * ($"n" + lit(1L))).as("u_t"))
      ut.withColumn("k",
          max(abs($"u_t")).over(Window.partitionBy($"event_type")))
        .filter(abs($"u_t") === $"k")
        .groupBy($"event_type")
        .agg(max($"n").cast("bigint").as("n_days"),
          max($"k").cast("bigint").as("k_stat"),
          min($"day").as("cp_day"))
    }),

    // ---- Theil–Sen robust trend of daily volumes --------------------
    // [Theil'50; Sen, JASA'68] — the median-of-pairwise-slopes trend
    // estimator, the outlier-proof companion to q178's least squares
    // (one anomalous traffic day moves OLS, not the pairwise median).
    // Exact: slope_ppm per (day₁, day₂) pair floors via the SHIFTED
    // numerator (+K·Δd before div, −K after; K = 1e14 covers
    // ǀΔyǀ < 1e8·Δd — i.e. up to 100M events/day of delta per day of
    // gap, far past any operating point — while staying int64-safe
    // for 100-year spans: 1e14·36500 + 1e6·(1e8·36500) ≈ 7.3e18 <
    // 2⁶³; ADVICE r12 raised K from 1e12, whose ǀΔyǀ < 1e6·Δd bound
    // was reachable below the documented scale),
    // and the median is the lower weighted median (2·cum ≥ W) over
    // the slope-value band table — the q217 rank rule. Scale shape:
    // the pair join runs on the TIMESPAN-bounded per-type daily grid
    // (n² in days, not corpus; ~180k pairs per type here), keyed on
    // event_type; the corpus contributes ONE (type, day) hash agg.
    "q247_theilsen_trend" -> ((s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .select(datediff(to_date($"ts"), to_date(lit("2024-01-01")))
          .cast("long").as("day"), $"event_type")
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("y"))
      val pairs = daily.toDF("event_type", "d1", "y1")
        .join(daily.toDF("event_type", "d2", "y2"), Seq("event_type"))
        .filter($"d1" < $"d2")
        .select($"event_type",
          expr("((y2 - y1) * 1000000L + 100000000000000L * (d2 - d1)) " +
            "div (d2 - d1) - 100000000000000L").as("sl"))
      val bands = pairs.groupBy($"event_type", $"sl")
        .agg(count(lit(1)).as("b"))
      val wc = Window.partitionBy($"event_type").orderBy($"sl")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bands.withColumn("cum", sum($"b").over(wc))
        .withColumn("w", sum($"b").over(Window.partitionBy($"event_type")))
        .filter($"cum" * 2 >= $"w")
        .groupBy($"event_type")
        .agg(max($"w").cast("bigint").as("n_pairs"),
          min($"sl").as("med_slope_ppm"))
    }),

    // ---- stationary distribution of the event Markov chain ----------
    // The long-run behavioral mix q99's transition matrix implies:
    // π = πP by integer power iteration through the shared fixpoint
    // harness (±1 ppm tolerance, cap 16 — the same successor-pick rule
    // as q212/q220, replicated by the oracle's conv CTE). Every
    // iteration runs on the ≤|types|²-row transition matrix (25 rows
    // here) — the corpus cost is exactly q99's one pass; floor
    // division sheds ≤|types| ppm of mass per step, which the
    // tolerance absorbs. Precondition: every type occurs as both
    // source and target, so the state vector never loses a vertex —
    // ASSERTED, not assumed (ADVICE r11: the fixpoint's inner-join
    // convergence probe would silently drop a source-only or
    // target-only vertex); the check is one action over two
    // |types|-bounded distinct sets.
    "q222_markov_stationary" -> ((s, d) => {
      import s.implicits._
      val m = queries("q99_markov_transitions")(s, d)
        .select($"prev_type".as("f"), $"event_type".as("t"), $"p_ppm")
        .localCheckpoint()
      val srcs = m.select($"f".as("v")).distinct()
      val tgts = m.select($"t".as("v")).distinct()
      require(srcs.except(tgts).unionAll(tgts.except(srcs)).isEmpty,
        "q222: transition matrix has a source-only or target-only type — " +
          "the inner-join convergence probe would drop it from the state vector")
      val nt = m.select($"f").distinct().agg(count(lit(1)).as("n_types"))
      val init = m.select($"f".as("v")).distinct()
        .crossJoin(broadcast(nt))
        .select($"v", expr("1000000L div n_types").as("p"))
      def step(pi: DataFrame): DataFrame =
        m.join(pi.toDF("f", "pf"), "f")
          .groupBy($"t").agg(expr("sum(pf * p_ppm) div 1000000L").as("p"))
          .select($"t".as("v"), $"p")
      Relational.iterateToFixpointPpm(init, 16, tolPpm = 1L)(step)
        .select($"v".as("event_type"), $"p".as("stationary_ppm"))
    }),

    // ---- robust statistics: exact median + MAD ----------------------
    // Outlier-resistant location/spread without floats: the median and
    // the median absolute deviation, both as exact rank arithmetic.
    // med2 = v[(n+1) div 2] + v[(n+2) div 2] is TWICE the interpolated
    // median (integer-exact for any parity); deviations dv = |2v−med2|
    // are in the same doubled units, and mad4 doubles once more — the
    // caller divides by 2/4 at presentation time. VALUE-BAND
    // DECOMPOSED via [[Relational.bandedMedMad2]] (round 12): the old
    // form ranked raw event rows in windows partitioned on the
    // ≤|types|-value key — the q230 single-task-sort class — while
    // the quantized values span a bounded domain, so the cumulative
    // rank selection now runs over the (type, vq) band table only.
    // Identical output, so the oracle replays row_number unchanged.
    "q100_robust_stats" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select($"event_type",
        expr("CAST(round(value * 1024) AS BIGINT)").as("vq"))
      Relational.bandedMedMad2(ev, "event_type", "vq")
    }),

    // ---- range join against a literal tier dim ----------------------
    "q30_range_join" -> ((s, d) => {
      import s.implicits._
      val tiers = Seq(
        ("t1_low", 0.0, 10.0), ("t2_mid", 10.0, 50.0),
        ("t3_high", 50.0, 200.0), ("t4_top", 200.0, 1e9))
        .toDF("tier", "lo", "hi")
      T.events(s, d)
        .join(broadcast(tiers), $"value" >= $"lo" && $"value" < $"hi")
        .groupBy($"tier")
        .agg(count(lit(1)).as("n"), Exact.sumMoney($"value").as("sum_value"))
    }),

    // ---- event-type co-occurrence / lift (market-basket shape) ------
    // Which event types co-occur in the same user's history more than
    // their marginals predict. Scale shape: the corpus is reduced FIRST
    // to distinct (user, type) — one shuffle — and the pair join runs
    // per-user over ≤|types| rows each, so it is |types|²-bounded per
    // user, never corpus×corpus. Marginals and the user count are
    // tiny (≤|types| rows / 1 row) and broadcast. Support is exact
    // integer ppm; lift is left to the consumer as the ppm marginals
    // (avoids the int64 overflow of n_both·n_users·10⁶ at 100 TB).
    "q103_cooccur_lift" -> ((s, d) => {
      import s.implicits._
      val ut = T.events(s, d).select($"user_id", $"event_type").distinct()
      val marg = ut.groupBy($"event_type").agg(count(lit(1)).as("m"))
      val users = ut.select($"user_id").distinct().agg(count(lit(1)).as("n_users"))
      val pairs = ut.toDF("user_id", "a").join(ut.toDF("user_id", "b"), "user_id")
        .filter($"a" < $"b")
        .groupBy($"a", $"b").agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(marg.toDF("a", "m_a")), "a")
        .join(broadcast(marg.toDF("b", "m_b")), "b")
        .crossJoin(broadcast(users))
        .select($"a", $"b", $"n_both",
          expr("(n_both * 1000000L) div n_users").as("support_ppm"),
          expr("(m_a * 1000000L) div n_users").as("a_ppm"),
          expr("(m_b * 1000000L) div n_users").as("b_ppm"))
    }),

    // ---- per-user EWMA via a sequential fold (α = 1/4) --------------
    // Exponentially weighted moving average of per-user charge, in
    // exact integer cents: ewma₀ = x₀, ewmaₜ = (xₜ + 3·ewmaₜ₋₁) div 4.
    // A sequential recurrence has no windowed-SQL form, so it runs as
    // collect-sorted-list + aggregate() fold — the bounded-per-key
    // sequential-compute pattern. All values are non-negative cents,
    // so Spark's truncating `div` equals DuckDB's flooring `//`, and
    // the fold itself is the same left fold as DuckDB list_reduce
    // (first element as init). Scale: state is one user's event list;
    // per-user cardinality is the bounded dimension (for unbounded
    // per-key sequences the same recurrence runs incrementally as s10's
    // mapGroupsWithState — this is the batch form).
    "q108_ewma_fold" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
          expr("CAST(round(value * 100) AS BIGINT)").as("vq"))
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"ts_us", $"event_id", $"vq"))).as("xs"))
        .withColumn("vqs", expr("transform(xs, s -> s.vq)"))
        .select($"user_id",
          size($"vqs").cast("bigint").as("n_events"),
          element_at($"vqs", 1).as("first_vq"),
          expr("aggregate(slice(vqs, 2, size(vqs) - 1), element_at(vqs, 1)," +
            " (acc, x) -> (x + 3L * acc) div 4)").as("ewma_vq"))
    }),

    // ---- per-user type-count map roundtrip (map-function surface) ---
    // Builds the per-user event_type→count map with map_from_entries
    // over collected (type, n) structs, then reads it back out with
    // element_at + map_keys — the map-column API a feature store
    // would use. collect_list order nondeterminism is immaterial:
    // keys are unique per user and lookups are by key. One shuffle
    // on (user, type), then one on user; the map is ≤|types| entries.
    "q104_user_type_map" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
        .groupBy($"user_id")
        .agg(map_from_entries(collect_list(struct($"event_type", $"n"))).as("m"))
        .select($"user_id",
          coalesce(element_at($"m", "click"), lit(0L)).as("n_click"),
          coalesce(element_at($"m", "view"), lit(0L)).as("n_view"),
          coalesce(element_at($"m", "purchase"), lit(0L)).as("n_purchase"),
          size(map_keys($"m")).cast("bigint").as("n_types"))
    }),

    // ---- trimmed mean via histogram cutoffs (robust agg at scale) ---
    // q100's exact median/MAD rank-selects inside per-group windows —
    // exact, but each group partition is a corpus-scale sort at 100 TB.
    // This is the MERGEABLE robust aggregate that replaces it at
    // scale (same trade as q80 vs q57): values reduce to a bounded
    // per-group histogram (500-cent bins) in one narrow agg; the
    // p10/p90 BIN boundaries come off the cumulative counts; the
    // TRIMMED mean (rows outside [lo, hi] are DROPPED, not clamped —
    // winsorizing would clamp them to the cutoff values) then excludes
    // whole bins in a second exact integer aggregate. Trim-by-bin is
    // deterministic, well-defined semantics (error bounded by bin
    // width, like every histogram sketch), and every stage is a
    // map-side-combinable hash agg — no per-group sort anywhere.
    //
    // All arithmetic is integer, on cents SHIFTED by +1e6 before every
    // `div` (the q149 bal_band pattern): Spark's `div` truncates
    // toward zero while DuckDB's `//` floors, so they agree only on
    // non-negative operands. The shift widens the agreement envelope
    // from "values >= 0" to "values >= -$10,000": shifted cents (and
    // therefore every per-group sum(cs) feeding wmean_c) stay
    // non-negative down to value = -1e6 cents, and below THAT bound
    // the engines silently diverge again. Like the int64 headroom
    // note below, this is a documented operating envelope, not a
    // runtime check — a corpus with values under -$10,000 needs the
    // shift re-derived from min(c). Outputs shift back, so results
    // are identical to the unshifted form on non-negative data.
    // int64 headroom: sum(c + 1e6) per group overflows only past
    // ~9e12 rows per event_type.
    "q158_trimmed_mean" -> ((s, d) => {
      import s.implicits._
      val S = 1000000L // divisible by the 500-cent bin width
      val ev = T.events(s, d).select($"event_type",
        graft.functions.Exact.cents($"value").as("c"))
        .withColumn("cs", $"c" + lit(S))
        .withColumn("bin", expr("cs div 500"))
      val hist = ev.groupBy($"event_type", $"bin").agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy($"event_type").orderBy($"bin")
      val cuts = hist
        .withColumn("cum", sum($"cnt").over(wc))
        .withColumn("n", sum($"cnt").over(Window.partitionBy($"event_type")))
        .groupBy($"event_type")
        .agg(max($"n").as("n"),
          min(when($"cum" * 10 >= $"n", $"bin")).as("lo_bin"),
          min(when($"cum" * 10 >= $"n" * 9, $"bin")).as("hi_bin"))
      ev.join(cuts, Seq("event_type"))
        .filter($"bin" >= $"lo_bin" && $"bin" <= $"hi_bin")
        .groupBy($"event_type")
        .agg(max($"n").as("n"), count(lit(1)).as("n_kept"),
          max($"lo_bin" * 500 - S).as("lo_c"),
          max($"hi_bin" * 500 - S).as("hi_c"),
          expr(s"(sum(cs) div count(1)) - ${S}L").as("wmean_c"))
    }),

    // ---- autocorrelation of the daily volume series -----------------
    // Seasonality detection for capacity planning / anomaly baselines:
    // Pearson autocorrelation of daily event counts at lag 1 (day-to-
    // day persistence) and lag 7 (weekly cycle). The 100 TB work is
    // the single date hash agg; everything after runs on the BOUNDED
    // daily series (timespan-in-days rows), so the lag self-join and
    // the power sums are post-agg arithmetic, never a corpus-scale
    // shuffle. Pairs come from an equi-join on day = day + lag (exact
    // calendar alignment — a missing day drops its pairs rather than
    // silently pairing across the gap). Correlation is left as exact
    // integer numerators (q91 convention): r² = cov_num² /
    // (var_a_num · var_b_num), sign = sign(cov_num).
    "q181_autocorr" -> ((s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .select(datediff(to_date($"ts"), to_date(lit("2024-01-01")))
          .cast("long").as("day"))
        .groupBy($"day").agg(count(lit(1)).as("y"))
      val lags = Seq(1L, 7L).toDF("lag")
      daily.crossJoin(broadcast(lags))
        .select($"lag", ($"day" + $"lag").as("day"), $"y".as("a"))
        .join(daily.select($"day", $"y".as("b")), Seq("day"))
        .groupBy($"lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum($"a").as("sum_a"), sum($"b").as("sum_b"),
          sum($"a" * $"b").as("sum_ab"),
          sum($"a" * $"a").as("sum_a2"), sum($"b" * $"b").as("sum_b2"))
        .select($"lag", $"n_pairs", $"sum_a", $"sum_b", $"sum_ab",
          ($"n_pairs" * $"sum_ab" - $"sum_a" * $"sum_b").as("cov_num"),
          ($"n_pairs" * $"sum_a2" - $"sum_a" * $"sum_a").as("var_a_num"),
          ($"n_pairs" * $"sum_b2" - $"sum_b" * $"sum_b").as("var_b_num"))
    }),

    // ---- sequential pattern mining (ordered, windowed) ----------------
    // [Agrawal & Srikant ICDE'95; Pei+ PrefixSpan] q172's frequent
    // triples are UNORDERED baskets; this mines ORDERED behavioral
    // sequences t1 → t2 → t3 within a 24-hour window — "error then
    // purchase then purchase" is a different signal from the same
    // multiset. Support = users with ≥ 1 windowed occurrence
    // (per-user DISTINCT before counting), confidence =
    // sup(t1t2t3)/sup(t1t2) against the same-windowed pair support.
    // Shape: two user-keyed equi self-joins with (ts,id)-order + gap
    // residuals — fan-out bounded by events-per-user-per-day (a
    // session cap at 100 TB), never a cartesian; the pattern space
    // itself is |types|³ = bounded. Top-20 by support, full tie-break.
    "q304_seq_patterns" -> ((s, d) => {
      import s.implicits._
      val gap = 86400000000L // 24 h in µs
      val ev = T.events(s, d)
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
          $"event_id".as("id")).cache() // harness-released (per-query clearCache)
      val a = ev.toDF("u", "t1", "us1", "id1")
      val b = ev.toDF("u", "t2", "us2", "id2")
      val c = ev.toDF("u", "t3", "us3", "id3")
      val p12 = a.join(b, Seq("u"))
        .filter(($"us1" < $"us2" || ($"us1" === $"us2" && $"id1" < $"id2"))
          && $"us2" - $"us1" <= gap)
      val sup2 = p12.select($"u", $"t1", $"t2").distinct()
        .groupBy($"t1", $"t2").agg(count(lit(1)).as("sup2"))
      p12.select($"u", $"t1", $"us1", $"t2", $"us2", $"id2")
        .join(c, Seq("u"))
        .filter(($"us2" < $"us3" || ($"us2" === $"us3" && $"id2" < $"id3"))
          && $"us3" - $"us1" <= gap)
        .select($"u", $"t1", $"t2", $"t3").distinct()
        .groupBy($"t1", $"t2", $"t3").agg(count(lit(1)).as("sup3"))
        .join(sup2, Seq("t1", "t2"))
        .select($"t1", $"t2", $"t3", $"sup3", $"sup2",
          expr("sup3 * 1000000L div sup2").as("conf_ppm"))
        .orderBy($"sup3".desc, $"t1", $"t2", $"t3").limit(20)
    }),

    // ---- Wilson score intervals for daily purchase share -------------
    // [Wilson JASA'27; Brown+ StatSci'01 recommend it over Wald] the
    // PROPORTION-interval member of the estimation family (q324 does
    // rank CIs for medians, q-- bootstrap for means): per arithmetic
    // day-of-week, the purchase share of events with its 95% Wilson
    // interval — the interval that behaves at small n and extreme p
    // where the naive Wald CI collapses. All-integer: z rides as the
    // literal milli pair (z_m = 1960, z²·1e6 = 3 841 600),
    // rad = isqrt(z2·(k(n−k)·1e6 div n + z2 div 4)) via the
    // ±1-corrected exact isqrt (q321), bounds floor through
    // non-negative numerators (Wilson's lower bound is ≥ 0 by
    // construction). One day-grain agg; 7 rows after. The Wilson
    // products ride the q209 DECIMAL(38,0)/HUGEINT template (ADVICE
    // r17: the bare-int64 form wrapped at ~6e6 events per cell via
    // the k(n−k)·1e6 term): headroom is now bounded by the isqrt's
    // ±1 correction staying inside DOUBLE ulp — rad ≈ 1960·√n stays
    // exact past n ≈ 1e12 events per dow cell, comfortably above a
    // 100 TB event log's ~1e11 per cell.
    "q349_wilson_ci" -> ((s, d) => {
      import s.implicits._
      wilsonReport(T.events(s, d)
        .select(expr("((unix_micros(CAST(ts AS TIMESTAMP)) div " +
          "86400000000) + 4) % 7").as("dow"),
          ($"event_type" === "purchase").cast("long").as("p"))
        .groupBy($"dow")
        .agg(count(lit(1)).cast("bigint").as("n_events"),
          sum($"p").cast("bigint").as("n_purch")))
    }),

    // ---- Wald–Wolfowitz runs test (sequence randomness) --------------
    // [Wald & Wolfowitz AMS'40] the RANDOMNESS member of the test
    // family (KW compares groups, MWU ranks, q310 checks counts —
    // none asks "is the ORDER random?"): the daily purchase-share
    // series, signed above/below its median (ties at the median
    // dropped, the standard treatment), and the count of RUNS vs the
    // exact null moments E[R] = 1 + 2n₁n₂/n and
    // Var[R] = 2n₁n₂(2n₁n₂−n)/(n²(n−1)) — a trend or oscillation both
    // show up as too-few/too-many runs. All-integer: moments in
    // milli/micro fixed point (2n₁n₂ ≥ n whenever both signs occur,
    // so every numerator is non-negative), σ by the ±1-corrected
    // exact isqrt (q321's idiom), the one signed z shifted by 100σ.
    // Everything after the day-grain agg is ≤32 rows (time-domain
    // bounded) — the global windows run on the bounded day table.
    "q353_runs_test" -> ((s, d) => {
      import s.implicits._
      runsFromDaily(T.events(s, d)
        .select(datediff(to_date($"ts"), to_date(lit("2024-01-01")))
          .cast("long").as("day"),
          ($"event_type" === "purchase").cast("long").as("p"))
        .groupBy($"day")
        .agg(count(lit(1)).as("n_ev"), sum($"p").as("np")))
    }),

    // ---- conversion-lag percentiles (time-to-convert) ----------------
    // The duration metric the funnel family stops short of: q81 counts
    // WHO converts, this measures HOW LONG conversion takes — per
    // day-of-week of the user's first view (arithmetic dow, the house
    // (epoch_days + 4) mod 7 rule), the p50/p90/mean of first-view →
    // first-subsequent-purchase lag at HOUR grain. Hour grain is the
    // scale discipline: the (dow, lag_hours) band table is bounded by
    // the TIME DOMAIN (≤ ~768 bands for a 32-day fixture), so the
    // rank-locate windows run on bounded rows — never a user-wide
    // sort (q324's rule, by construction instead of decomposition).
    // Ranks: p50 = smallest lag with cum ≥ (n+1) div 2, p90 = cum ≥
    // (9n+9) div 10 — both floors engine-identical. First events are
    // struct-min composite keys (ts, id) so ties are deterministic.
    "q347_time_to_convert" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
          $"event_id".as("id"))
      val fv = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min(struct($"us", $"id")).as("v"))
      val fp = ev.filter($"event_type" === "purchase")
        .join(fv, "user_id")
        .filter($"us" > $"v.us" || ($"us" === $"v.us" && $"id" > $"v.id"))
        .groupBy($"user_id").agg(min(struct($"us", $"id")).as("p"),
          min($"v.us").as("vus"))
      val lags = fp.select(
        expr("((vus div 86400000000) + 4) % 7").as("dow"),
        expr("(p.us - vus) div 3600000000").as("lag_h"))
      val bands = lags.groupBy($"dow", $"lag_h")
        .agg(count(lit(1)).as("c"))
      val wc = Window.partitionBy($"dow").orderBy($"lag_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bands
        .withColumn("cum", sum($"c").over(wc))
        .withColumn("n",
          sum($"c").over(Window.partitionBy($"dow")).cast("bigint"))
        .withColumn("sl",
          sum($"c" * $"lag_h").over(Window.partitionBy($"dow"))
            .cast("bigint"))
        .groupBy($"dow")
        .agg(max($"n").as("n_converted"),
          min(when($"cum" >= expr("(n + 1) div 2"), $"lag_h"))
            .cast("bigint").as("p50_hours"),
          min(when($"cum" >= expr("(9 * n + 9) div 10"), $"lag_h"))
            .cast("bigint").as("p90_hours"),
          max(expr("sl div n")).cast("bigint").as("mean_hours"))
    }),

    // ---- expected calibration error of a propensity baseline ---------
    // [Naeini+ AAAI'15 ECE] the calibration audit q277's isotonic fit
    // presupposes: a baseline propensity model (per-user purchase
    // share over days 0–14 in ppm) scored against the day-15 outcome
    // (did the user purchase that day?), binned into five fixed
    // 200k-ppm bins. The gap algebra needs ONE floor per bin:
    // n_b·|p̄_b − ȳ_b| = |Σpred_b − n_pos_b·10⁶|, so
    // ECE = Σ_b |Σpred_b − n_pos_b·10⁶| div N exactly. The report
    // (reliability diagram as a table + the one-number ECE) shows the
    // baseline's miscalibration honestly — per-event share
    // systematically UNDER-predicts the daily-outcome rate. Two
    // user-grain aggs + a 5-row bin agg; nothing corpus-scale after.
    "q306_ece_calibration" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"user_id", $"event_type",
          datediff(to_date($"ts"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
      val pred = ev.filter($"day" < 15L)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_ev"),
          sum(($"event_type" === "purchase").cast("long")).as("n_p"))
        .select($"user_id", expr("n_p * 1000000L div n_ev").as("pred_ppm"))
      val outc = ev.filter($"day" === 15L && $"event_type" === "purchase")
        .select($"user_id").distinct().withColumn("hit", lit(1L))
      val bins = pred.join(outc, Seq("user_id"), "left")
        .select(least(expr("pred_ppm div 200000"), lit(4L)).as("bin"),
          $"pred_ppm", coalesce($"hit", lit(0L)).as("y"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"),
          sum($"pred_ppm").cast("bigint").as("sum_pred"),
          sum($"y").cast("bigint").as("n_pos"))
      val tot = bins.agg(sum($"n").cast("bigint").as("nn"),
        sum(abs($"sum_pred" - $"n_pos" * lit(1000000L))).cast("bigint")
          .as("dev"))
      bins.crossJoin(broadcast(tot))
        .select($"bin", $"n",
          expr("sum_pred div n").as("avg_pred_ppm"),
          expr("n_pos * 1000000L div n").as("obs_ppm"),
          expr("abs(sum_pred - n_pos * 1000000L) div n").as("gap_ppm"),
          expr("dev div nn").as("ece_ppm"))
    }),

    // ---- Haar wavelet sketch of the daily purchase series ------------
    // [Haar 1910; Matias+ SIGMOD'98 wavelet synopses] the time-series
    // compression sketch next to q272's HLL bank: the 32-day purchase
    // series decomposed into 31 UNNORMALIZED Haar detail coefficients
    // + 1 scaling sum — sums and differences only, so every
    // coefficient is EXACT int64 (the classic /2 form loses parity
    // bits). No iteration: coefficient (l, i) = Σ sign·x where the
    // sign is a pure function of the day's bits (day div 2^(l−1) mod
    // 2), so all 6 levels come out of ONE explode + ONE hash agg over
    // the 32-row grid. Top-8 by |coef| is the synopsis; each
    // coefficient's energy contribution c²/2^l (in milli, floored
    // identically) makes retained_ppm the compression-quality number
    // — 8 of 32 coefficients hold ~99% of the energy here, which is
    // the wavelet synopsis pitch in one row. Corpus-scale work = the
    // daily hash agg; everything after is 32-row-bounded.
    "q299_haar_sketch" -> ((s, d) => {
      import s.implicits._
      haarReport(T.events(s, d).filter($"event_type" === "purchase")
        .select(datediff(to_date($"ts"), to_date(lit("2024-01-01")))
          .cast("long").as("day"))
        .groupBy($"day").agg(count(lit(1)).as("x")))
    })) ++ queriesTail

  /** q299's Haar fold from a (day, x) daily frame — factored so s54
    * can run the identical synopsis on merged streamed partials
    * (Streams.scala), exactly the shapeReport/sprtReport pattern. */
  /** q349's Wilson report from per-cell (dow, n_events, n_purch)
    * counts — factored so the batch query and the s55 streaming
    * monitor render the SAME expressions (the haarReport rule: if the
    * batch twin's scoring changes, the monitor moves with it instead
    * of silently drifting until the oracle gate fails). Products ride
    * the q209 DECIMAL(38,0) template; see q349's scaladoc for the
    * headroom argument. */
  private[operators] def wilsonReport(cells: DataFrame): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    cells
      .withColumn("ss", expr(
        "CAST(3841600 AS DECIMAL(38,0)) * " +
          "(CAST(n_purch AS DECIMAL(38,0)) * (n_events - n_purch) " +
          "* 1000000 div n_events + 960400)"))
      .withColumn("y0", expr("CAST(sqrt(CAST(ss AS DOUBLE)) AS BIGINT)"))
      .withColumn("rad", expr(
        "CASE WHEN CAST(y0 AS DECIMAL(38,0)) * y0 > ss THEN y0 - 1 " +
          "WHEN CAST(y0 + 1 AS DECIMAL(38,0)) * (y0 + 1) <= ss " +
          "THEN y0 + 1 ELSE y0 END"))
      .select($"dow", $"n_events", $"n_purch",
        expr("CAST(n_purch AS DECIMAL(38,0)) * 1000000 div n_events")
          .as("rate_ppm"),
        expr("(CAST(n_purch AS DECIMAL(38,0)) * 1000000 + 1920800 - rad)" +
          " * 1000000 div (CAST(n_events AS DECIMAL(38,0)) * 1000000 " +
          "+ 3841600)").as("wilson_lo_ppm"),
        expr("(CAST(n_purch AS DECIMAL(38,0)) * 1000000 + 1920800 + rad)" +
          " * 1000000 div (CAST(n_events AS DECIMAL(38,0)) * 1000000 " +
          "+ 3841600)").as("wilson_hi_ppm"))
  }

  /** q353's full median → sign → runs chain from the (day, n_ev, np)
    * day table — the day counts are linear, so the s56 monitor feeds
    * this the summed per-batch partials and the batch query its
    * one-shot day agg; everything below runs on ≤|days| rows. */
  private[operators] def runsFromDaily(dayCounts: DataFrame): DataFrame = {
    val s = dayCounts.sparkSession
    import s.implicits._
    val daily = dayCounts
      .select($"day", expr("np * 1000000 div n_ev").as("x"))
    val med = daily
      .withColumn("rn", row_number().over(Window.orderBy($"x", $"day")))
      .withColumn("n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .agg((min(when($"rn" === expr("(n + 1) div 2"), $"x")) +
        min(when($"rn" === expr("(n + 2) div 2"), $"x")))
        .cast("bigint").as("med2"))
    runsReport(daily.crossJoin(broadcast(med))
      .filter($"x" * 2 =!= $"med2")
      .select($"day", when($"x" * 2 > $"med2", 1L).otherwise(-1L).as("sg")))
  }

  /** q353's runs-test report from the signed (day, sg) series' global
    * fold — factored for the s56 streaming monitor (same rule as
    * [[wilsonReport]]). Input: one row per kept day, sg ∈ {−1, +1}. */
  private[operators] def runsReport(signed: DataFrame): DataFrame = {
    val s = signed.sparkSession
    import s.implicits._
    signed
      .withColumn("prev", lag($"sg", 1).over(Window.orderBy($"day")))
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        sum(($"sg" === 1L).cast("long")).cast("bigint").as("n_above"),
        sum(($"sg" === -1L).cast("long")).cast("bigint").as("n_below"),
        (sum(($"prev".isNotNull && $"sg" =!= $"prev").cast("long")) + 1L)
          .cast("bigint").as("r_runs"))
      .select($"n_days", $"n_above", $"n_below", $"r_runs",
        expr("1000 + (2000 * n_above * n_below) div (n_above + n_below)")
          .as("er_milli"),
        expr("(2 * n_above * n_below * " +
          "(2 * n_above * n_below - (n_above + n_below)) * 1000000) " +
          "div ((n_above + n_below) * (n_above + n_below) * " +
          "(n_above + n_below - 1))").as("var_micro"))
      .withColumn("y0",
        expr("CAST(sqrt(CAST(var_micro AS DOUBLE)) AS BIGINT)"))
      .withColumn("sigma_milli", expr(
        "CASE WHEN y0 * y0 > var_micro THEN y0 - 1 " +
          "WHEN (y0 + 1) * (y0 + 1) <= var_micro THEN y0 + 1 " +
          "ELSE y0 END"))
      .select($"n_days", $"n_above", $"n_below", $"r_runs",
        $"er_milli", $"var_micro",
        expr("CASE WHEN var_micro = 0 THEN 0L ELSE " +
          "((r_runs * 1000 - er_milli + 100 * sigma_milli) * 1000) " +
          "div sigma_milli - 100000 END").as("z_milli"))
  }

  private[operators] def haarReport(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    val grid = s.range(0L, 32L).select($"id".as("day"))
      .join(daily, Seq("day"), "left")
      .select($"day", coalesce($"x", lit(0L)).as("x"))
    val lv = grid.select($"x", explode(array((1 to 6).map { l =>
        if (l == 6)
          struct(lit(6L).as("l"), lit(0L).as("i"), lit(1L).as("sgn"))
        else
          struct(lit(l.toLong).as("l"),
            expr(s"day div ${1L << l}").as("i"),
            (lit(1L) - lit(2L) *
              expr(s"(day div ${1L << (l - 1)}) % 2")).as("sgn"))
      }: _*)).as("p"))
      .select($"p.l".as("l"), $"p.i".as("i"), ($"p.sgn" * $"x").as("sx"))
    val coefs = lv.groupBy($"l", $"i")
      .agg(sum($"sx").cast("bigint").as("c"))
      .select($"l", $"i", $"c",
          expr("c * c * 1000L div (CASE WHEN l = 6 THEN 32L " +
            "ELSE shiftleft(1L, CAST(l AS INT)) END)").as("contrib_milli"))
        .cache() // harness-released (per-query clearCache)
      val tot = coefs.agg(sum($"contrib_milli").cast("bigint")
        .as("total_milli"))
      val top = coefs.orderBy(abs($"c").desc, $"l", $"i").limit(8).cache() // harness-released (per-query clearCache)
      val kept = top.agg(sum($"contrib_milli").cast("bigint")
        .as("kept_milli"))
      top.crossJoin(broadcast(tot)).crossJoin(broadcast(kept))
        .select($"l".as("lvl"), $"i".as("pos"), $"c".as("coef"),
          $"contrib_milli",
          expr("kept_milli * 1000000L div total_milli").as("retained_ppm"))
  }

  private def queriesTail: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- SAX symbolization + nearest-motif neighbor -------------------
    // [Lin+ DMKD'07] the symbolic time-series representation that
    // makes series COMPARABLE as strings: each event type's 30-day
    // count series → PAA (6 segments of 5 days, exact integer segment
    // sums) → rank-quartile symbols (ntile(4) over (segsum, seg) —
    // the rank-based discretization avoids z-normalization's floats
    // entirely and is identical in both engines) → a 6-char SAX word
    // per type. The report pairs each type with its nearest neighbor
    // by word Hamming distance (ties to the smaller type name via
    // struct-min) — "error tracks signup" is the kind of
    // cross-stream motif this surfaces. Corpus-scale work = one
    // (type, day) hash agg; the word table is |types| rows and the
    // pair join runs on it alone.
    "q300_sax_motifs" -> ((s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .select($"event_type",
          datediff(to_date($"ts"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("x"))
      val grid = daily.select($"event_type").distinct()
        .crossJoin(s.range(0L, 30L).select($"id".as("day")))
        .join(daily, Seq("event_type", "day"), "left")
        .select($"event_type", $"day", coalesce($"x", lit(0L)).as("x"))
      val paa = grid.groupBy($"event_type", expr("day div 5").as("seg"))
        .agg(sum($"x").cast("bigint").as("segsum"))
      val wq = Window.partitionBy($"event_type").orderBy($"segsum", $"seg")
      val sym = paa.withColumn("qq",
        (ntile(4).over(wq) - 1).cast("long"))
      val word = sym.groupBy($"event_type")
        .agg(expr("array_join(transform(sort_array(" +
          "collect_list(struct(seg, qq))), s -> CAST(s.qq AS STRING)), '')")
          .as("sax_word"))
        .cache() // harness-released (per-query clearCache)
      val ham = (1 to 6).map(i =>
        (substring($"wa", i, 1) =!= substring($"wb", i, 1)).cast("long"))
        .reduce(_ + _)
      val pairs = word.toDF("ta", "wa")
        .join(word.toDF("tb", "wb"), $"ta" =!= $"tb")
        .select($"ta", $"tb", ham.as("hamming"))
      val nn = pairs.groupBy($"ta")
        .agg(min(struct($"hamming", $"tb")).as("mm"))
      word.join(nn, $"event_type" === $"ta")
        .select($"event_type", $"sax_word", $"mm.tb".as("nn_type"),
          $"mm.hamming".as("hamming"))
    }),

    // ---- hour-of-week seasonal intensity profile --------------------
    // The capacity-planning / anomaly-baseline companion to q181:
    // event volume and distinct-user reach per (day-of-week, hour)
    // cell, with each cell's ppm share of its weekday. Day-of-week is
    // derived ARITHMETICALLY — (epoch_days + 4) mod 7, 0 = Sunday —
    // because Spark's dayofweek (1=Sun) and DuckDB's (0=Sun) disagree
    // by convention; integer epoch math is identical in both engines
    // (timestamps are UTC session-wide). One corpus-scale hash agg on
    // the 168-cell key (plus the countDistinct expand); the share
    // window runs post-agg over ≤ 24 rows per weekday.
    "q183_seasonal_profile" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"dow")
      T.events(s, d)
        .select(pmod(datediff(to_date($"ts"), to_date(lit("1970-01-01")))
            .cast("long") + 4, lit(7)).as("dow"),
          hour($"ts").cast("long").as("hr"), $"user_id")
        .groupBy($"dow", $"hr")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"))
        .withColumn("day_total", sum($"n_events").over(w))
        .select($"dow", $"hr", $"n_events", $"n_users",
          expr("n_events * 1000000L div day_total").as("share_ppm"))
    }),

    // ---- watermark-delay lateness audit -----------------------------
    // The measurement that should precede every `withWatermark` choice
    // (s04/s22 use 10 minutes): for candidate delays D, what fraction
    // of events would arrive LATE — event time below the watermark
    // high-water mark minus D at their arrival position (arrival order
    // = event_id, the producer sequence). The running previous-arrival
    // maximum is computed with the q124 band decomposition so no
    // corpus-scale single-partition window exists: per-band prefix max
    // windows inside 10k-row bands, prior-band offsets via the tiny
    // bands-table window (band width is the knob — widen it at scale
    // to keep the bands table broadcastable). The 4-row delay table
    // then crosses the per-event lateness into one ppm report.
    "q187_watermark_audit" -> ((s, d) =>
      watermarkLateness(s, d)
        .withColumn("drop_ppm", expr("n_dropped * 1000000L div n_events"))),

    // ---- seasonal-naive forecast backtest ---------------------------
    // The baseline every volume forecast must beat, evaluated the way
    // a backtest would: predict each day's count from lag-1 (naive
    // persistence) and lag-7 (seasonal naive — q181 found the weekly
    // cycle), score both models per event_type with exact integer
    // absolute error and WAPE (Σ|err| as ppm of Σactual; integer,
    // non-negative, trunc == floor). The corpus-scale work is one
    // (day, type) hash agg; the model×lag alignment join runs on the
    // bounded post-agg daily grid. A day missing its lag-day drops out
    // of that model's evaluation rather than fabricating a forecast.
    "q188_seasonal_backtest" -> ((s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .select(datediff(to_date($"ts"), to_date(lit("2024-01-01")))
          .cast("long").as("day"), $"event_type")
        .groupBy($"day", $"event_type").agg(count(lit(1)).as("y"))
      val models = Seq(("naive1", 1L), ("seasonal7", 7L)).toDF("model", "lag")
      daily.crossJoin(broadcast(models))
        .select($"model", $"event_type", ($"day" + $"lag").as("day"),
          $"y".as("yhat"))
        .join(daily, Seq("day", "event_type"))
        .groupBy($"model", $"event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(abs($"y" - $"yhat")).as("abs_err"),
          sum($"y").as("actual"))
        .withColumn("wape_ppm", expr("abs_err * 1000000L div actual"))
    }),

    // ---- Kaplan–Meier user retention curve --------------------------
    // Survival analysis of user churn [Kaplan & Meier, JASA'58]: churn
    // day = each user's LAST event day; users last seen on the final
    // observed day are right-CENSORED (still active — they hold the
    // at-risk set but never count as churn). The KM product
    // S(t) = Π (1 − d_t/n_t) is a sequential floor-product (each step
    // surv' = surv·(n_t − d_t) div n_t, non-negative → Spark div ==
    // DuckDB //), which has no windowed form — it folds via
    // aggregate() over the BOUNDED day grid (q108's
    // sequential-recurrence pattern; the grid is timespan rows, never
    // corpus rows). Corpus-scale work is one user-keyed max() agg; the
    // at-risk counts come off a prefix sum over the grid.
    "q194_kaplan_meier" -> ((s, d) => {
      import s.implicits._
      val lastd = T.events(s, d)
        .select($"user_id",
          datediff(to_date($"ts"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .groupBy($"user_id").agg(max($"day").as("last_day"))
      val tot = lastd.agg(max($"last_day").as("max_day"),
        count(lit(1)).as("n_users"))
      val grid = lastd.crossJoin(broadcast(tot))
        .groupBy($"last_day".as("day"))
        .agg(count(lit(1)).as("n_last"),
          sum(when($"last_day" < $"max_day", 1L).otherwise(0L))
            .as("n_churn"))
      val wPrev = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ar = grid.crossJoin(broadcast(tot.select($"n_users")))
        .withColumn("n_at_risk",
          $"n_users" - coalesce(sum($"n_last").over(wPrev), lit(0L)))
        .select($"day", $"n_churn", $"n_at_risk")
      ar.agg(array_sort(collect_list(
          struct($"day", $"n_churn", $"n_at_risk"))).as("xs"))
        .select(explode(expr(
          """aggregate(xs,
            |  struct(CAST(1000000 AS BIGINT) AS surv,
            |    CAST(array() AS
            |      ARRAY<STRUCT<day: BIGINT, n_at_risk: BIGINT,
            |        n_churn: BIGINT, surv_ppm: BIGINT>>) AS out),
            |  (acc, x) -> struct(
            |    (acc.surv * (x.n_at_risk - x.n_churn)) div x.n_at_risk
            |      AS surv,
            |    array_append(acc.out, struct(x.day AS day,
            |      x.n_at_risk AS n_at_risk, x.n_churn AS n_churn,
            |      (acc.surv * (x.n_at_risk - x.n_churn)) div x.n_at_risk
            |        AS surv_ppm)) AS out),
            |  acc -> acc.out)""".stripMargin)).as("r"))
        .select($"r.day", $"r.n_at_risk", $"r.n_churn", $"r.surv_ppm")
    }),

    // ---- late-data quarantine under adversarial arrival -------------
    // The q187 lateness audit is measured on the FRIENDLY arrival
    // order (event_id — which this fixture delivers with ZERO
    // disorder, which is why s24's zero-loss rule lands on the
    // smallest candidate). This is the STRESS companion a pipeline
    // runs before trusting that number: replay the same events under
    // a deterministic ADVERSARIAL shuffle (arrival = content-hash
    // order — the worst realistic case of a multi-source backfill
    // interleaving history with live data) and file the quarantine
    // manifest per candidate delay and event type: how many events
    // drop, the first offending id, the worst lateness — the itemized
    // evidence for why a backfill must NOT share the live stream's
    // watermark. Scale shape: the prefix max over the shuffled order
    // is band-decomposed on the hash's high bits (h60 div 2⁵⁰ —
    // monotone in the arrival key, ≤1024 bands, so no corpus-grain
    // global window); the 4-row delay table broadcasts (q187's
    // shape); only quarantined rows reach the aggregate.
    "q265_late_quarantine" -> ((s, d) => {
      import s.implicits._
      graft.GraftExtensions.ensureRegistered(s)
      val ev = T.events(s, d)
        .select($"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
        .withColumn("a", graft.functions.PortableHash.h60($"event_id"))
        .withColumn("band", expr("a div 1125899906842624")) // 2^50
      val wb = Window.orderBy($"band")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = ev.groupBy($"band").agg(max($"ts_us").as("bmax"))
        .withColumn("prior_max", coalesce(max($"bmax").over(wb), lit(0L)))
        .select($"band", $"prior_max")
      val ww = Window.partitionBy($"band").orderBy($"a", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val withPrev = ev.join(broadcast(offsets), Seq("band"))
        .withColumn("in_band_prev", coalesce(max($"ts_us").over(ww), lit(0L)))
        .withColumn("prev_max", greatest($"prior_max", $"in_band_prev"))
      val delays = Seq(60000000L, 300000000L, 600000000L, 3600000000L)
        .toDF("delay_us")
      withPrev.crossJoin(broadcast(delays))
        .filter($"prev_max" - $"ts_us" > $"delay_us")
        .groupBy($"delay_us", $"event_type")
        .agg(count(lit(1)).as("n_quarantined"),
          min($"event_id").as("first_event_id"),
          max($"prev_max" - $"ts_us").as("max_lateness_us"))
    }),

    // ---- per-user inter-arrival burstiness (CV²) --------------------
    // Is a user's activity memoryless or bursty? The squared
    // coefficient of variation of inter-event gaps — CV² ≈ 1 for a
    // Poisson user, ≫ 1 for burst-and-silence behavior (the
    // behavioral-regularity companion to q234's Fano index, which
    // measures the same dispersion on COUNTS). Rational and exact:
    // CV² = Var/mean² = n·Σg²/(Σg)² − 1, products in DECIMAL(38)/
    // HUGEINT (gaps are µs over a month ≈ 2.6e12; squares ~7e24).
    // Scale shape: ONE lag window per user (high-cardinality
    // partition key — the q68/q84 per-key window rule) + one
    // user-keyed hash agg; nothing global.
    "q258_interarrival_cv2" -> ((s, d) => {
      import s.implicits._
      val wlag = Window.partitionBy($"user_id").orderBy($"tu", $"event_id")
      T.events(s, d)
        .select($"user_id", unix_micros($"ts").as("tu"), $"event_id")
        .withColumn("gap", $"tu" - lag($"tu", 1).over(wlag))
        .filter($"gap".isNotNull)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum($"gap").cast("bigint").as("sg"),
          sum(expr("CAST(gap AS DECIMAL(38,0)) * gap")).as("sg2"))
        .select($"user_id", $"n_gaps",
          expr("sg div n_gaps").as("mean_gap_us"),
          expr("CAST(CASE WHEN sg > 0 AND n_gaps > 1 THEN " +
            "(CAST(n_gaps AS DECIMAL(38,0)) * sg2 * 1000000) div " +
            "(CAST(sg AS DECIMAL(38,0)) * sg) - 1000000 " +
            "ELSE 0 END AS BIGINT)").as("cv2_ppm"))
    }),

    // ---- half-life-decayed engagement score --------------------------
    // The recency-weighted revenue feature every churn/LTV model eats
    // (exponential decay, 1-week half-life) made INTEGER-EXACT: weight
    // = 1e6 >> age_weeks (a right shift IS 2^-k in fixed point;
    // both engines shift identically, capped at 20 — below 1 ppm the
    // weight is 0 anyway). The anchor is the DERIVED max(ts) (q262's
    // rule), age floors by integer days/7. One corpus pass + one
    // user-keyed agg; weighted sums in DECIMAL(38)/HUGEINT (cents ×
    // 1e6 at 100× passes int64). Negative/null purchase values are
    // excluded up front (the s25 rule: floor parity needs non-negative
    // operands).
    "q281_decayed_engagement" -> ((s, d) => {
      import s.implicits._
      val mx = T.events(s, d).agg(max(to_date($"ts")).as("d_max"))
      T.events(s, d)
        .filter($"event_type" === "purchase" &&
          $"value".isNotNull && $"value" >= 0)
        .crossJoin(broadcast(mx))
        .select($"user_id",
          graft.functions.Exact.cents($"value").as("cents"),
          expr("least(CAST(datediff(d_max, to_date(ts)) AS BIGINT) div 7, " +
            "20L)").as("wk"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_purch"),
          sum($"cents").cast("bigint").as("raw_cents"),
          expr("CAST(sum(CAST(cents AS DECIMAL(38,0)) " +
            "* shiftright(1000000L, CAST(wk AS INT))) div 1000000 " +
            "AS BIGINT)").as("decayed_cents"))
    }),

    // ---- path-based channel removal effects (attribution) -----------
    // The counterfactual companion to q92's last-touch: removal effect
    // of channel c = share of converting users whose PRE-conversion
    // path touches c — the conversions lost if c were removed under
    // the all-touch-necessary model ([Anderl+ '16] Markov-attribution
    // lineage, reduced to exact path-set logic: no transition-matrix
    // solve, so both engines replay it relationally). Conversion = the
    // user's FIRST purchase under the (ts, event_id) total order;
    // struct keys compare lexicographically in both engines (no epoch
    // arithmetic — epoch_us·1e6 + id would overflow int64). Last-touch
    // shares emitted alongside: the two models disagree exactly where
    // assist channels matter. Scale shape: one conversion-key agg, one
    // keyed join + two hash aggs; the 1-row conversion total
    // broadcasts; everything is user- or channel-keyed.
    "q268_channel_removal" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"event_type")
      val conv = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(min(struct($"ts", $"event_id")).as("ck"))
      val pre = ev.filter($"event_type" =!= "purchase")
        .join(conv, "user_id")
        .filter(struct($"ts", $"event_id") < $"ck")
        .select($"user_id", $"event_type".as("channel"), $"ts", $"event_id")
      val touch = pre.select($"user_id", $"channel").distinct()
        .groupBy($"channel").agg(count(lit(1)).as("n_touched"))
      val lastc = pre.groupBy($"user_id")
        .agg(max(struct($"ts", $"event_id", $"channel")).getField("channel")
          .as("channel"))
        .groupBy($"channel").agg(count(lit(1)).as("n_last"))
      val tot = conv.agg(count(lit(1)).as("n_conv"))
      touch.join(lastc, Seq("channel"), "left")
        .crossJoin(broadcast(tot))
        .select($"channel", $"n_touched",
          expr("n_touched * 1000000L div n_conv").as("removal_ppm"),
          coalesce($"n_last", lit(0L)).as("n_last"),
          expr("coalesce(n_last, 0L) * 1000000L div n_conv")
            .as("last_touch_ppm"))
    }),

    // ---- lead-lag cross-correlation (clicks → purchases) ------------
    // Does click volume LEAD purchase volume, and by how many days?
    // Squared Pearson correlation (R² — rational, no sqrt; the sign
    // reported separately) between the daily click series and the
    // purchase series shifted by lag ∈ [−3, 3] — the
    // marketing-attribution screen before q178's OLS commits to a
    // direction. Exact: power sums on the timespan-bounded daily
    // grid; the R² numerator/denominator assemble in DECIMAL(38)/
    // HUGEINT (the q239 rescale note applies past ~1e9 events/day).
    // Scale shape: one corpus hash agg to the daily grid; the 7-row
    // lag table broadcasts; the shift join is an EQUI-join on the
    // projected day+lag key over the bounded grid.
    "q261_leadlag_r2" -> ((s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .select(datediff(to_date($"ts"), to_date(lit("2024-01-01")))
          .cast("long").as("day"),
          ($"event_type" === "click").cast("long").as("xc"),
          ($"event_type" === "purchase").cast("long").as("yc"))
        .groupBy($"day")
        .agg(sum($"xc").cast("bigint").as("x"),
          sum($"yc").cast("bigint").as("y"))
      val lags = Seq(-3L, -2L, -1L, 0L, 1L, 2L, 3L).toDF("lag")
      daily.select($"day", $"x").crossJoin(broadcast(lags))
        .withColumn("day2", $"day" + $"lag")
        .join(daily.select($"day".as("day2"), $"y"), "day2")
        .groupBy($"lag")
        .agg(count(lit(1)).as("n"),
          sum($"x").cast("bigint").as("sx"),
          sum($"y").cast("bigint").as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sx2"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("sy2"))
        .select($"lag", $"n".as("n_days"),
          expr("CAST(CASE WHEN (CAST(n AS DECIMAL(38,0)) * sx2 - " +
            "CAST(sx AS DECIMAL(38,0)) * sx) * " +
            "(CAST(n AS DECIMAL(38,0)) * sy2 - " +
            "CAST(sy AS DECIMAL(38,0)) * sy) > 0 THEN " +
            "((CAST(n AS DECIMAL(38,0)) * sxy - " +
            "CAST(sx AS DECIMAL(38,0)) * sy) * " +
            "(CAST(n AS DECIMAL(38,0)) * sxy - " +
            "CAST(sx AS DECIMAL(38,0)) * sy) * 1000000) div " +
            "((CAST(n AS DECIMAL(38,0)) * sx2 - " +
            "CAST(sx AS DECIMAL(38,0)) * sx) * " +
            "(CAST(n AS DECIMAL(38,0)) * sy2 - " +
            "CAST(sy AS DECIMAL(38,0)) * sy)) " +
            "ELSE 0 END AS BIGINT)").as("r2_ppm"),
          expr("CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * sxy - " +
            "CAST(sx AS DECIMAL(38,0)) * sy > 0 THEN 1 " +
            "WHEN CAST(n AS DECIMAL(38,0)) * sxy - " +
            "CAST(sx AS DECIMAL(38,0)) * sy < 0 THEN -1 " +
            "ELSE 0 END AS BIGINT)").as("sgn"))
    }),

    // ---- day-of-week eta-squared (seasonality strength) -------------
    // How much of daily-volume variance does the weekly cycle explain?
    // One-way ANOVA's effect size η² = SSB/SST with day-of-week as the
    // factor — the STRENGTH number behind q183's seasonal profile
    // (the profile shows the shape; η² says whether it matters) and
    // the parametric companion to q255's rank test. Exactness: both
    // sums of squares assemble from integer power sums (Σy, Σy²,
    // per-dow S_g) with the grand term T²·1e6/N and per-group
    // S_g²·1e6/n_g floored identically in both engines (the q239
    // per-term convention); products run in DECIMAL(38)/HUGEINT.
    // Scale shape: one (type, day) corpus hash agg → a ≤7·|types|-row
    // dow rollup → 1-row folds per type. Validated against the float
    // SSB/SST to the ppm.
    "q256_dow_eta_squared" -> ((s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .select($"event_type",
          datediff(to_date($"ts"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("y"))
      val g = daily.groupBy($"event_type", expr("day % 7").as("dow"))
        .agg(sum($"y").cast("bigint").as("s_g"),
          count(lit(1)).as("n_g"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("ss_g"))
      g.groupBy($"event_type")
        .agg(sum($"s_g").cast("bigint").as("t_sum"),
          sum($"n_g").cast("bigint").as("n"),
          sum($"ss_g").as("sum_y2"),
          sum(expr("(CAST(s_g AS DECIMAL(38,0)) * s_g * 1000000) " +
            "div n_g")).as("ssb_c"))
        .select($"event_type", $"n".as("n_days"),
          expr("CAST(CASE WHEN sum_y2 * 1000000 - " +
            "(CAST(t_sum AS DECIMAL(38,0)) * t_sum * 1000000) div n > 0 " +
            "THEN ((ssb_c - (CAST(t_sum AS DECIMAL(38,0)) * t_sum " +
            "* 1000000) div n) * 1000000) div (sum_y2 * 1000000 - " +
            "(CAST(t_sum AS DECIMAL(38,0)) * t_sum * 1000000) div n) " +
            "ELSE 0 END AS BIGINT)").as("eta2_ppm"))
    }),

    // ---- Nelson–Aalen cumulative hazard -----------------------------
    // [Nelson '72; Aalen, Ann.Stat.'78] — the additive companion to
    // q194's multiplicative Kaplan–Meier on the SAME churn substrate:
    // H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ. Where KM's floor-product needs the
    // sequential aggregate() fold (no windowed form), the NA estimator
    // is a plain prefix SUM of per-day hazard floors — one cumulative
    // window over the timespan-bounded day grid. Exactness: each step
    // floors dᵢ·1e6 div nᵢ (non-negative, so div == //); the cumsum
    // adds exact integers. Corpus-scale work is q194's one user-keyed
    // max() agg; everything after runs on the bounded grid (both
    // global windows sit above the grid Aggregate — the PlanSpec
    // bounder).
    "q251_nelson_aalen" -> ((s, d) => {
      import s.implicits._
      val lastd = T.events(s, d)
        .select($"user_id",
          datediff(to_date($"ts"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .groupBy($"user_id").agg(max($"day").as("last_day"))
      val tot = lastd.agg(max($"last_day").as("max_day"),
        count(lit(1)).as("n_users"))
      val grid = lastd.crossJoin(broadcast(tot))
        .groupBy($"last_day".as("day"))
        .agg(count(lit(1)).as("n_last"),
          sum(when($"last_day" < $"max_day", 1L).otherwise(0L))
            .as("n_churn"))
      val wPrev = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.crossJoin(broadcast(tot.select($"n_users")))
        .withColumn("n_at_risk",
          $"n_users" - coalesce(sum($"n_last").over(wPrev), lit(0L)))
        .withColumn("hazard_ppm",
          expr("n_churn * 1000000L div n_at_risk"))
        .withColumn("cumhaz_ppm",
          sum($"hazard_ppm").over(wCum).cast("bigint"))
        .select($"day", $"n_at_risk", $"n_churn", $"hazard_ppm",
          $"cumhaz_ppm")
    }),

    // ---- equi-depth feature binning + label lift --------------------
    // The feature-engineering audit a training pipeline runs before
    // trusting a numeric feature: bin `value` into 8 equal-population
    // bins (q129's sampled deterministic boundaries — the no-global-
    // sort equi-depth machinery) and score each bin's purchase rate as
    // a LIFT vs the corpus base rate — a rational, engine-exact
    // predictiveness signal (WOE/IV would need log; lift ranks bins
    // the same way). One corpus scan + one bin-keyed agg; boundaries
    // and the 1-row totals are broadcast. n_pos·n_tot·1e6 bounds
    // int64 to ~1e9 events/bin — decimal past that.
    "q200_feature_bin_lift" -> ((s, d) => {
      import s.implicits._
      val h60 = graft.functions.PortableHash.h60 _
      val vals = T.events(s, d)
        .select(Exact.cents($"value").as("v"), $"event_id",
          ($"event_type" === "purchase").cast("long").as("y"))
      val sample = vals
        .crossJoin(broadcast(vals.agg(count(lit(1)).as("n_all"))))
        .filter(pmod(h60($"event_id"),
          expr("greatest(CAST(1 AS BIGINT), (n_all + 8191) div 8192)")) === 0)
        .select($"v", $"event_id")
      val wr = Window.orderBy($"v", $"event_id")
      val bounds = sample
        .crossJoin(broadcast(sample.agg(count(lit(1)).as("cnt"))))
        .withColumn("rn", row_number().over(wr))
        .filter((1 to 7).map(i => $"rn" === expr(s"($i * cnt) div 8"))
          .reduce(_ || _))
        .select($"v".as("b"))
      val binned = vals.join(broadcast(bounds), $"v" > $"b", "left")
        .groupBy($"event_id", $"v", $"y").agg(count($"b").as("bin"))
      val tot = binned.agg(count(lit(1)).as("n_tot"), sum($"y").as("y_tot"))
      binned.groupBy($"bin")
        .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"))
        .crossJoin(broadcast(tot))
        .select($"bin", $"n", $"n_pos",
          expr("n_pos * 1000000L div n").as("rate_ppm"),
          expr("(n_pos * n_tot * 1000000L) div (n * y_tot)").as("lift_ppm"))
    }),

    // ---- CUSUM volume-drift alarm -----------------------------------
    // The sequential change-point detector behind "did ingest volume
    // shift?" [Page, Biometrika'54]: per event_type, the one-sided
    // upper/lower CUSUMs of daily counts against a BASELINE target
    // (the integer mean of the first 3 days — the warm-up window),
    // s⁺ₜ = max(0, s⁺ₜ₋₁ + xₜ − target), s⁻ₜ = max(0, s⁻ₜ₋₁ + target − xₜ),
    // alarm when either exceeds target (one full day's drift
    // accumulated). All integer; the recurrence folds over the BOUNDED
    // per-type day grid (q108/q194's pattern — corpus-scale work is
    // the one (type, day) hash agg), and the oracle replays it in a
    // per-type recursive CTE.
    "q201_cusum_drift" -> ((s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .select($"event_type",
          datediff(to_date($"ts"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("x"))
      val w3 = Window.partitionBy($"event_type").orderBy($"day")
      val tgt = daily.withColumn("rn", row_number().over(w3))
        .filter($"rn" <= 3)
        .groupBy($"event_type").agg(expr("sum(x) div 3").as("target"))
      daily.join(tgt, "event_type")
        .groupBy($"event_type", $"target")
        .agg(array_sort(collect_list(struct($"day", $"x"))).as("xs"))
        .select($"event_type", $"target", explode(expr(
          """aggregate(xs,
            |  struct(CAST(0 AS BIGINT) AS up, CAST(0 AS BIGINT) AS dn,
            |    CAST(array() AS ARRAY<STRUCT<day: BIGINT, x: BIGINT,
            |      cusum_up: BIGINT, cusum_dn: BIGINT>>) AS out),
            |  (acc, e) -> struct(
            |    greatest(CAST(0 AS BIGINT), acc.up + e.x - target) AS up,
            |    greatest(CAST(0 AS BIGINT), acc.dn + target - e.x) AS dn,
            |    array_append(acc.out, struct(e.day AS day, e.x AS x,
            |      greatest(CAST(0 AS BIGINT), acc.up + e.x - target)
            |        AS cusum_up,
            |      greatest(CAST(0 AS BIGINT), acc.dn + target - e.x)
            |        AS cusum_dn)) AS out),
            |  acc -> acc.out)""".stripMargin)).as("r"))
        .select($"event_type", $"r.day", $"r.x", $"target",
          $"r.cusum_up", $"r.cusum_dn",
          ($"r.cusum_up" > $"target" || $"r.cusum_dn" > $"target")
            .cast("long").as("alarm"))
    }),

    // ---- session-gap acceptance audit -------------------------------
    // The measurement behind every sessionization timeout (q25/s11
    // hard-code 30 minutes): per candidate gap G, what fraction of
    // within-user inter-event gaps would BREAK a session — and since
    // sessions = users + breaks, the session count per G falls out
    // without re-sessionizing. The chosen G (smallest candidate
    // breaking ≤20% of gaps, else the largest) is flagged in the
    // report — the config a pipeline would feed back into q25, the
    // acceptance-loop rule. One user-partitioned lag window (the
    // corpus-scale stage, same shuffle as sessionization itself);
    // candidates and the two 1-row scalars are broadcasts.
    "q204_session_gap_audit" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val gaps = T.events(s, d)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id")
        .withColumn("prev", lag($"ts_us", 1).over(w))
        .filter($"prev".isNotNull)
        .select(($"ts_us" - $"prev").as("gap_us"))
      val users = T.events(s, d)
        .agg(countDistinct($"user_id").as("n_users"))
      val cands = Seq(300000000L, 900000000L, 1800000000L, 3600000000L)
        .toDF("g_us")
      val stats = gaps.crossJoin(broadcast(cands))
        .groupBy($"g_us")
        .agg(count(lit(1)).as("n_gaps"),
          sum(($"gap_us" > $"g_us").cast("long")).as("n_breaks"))
        .withColumn("break_ppm", expr("n_breaks * 1000000L div n_gaps"))
      val chosen = stats.agg(
        coalesce(min(when($"break_ppm" <= 200000L, $"g_us")),
          max($"g_us")).as("chosen_g"))
      stats.crossJoin(broadcast(chosen)).crossJoin(broadcast(users))
        .select($"g_us", $"n_gaps", $"n_breaks", $"break_ppm",
          ($"g_us" === $"chosen_g").cast("long").as("chosen"),
          ($"n_users" + $"n_breaks").as("n_sessions"))
    }),

    // ---- conversion latency: exact per-cohort median / p90 ----------
    // The metric q81's funnel counts don't give: HOW LONG signup →
    // first purchase takes, per signup-week cohort, as exact
    // rank-selected order statistics (q100's pattern: lower median at
    // rank (n+1) div 2, p90 at rank ceil(9n/10), picked by
    // max(CASE rank = target) inside a cohort-partitioned window —
    // each window sees one cohort, never the corpus). The corpus-scale
    // stages are two user-grain aggs and one user-keyed join; the
    // latency table is one row per converted user.
    "q205_conversion_latency" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
      val su = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts_us").as("su_us"))
      val lat = ev.filter($"event_type" === "purchase")
        .join(su, "user_id").filter($"ts_us" >= $"su_us")
        .groupBy($"user_id", $"su_us").agg(min($"ts_us").as("pu_us"))
        .select($"user_id",
          expr("su_us div 604800000000L").as("cohort_wk"),
          expr("(pu_us - su_us) div 1000000L").as("latency_s"))
      val w = Window.partitionBy($"cohort_wk")
        .orderBy($"latency_s", $"user_id")
      val wc = Window.partitionBy($"cohort_wk")
      lat.withColumn("rn", row_number().over(w).cast("bigint"))
        .withColumn("n", count(lit(1)).over(wc))
        .groupBy($"cohort_wk")
        .agg(count(lit(1)).as("n_converted"),
          max(when($"rn" === expr("(n + 1) div 2"), $"latency_s"))
            .as("median_s"),
          max(when($"rn" === expr("(9 * n + 9) div 10"), $"latency_s"))
            .as("p90_s"))
    }))

  /** Engine-portable GROUPING SETS (distinct sets, not rollup/cube). */
  /** Same text on Spark SQL and DuckDB (q28 convention): recursive
    * integer month-series + gap-filled monthly revenue. `ym + 89`
    * steps December (yyyy12) to January (yyyy+1 ·100 + 1). The upper
    * bound RIDES IN THE RECURSION ROW (`months(ym, hi)`) instead of
    * joining the `bounds` CTE in the recursive term: Spark re-plans
    * the recursive term per step, and a referenced CTE is re-evaluated
    * each time — with `bounds` inside the loop the orders aggregate
    * ran once per generated month (~60 corpus scans, measured 13 s at
    * sf0.1); carried as a column it is computed once. */
  private val recursiveSeriesText: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT CAST(min(year(o_orderdate) * 100 + month(o_orderdate)) AS BIGINT) AS lo,
      |         CAST(max(year(o_orderdate) * 100 + month(o_orderdate)) AS BIGINT) AS hi
      |  FROM orders),
      |months(ym, hi) AS (
      |  SELECT lo, hi FROM bounds
      |  UNION ALL
      |  SELECT CASE WHEN ym % 100 = 12 THEN ym + 89 ELSE ym + 1 END, hi
      |  FROM months WHERE ym < hi),
      |rev AS (
      |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
      |    count(*) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1)
      |SELECT m.ym, coalesce(rev.n_orders, 0) AS n_orders,
      |  coalesce(rev.rev_c, 0) AS rev_c
      |FROM months m LEFT JOIN rev ON rev.ym = m.ym""".stripMargin

  private val groupingSetsText: String =
    """SELECT event_type, CAST(year(ts) AS BIGINT) AS yr,
      |  CAST(grouping(event_type) * 2 + grouping(year(ts)) AS BIGINT) AS gid,
      |  count(*) AS n
      |FROM events
      |GROUP BY GROUPING SETS ((event_type), (year(ts)), (event_type, year(ts)))""".stripMargin

  /** Engine-portable SQL (Spark SQL + DuckDB dialect intersection). */
  private val sqlSurfaceText: String =
    s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
       |  count(*) AS n_orders, ${Exact.sumMoneySql("o_totalprice")} AS total
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)""".stripMargin

  def oracles: Map[String, String] = Map(
    // the same literal z pair, isqrt radical, non-negative floors
    "q349_wilson_ci" ->
      """WITH g AS (
        |  SELECT ((CAST(epoch_us(ts) AS BIGINT) // 86400000000) + 4) % 7
        |      AS dow,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_purch
        |  FROM events GROUP BY 1),
        |s1 AS (SELECT *,
        |  CAST(3841600 AS HUGEINT) * (CAST(n_purch AS HUGEINT)
        |    * (n_events - n_purch) * 1000000
        |    // n_events + 960400) AS ss FROM g),
        |s2 AS (SELECT *, CAST(sqrt(CAST(ss AS DOUBLE)) AS BIGINT) AS y0
        |  FROM s1),
        |s3 AS (SELECT *,
        |  CASE WHEN CAST(y0 AS HUGEINT) * y0 > ss THEN y0 - 1
        |    WHEN CAST(y0 + 1 AS HUGEINT) * (y0 + 1) <= ss THEN y0 + 1
        |    ELSE y0 END AS rad FROM s2)
        |SELECT dow, n_events, n_purch,
        |  CAST(CAST(n_purch AS HUGEINT) * 1000000 // n_events AS BIGINT)
        |    AS rate_ppm,
        |  CAST((CAST(n_purch AS HUGEINT) * 1000000 + 1920800 - rad)
        |    * 1000000 // (CAST(n_events AS HUGEINT) * 1000000 + 3841600)
        |    AS BIGINT) AS wilson_lo_ppm,
        |  CAST((CAST(n_purch AS HUGEINT) * 1000000 + 1920800 + rad)
        |    * 1000000 // (CAST(n_events AS HUGEINT) * 1000000 + 3841600)
        |    AS BIGINT) AS wilson_hi_ppm
        |FROM s3""".stripMargin,

    // the same day series, median signing, run count, exact moments
    "q353_runs_test" ->
      """WITH daily AS (
        |  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |    AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      * 1000000 // count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |med AS (
        |  SELECT CAST(max(CASE WHEN rn = (n + 1) // 2 THEN x END)
        |    + max(CASE WHEN rn = (n + 2) // 2 THEN x END) AS BIGINT)
        |    AS med2
        |  FROM (SELECT x,
        |      row_number() OVER (ORDER BY x, day) AS rn,
        |      count(*) OVER () AS n
        |    FROM daily) t),
        |signed AS (
        |  SELECT day, CASE WHEN x * 2 > med.med2 THEN 1 ELSE -1 END AS sg
        |  FROM daily CROSS JOIN med WHERE x * 2 <> med.med2),
        |runs AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_above,
        |    CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_below,
        |    CAST(sum(CASE WHEN prev IS NOT NULL AND sg <> prev
        |      THEN 1 ELSE 0 END) + 1 AS BIGINT) AS r_runs
        |  FROM (SELECT sg, lag(sg) OVER (ORDER BY day) AS prev
        |        FROM signed) t),
        |mom AS (
        |  SELECT n_days, n_above, n_below, r_runs,
        |    1000 + (2000 * n_above * n_below) // (n_above + n_below)
        |      AS er_milli,
        |    (2 * n_above * n_below *
        |      (2 * n_above * n_below - (n_above + n_below)) * 1000000)
        |      // ((n_above + n_below) * (n_above + n_below) *
        |         (n_above + n_below - 1)) AS var_micro
        |  FROM runs),
        |sig AS (
        |  SELECT *, CAST(sqrt(CAST(var_micro AS DOUBLE)) AS BIGINT) AS y0
        |  FROM mom),
        |sg2 AS (
        |  SELECT *,
        |    CASE WHEN y0 * y0 > var_micro THEN y0 - 1
        |      WHEN (y0 + 1) * (y0 + 1) <= var_micro THEN y0 + 1
        |      ELSE y0 END AS sigma_milli
        |  FROM sig)
        |SELECT n_days, n_above, n_below, r_runs,
        |  CAST(er_milli AS BIGINT) AS er_milli,
        |  CAST(var_micro AS BIGINT) AS var_micro,
        |  CAST(CASE WHEN var_micro = 0 THEN 0 ELSE
        |    ((r_runs * 1000 - er_milli + 100 * sigma_milli) * 1000)
        |      // sigma_milli - 100000 END AS BIGINT) AS z_milli
        |FROM sg2""".stripMargin,

    // the same struct-min firsts, hour-grain bands, rank locates
    "q347_time_to_convert" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us,
        |    event_id AS id
        |  FROM events),
        |fv AS (
        |  SELECT user_id, min({'us': us, 'id': id}) AS v
        |  FROM ev WHERE event_type = 'view' GROUP BY 1),
        |fp AS (
        |  SELECT e.user_id, min({'us': e.us, 'id': e.id}) AS p,
        |    min(fv.v.us) AS vus
        |  FROM ev e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND (e.us > fv.v.us OR (e.us = fv.v.us AND e.id > fv.v.id))
        |  GROUP BY 1),
        |lags AS (
        |  SELECT ((vus // 86400000000) + 4) % 7 AS dow,
        |    (p.us - vus) // 3600000000 AS lag_h
        |  FROM fp),
        |bands AS (SELECT dow, lag_h, CAST(count(*) AS BIGINT) AS c
        |  FROM lags GROUP BY 1, 2),
        |cum AS (
        |  SELECT dow, lag_h, c,
        |    CAST(sum(c) OVER (PARTITION BY dow ORDER BY lag_h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY dow) AS BIGINT) AS n,
        |    CAST(sum(c * lag_h) OVER (PARTITION BY dow) AS BIGINT) AS sl
        |  FROM bands)
        |SELECT dow, CAST(max(n) AS BIGINT) AS n_converted,
        |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN lag_h END)
        |    AS BIGINT) AS p50_hours,
        |  CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN lag_h END)
        |    AS BIGINT) AS p90_hours,
        |  CAST(max(sl // n) AS BIGINT) AS mean_hours
        |FROM cum GROUP BY 1""".stripMargin,

    "q304_seq_patterns" ->
      """WITH ev AS (
        |  SELECT user_id, event_type AS t, CAST(epoch_us(ts) AS BIGINT)
        |    AS us, event_id AS id
        |  FROM events),
        |p12 AS (
        |  SELECT a.user_id, a.t AS t1, a.us AS us1, b.t AS t2,
        |    b.us AS us2, b.id AS id2
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |    AND (a.us < b.us OR (a.us = b.us AND a.id < b.id))
        |    AND b.us - a.us <= 86400000000),
        |sup2 AS (
        |  SELECT t1, t2, CAST(count(*) AS BIGINT) AS sup2
        |  FROM (SELECT DISTINCT user_id, t1, t2 FROM p12) p GROUP BY 1, 2),
        |sup3 AS (
        |  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS sup3
        |  FROM (
        |    SELECT DISTINCT p.user_id, p.t1, p.t2, c.t AS t3
        |    FROM p12 p JOIN ev c ON p.user_id = c.user_id
        |      AND (p.us2 < c.us OR (p.us2 = c.us AND p.id2 < c.id))
        |      AND c.us - p.us1 <= 86400000000) t
        |  GROUP BY 1, 2, 3)
        |SELECT sup3.t1, sup3.t2, sup3.t3, sup3.sup3, sup2.sup2,
        |  CAST(sup3.sup3 * 1000000 // sup2.sup2 AS BIGINT) AS conf_ppm
        |FROM sup3 JOIN sup2 ON sup3.t1 = sup2.t1 AND sup3.t2 = sup2.t2
        |ORDER BY sup3.sup3 DESC, sup3.t1, sup3.t2, sup3.t3
        |LIMIT 20""".stripMargin,

    "q306_ece_calibration" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |pred AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      * 1000000 // count(*) AS BIGINT) AS pred_ppm
        |  FROM ev WHERE day < 15 GROUP BY 1),
        |outc AS (
        |  SELECT DISTINCT user_id FROM ev
        |  WHERE day = 15 AND event_type = 'purchase'),
        |bins AS (
        |  SELECT least(p.pred_ppm // 200000, 4) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(p.pred_ppm) AS BIGINT) AS sum_pred,
        |    CAST(sum(CASE WHEN o.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_pos
        |  FROM pred p LEFT JOIN outc o ON p.user_id = o.user_id
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |  CAST(sum(abs(sum_pred - n_pos * 1000000)) AS BIGINT) AS dev
        |  FROM bins)
        |SELECT CAST(b.bin AS BIGINT) AS bin, b.n,
        |  CAST(b.sum_pred // b.n AS BIGINT) AS avg_pred_ppm,
        |  CAST(b.n_pos * 1000000 // b.n AS BIGINT) AS obs_ppm,
        |  CAST(abs(b.sum_pred - b.n_pos * 1000000) // b.n AS BIGINT)
        |    AS gap_ppm,
        |  CAST(tot.dev // tot.nn AS BIGINT) AS ece_ppm
        |FROM bins b CROSS JOIN tot""".stripMargin,

    "q299_haar_sketch" ->
      """WITH daily AS (
        |  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |grid AS (
        |  SELECT g.day, COALESCE(daily.x, 0) AS x
        |  FROM (SELECT unnest(range(0, 32)) AS day) g
        |  LEFT JOIN daily ON g.day = daily.day),
        |lv AS (
        |  SELECT grid.day, grid.x, k.l,
        |    CASE WHEN k.l = 6 THEN CAST(0 AS BIGINT)
        |         ELSE grid.day // (CASE k.l WHEN 1 THEN 2 WHEN 2 THEN 4
        |           WHEN 3 THEN 8 WHEN 4 THEN 16 ELSE 32 END) END AS i,
        |    CASE WHEN k.l = 6 THEN 1
        |         ELSE 1 - 2 * ((grid.day // (CASE k.l WHEN 1 THEN 1
        |           WHEN 2 THEN 2 WHEN 3 THEN 4 WHEN 4 THEN 8
        |           ELSE 16 END)) % 2) END AS sgn
        |  FROM grid CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6)) k(l)),
        |coefs AS (
        |  SELECT CAST(l AS BIGINT) AS l, i, CAST(sum(sgn * x) AS BIGINT)
        |      AS c,
        |    CAST(sum(sgn * x) * sum(sgn * x) * 1000
        |      // (CASE l WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
        |         WHEN 4 THEN 16 WHEN 5 THEN 32 ELSE 32 END) AS BIGINT)
        |      AS contrib_milli
        |  FROM lv GROUP BY l, i),
        |tot AS (SELECT CAST(sum(contrib_milli) AS BIGINT) AS total_milli
        |  FROM coefs),
        |top AS (
        |  SELECT l, i, c, contrib_milli
        |  FROM coefs ORDER BY abs(c) DESC, l, i LIMIT 8)
        |SELECT top.l AS lvl, top.i AS pos, top.c AS coef, top.contrib_milli,
        |  CAST((SELECT CAST(sum(contrib_milli) AS BIGINT) FROM top)
        |    * 1000000 // tot.total_milli AS BIGINT) AS retained_ppm
        |FROM top CROSS JOIN tot""".stripMargin,

    "q300_sax_motifs" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, g.day, COALESCE(daily.x, 0) AS x
        |  FROM (SELECT DISTINCT event_type FROM daily) t
        |  CROSS JOIN (SELECT unnest(range(0, 30)) AS day) g
        |  LEFT JOIN daily ON t.event_type = daily.event_type
        |    AND g.day = daily.day),
        |paa AS (
        |  SELECT event_type, day // 5 AS seg, CAST(sum(x) AS BIGINT)
        |    AS segsum
        |  FROM grid GROUP BY 1, 2),
        |sym AS (
        |  SELECT event_type, seg,
        |    CAST(ntile(4) OVER (PARTITION BY event_type
        |      ORDER BY segsum, seg) AS BIGINT) - 1 AS q
        |  FROM paa),
        |word AS (
        |  SELECT event_type,
        |    string_agg(CAST(q AS VARCHAR), '' ORDER BY seg) AS sax_word
        |  FROM sym GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST((CASE WHEN substr(a.sax_word, 1, 1) != substr(b.sax_word, 1, 1) THEN 1 ELSE 0 END)
        |      + (CASE WHEN substr(a.sax_word, 2, 1) != substr(b.sax_word, 2, 1) THEN 1 ELSE 0 END)
        |      + (CASE WHEN substr(a.sax_word, 3, 1) != substr(b.sax_word, 3, 1) THEN 1 ELSE 0 END)
        |      + (CASE WHEN substr(a.sax_word, 4, 1) != substr(b.sax_word, 4, 1) THEN 1 ELSE 0 END)
        |      + (CASE WHEN substr(a.sax_word, 5, 1) != substr(b.sax_word, 5, 1) THEN 1 ELSE 0 END)
        |      + (CASE WHEN substr(a.sax_word, 6, 1) != substr(b.sax_word, 6, 1) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hamming
        |  FROM word a JOIN word b ON a.event_type != b.event_type),
        |nn AS (
        |  SELECT ta, min({'hamming': hamming, 'tb': tb}) AS mm
        |  FROM pairs GROUP BY 1)
        |SELECT w.event_type, w.sax_word, nn.mm.tb AS nn_type,
        |  CAST(nn.mm.hamming AS BIGINT) AS hamming
        |FROM word w JOIN nn ON w.event_type = nn.ta""".stripMargin,

    "q181_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT) AS day,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |l(lag) AS (VALUES (1), (7)),
        |p AS (
        |  SELECT CAST(l.lag AS BIGINT) AS lag, a.y AS a, b.y AS b
        |  FROM l CROSS JOIN daily a
        |  JOIN daily b ON b.day = a.day + l.lag),
        |g AS (
        |  SELECT lag, count(*) AS n_pairs,
        |    CAST(sum(a) AS BIGINT) AS sum_a, CAST(sum(b) AS BIGINT) AS sum_b,
        |    CAST(sum(a * b) AS BIGINT) AS sum_ab,
        |    CAST(sum(a * a) AS BIGINT) AS sum_a2,
        |    CAST(sum(b * b) AS BIGINT) AS sum_b2
        |  FROM p GROUP BY 1)
        |SELECT lag, n_pairs, sum_a, sum_b, sum_ab,
        |  n_pairs * sum_ab - sum_a * sum_b AS cov_num,
        |  n_pairs * sum_a2 - sum_a * sum_a AS var_a_num,
        |  n_pairs * sum_b2 - sum_b * sum_b AS var_b_num
        |FROM g""".stripMargin,

    "q183_seasonal_profile" ->
      """WITH a AS (
        |  SELECT (CAST(datediff('day', DATE '1970-01-01', ts) AS BIGINT) + 4) % 7
        |      AS dow,
        |    CAST(hour(ts) AS BIGINT) AS hr, user_id
        |  FROM events),
        |g AS (
        |  SELECT dow, hr, count(*) AS n_events,
        |    count(DISTINCT user_id) AS n_users
        |  FROM a GROUP BY 1, 2)
        |SELECT dow, hr, n_events, n_users,
        |  n_events * 1000000 //
        |    CAST(sum(n_events) OVER (PARTITION BY dow) AS BIGINT) AS share_ppm
        |FROM g""".stripMargin,

    "q187_watermark_audit" ->
      """WITH e AS (
        |  SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
        |p AS (
        |  SELECT event_id, ts_us,
        |    coalesce(max(ts_us) OVER (ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_max
        |  FROM e),
        |dl(delay_us) AS (VALUES
        |  (60000000), (300000000), (600000000), (3600000000)),
        |g AS (
        |  SELECT CAST(delay_us AS BIGINT) AS delay_us, count(*) AS n_events,
        |    CAST(sum(CASE WHEN prev_max - ts_us > delay_us THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_dropped
        |  FROM p, dl GROUP BY 1)
        |SELECT delay_us, n_events, n_dropped,
        |  n_dropped * 1000000 // n_events AS drop_ppm
        |FROM g""".stripMargin,

    "q188_seasonal_backtest" ->
      """WITH daily AS (
        |  SELECT CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT) AS day,
        |    event_type, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |m(model, lag) AS (VALUES ('naive1', 1), ('seasonal7', 7)),
        |j AS (
        |  SELECT m.model, a.event_type, abs(b.y - a.y) AS abs_err, b.y AS y
        |  FROM m CROSS JOIN daily a
        |  JOIN daily b ON b.day = a.day + m.lag AND b.event_type = a.event_type),
        |g AS (
        |  SELECT model, event_type, count(*) AS n_days,
        |    CAST(sum(abs_err) AS BIGINT) AS abs_err,
        |    CAST(sum(y) AS BIGINT) AS actual
        |  FROM j GROUP BY 1, 2)
        |SELECT model, event_type, n_days, abs_err, actual,
        |  abs_err * 1000000 // actual AS wape_ppm
        |FROM g""".stripMargin,

    // the same floor-product replayed stepwise in a recursive CTE
    // (the sequential recurrence has no windowed form)
    "q194_kaplan_meier" ->
      """WITH RECURSIVE lastd AS (
        |  SELECT user_id,
        |    max(CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT))
        |      AS last_day
        |  FROM events GROUP BY 1),
        |tot AS (SELECT max(last_day) AS max_day, count(*) AS n_users
        |  FROM lastd),
        |grid AS (
        |  SELECT last_day AS day, count(*) AS n_last,
        |    CAST(sum(CASE WHEN last_day < (SELECT max_day FROM tot)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_churn
        |  FROM lastd GROUP BY 1),
        |ar AS (
        |  SELECT day, n_churn,
        |    (SELECT n_users FROM tot) -
        |      CAST(coalesce(sum(n_last) OVER (ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS n_at_risk,
        |    row_number() OVER (ORDER BY day) AS rn
        |  FROM grid),
        |km(rn, surv) AS (
        |  SELECT 0, CAST(1000000 AS BIGINT)
        |  UNION ALL
        |  SELECT ar.rn,
        |    (km.surv * (ar.n_at_risk - ar.n_churn)) // ar.n_at_risk
        |  FROM km JOIN ar ON ar.rn = km.rn + 1)
        |SELECT ar.day, ar.n_at_risk, ar.n_churn, km.surv AS surv_ppm
        |FROM km JOIN ar ON ar.rn = km.rn""".stripMargin,

    // the shuffled-arrival prefix max replayed globally in (h60,
    // event_id) order (the band decomposition is an engine-side
    // shape choice, not a semantic)
    "q265_late_quarantine" ->
      """WITH e AS (
        |  SELECT event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS a
        |  FROM events),
        |p AS (
        |  SELECT *, coalesce(max(ts_us) OVER (ORDER BY a, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS prev_max
        |  FROM e),
        |dl(delay_us) AS (VALUES
        |  (60000000), (300000000), (600000000), (3600000000))
        |SELECT CAST(delay_us AS BIGINT) AS delay_us, event_type,
        |  count(*) AS n_quarantined,
        |  min(event_id) AS first_event_id,
        |  CAST(max(prev_max - ts_us) AS BIGINT) AS max_lateness_us
        |FROM p, dl WHERE prev_max - ts_us > delay_us
        |GROUP BY 1, 2""".stripMargin,

    // the gap fold replayed: per-user lag in (ts, event_id) order,
    // n·Σg²/(Σg)² − 1 in HUGEINT
    "q258_interarrival_cv2" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CAST(epoch_us(ts) AS BIGINT)
        |      - lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |s AS (
        |  SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
        |    CAST(sum(gap) AS BIGINT) AS sg,
        |    CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS sg2
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_gaps, sg // n_gaps AS mean_gap_us,
        |  CAST(CASE WHEN sg > 0 AND n_gaps > 1 THEN
        |    (CAST(n_gaps AS HUGEINT) * sg2 * 1000000)
        |      // (CAST(sg AS HUGEINT) * sg) - 1000000
        |  ELSE 0 END AS BIGINT) AS cv2_ppm
        |FROM s""".stripMargin,

    // the shifted-series power sums replayed per lag; R² numerator
    // squared in HUGEINT, sign as its own column
    // derived max-date anchor, identical >> fixed-point weights and
    // HUGEINT weighted sums
    "q281_decayed_engagement" ->
      """WITH mx AS (SELECT max(CAST(ts AS DATE)) AS m FROM events),
        |p AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
        |    least(CAST(datediff('day', CAST(ts AS DATE), mx.m) AS BIGINT)
        |      // 7, 20) AS wk
        |  FROM events, mx
        |  WHERE event_type = 'purchase' AND value IS NOT NULL
        |    AND value >= 0)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_purch,
        |  CAST(sum(cents) AS BIGINT) AS raw_cents,
        |  CAST(sum(CAST(cents AS HUGEINT) * (1000000 >> wk)) // 1000000
        |    AS BIGINT) AS decayed_cents
        |FROM p GROUP BY 1""".stripMargin,

    // identical struct-key total order, path-set logic, and floors
    "q268_channel_removal" ->
      """WITH conv AS (
        |  SELECT user_id, min({'ts': ts, 'id': event_id}) AS ck
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |pre AS (
        |  SELECT e.user_id, e.event_type AS channel, e.ts, e.event_id
        |  FROM events e JOIN conv ON conv.user_id = e.user_id
        |  WHERE e.event_type != 'purchase'
        |    AND {'ts': e.ts, 'id': e.event_id} < conv.ck),
        |tc AS (
        |  SELECT channel, CAST(count(*) AS BIGINT) AS n_touched
        |  FROM (SELECT DISTINCT user_id, channel FROM pre) t GROUP BY 1),
        |lastc AS (
        |  SELECT channel, CAST(count(*) AS BIGINT) AS n_last FROM (
        |    SELECT user_id,
        |      max({'ts': ts, 'id': event_id, 'ch': channel}).ch AS channel
        |    FROM pre GROUP BY 1) l
        |  GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_conv FROM conv)
        |SELECT tc.channel, tc.n_touched,
        |  tc.n_touched * 1000000 // tot.n_conv AS removal_ppm,
        |  CAST(coalesce(lastc.n_last, 0) AS BIGINT) AS n_last,
        |  coalesce(lastc.n_last, 0) * 1000000 // tot.n_conv
        |    AS last_touch_ppm
        |FROM tc LEFT JOIN lastc ON lastc.channel = tc.channel
        |CROSS JOIN tot""".stripMargin,

    "q261_leadlag_r2" ->
      """WITH daily AS (
        |  SELECT CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT)
        |    AS day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |lags(lag) AS (VALUES (-3),(-2),(-1),(0),(1),(2),(3)),
        |j AS (
        |  SELECT CAST(l.lag AS BIGINT) AS lag, a.x, b.y
        |  FROM lags l, daily a JOIN daily b ON b.day = a.day + l.lag),
        |m AS (
        |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sx2,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS sy2
        |  FROM j GROUP BY 1)
        |SELECT lag, n AS n_days,
        |  CAST(CASE WHEN (n * sx2 - CAST(sx AS HUGEINT) * sx)
        |      * (n * sy2 - CAST(sy AS HUGEINT) * sy) > 0 THEN
        |    ((n * sxy - CAST(sx AS HUGEINT) * sy)
        |      * (n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000)
        |    // ((n * sx2 - CAST(sx AS HUGEINT) * sx)
        |      * (n * sy2 - CAST(sy AS HUGEINT) * sy))
        |  ELSE 0 END AS BIGINT) AS r2_ppm,
        |  CAST(CASE WHEN n * sxy - CAST(sx AS HUGEINT) * sy > 0 THEN 1
        |            WHEN n * sxy - CAST(sx AS HUGEINT) * sy < 0 THEN -1
        |            ELSE 0 END AS BIGINT) AS sgn
        |FROM m""".stripMargin,

    // the power-sum eta-squared replayed with identical grand/group
    // floors in HUGEINT
    "q256_dow_eta_squared" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, day % 7 AS dow, CAST(sum(y) AS BIGINT) AS s_g,
        |    CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS ss_g
        |  FROM daily GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, CAST(sum(s_g) AS BIGINT) AS t_sum,
        |    CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(ss_g) AS HUGEINT) AS sum_y2,
        |    CAST(sum((CAST(s_g AS HUGEINT) * s_g * 1000000) // n_g)
        |      AS HUGEINT) AS ssb_c
        |  FROM g GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |  CAST(CASE WHEN sum_y2 * 1000000
        |      - (CAST(t_sum AS HUGEINT) * t_sum * 1000000) // n > 0 THEN
        |    ((ssb_c - (CAST(t_sum AS HUGEINT) * t_sum * 1000000) // n)
        |      * 1000000)
        |    // (sum_y2 * 1000000
        |      - (CAST(t_sum AS HUGEINT) * t_sum * 1000000) // n)
        |  ELSE 0 END AS BIGINT) AS eta2_ppm
        |FROM t""".stripMargin,

    // the additive hazard replayed: q194's at-risk grid, per-day
    // d·1e6 // n floors, windowed cumulative sum (BIGINT-cast —
    // DuckDB windowed sums return HUGEINT)
    "q251_nelson_aalen" ->
      """WITH lastd AS (
        |  SELECT user_id,
        |    max(CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT))
        |      AS last_day
        |  FROM events GROUP BY 1),
        |tot AS (SELECT max(last_day) AS max_day, count(*) AS n_users
        |  FROM lastd),
        |grid AS (
        |  SELECT last_day AS day, count(*) AS n_last,
        |    CAST(sum(CASE WHEN last_day < (SELECT max_day FROM tot)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_churn
        |  FROM lastd GROUP BY 1),
        |ar AS (
        |  SELECT day, n_churn,
        |    (SELECT n_users FROM tot) -
        |      CAST(coalesce(sum(n_last) OVER (ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS n_at_risk
        |  FROM grid),
        |hz AS (
        |  SELECT day, n_at_risk, n_churn,
        |    n_churn * 1000000 // n_at_risk AS hazard_ppm
        |  FROM ar)
        |SELECT day, n_at_risk, n_churn, hazard_ppm,
        |  CAST(sum(hazard_ppm) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cumhaz_ppm
        |FROM hz""".stripMargin,

    "q200_feature_bin_lift" ->
      s"""WITH vals AS (
        |  SELECT ${Exact.centsSql("value")} AS v, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |n AS (SELECT count(*) AS n_all FROM vals),
        |sample AS (
        |  SELECT v, event_id FROM vals, n
        |  WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
        |    AS BIGINT) % GREATEST(1, (n_all + 8191) // 8192) = 0),
        |ranked AS (
        |  SELECT v, row_number() OVER (ORDER BY v, event_id) AS rn,
        |    count(*) OVER () AS cnt
        |  FROM sample),
        |bounds AS (
        |  SELECT v AS b FROM ranked
        |  WHERE rn IN (1*cnt//8, 2*cnt//8, 3*cnt//8, 4*cnt//8,
        |               5*cnt//8, 6*cnt//8, 7*cnt//8)),
        |binned AS (
        |  SELECT event_id, v, y, count(b) AS bin
        |  FROM vals LEFT JOIN bounds ON v > b
        |  GROUP BY event_id, v, y),
        |tot AS (SELECT count(*) AS n_tot, CAST(sum(y) AS BIGINT) AS y_tot
        |  FROM binned),
        |g AS (
        |  SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM binned GROUP BY bin)
        |SELECT g.bin, g.n, g.n_pos,
        |  g.n_pos * 1000000 // g.n AS rate_ppm,
        |  (g.n_pos * tot.n_tot * 1000000) // (g.n * tot.y_tot) AS lift_ppm
        |FROM g, tot""".stripMargin,

    // the same two-sided CUSUM recurrence replayed per type in a
    // recursive CTE
    "q201_cusum_drift" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT) AS day,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, day, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM daily),
        |tgt AS (
        |  SELECT event_type, CAST(sum(x) AS BIGINT) // 3 AS target
        |  FROM r WHERE rn <= 3 GROUP BY 1),
        |cu(event_type, rn, up, dn) AS (
        |  SELECT event_type, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  FROM tgt
        |  UNION ALL
        |  SELECT r.event_type, r.rn,
        |    greatest(CAST(0 AS BIGINT), cu.up + r.x - tgt.target),
        |    greatest(CAST(0 AS BIGINT), cu.dn + tgt.target - r.x)
        |  FROM cu
        |  JOIN r ON r.event_type = cu.event_type AND r.rn = cu.rn + 1
        |  JOIN tgt ON tgt.event_type = cu.event_type)
        |SELECT r.event_type, r.day, r.x, tgt.target,
        |  cu.up AS cusum_up, cu.dn AS cusum_dn,
        |  CAST(CASE WHEN cu.up > tgt.target OR cu.dn > tgt.target
        |    THEN 1 ELSE 0 END AS BIGINT) AS alarm
        |FROM cu
        |JOIN r ON r.event_type = cu.event_type AND r.rn = cu.rn
        |JOIN tgt ON tgt.event_type = r.event_type""".stripMargin,

    "q204_session_gap_audit" ->
      """WITH g AS (
        |  SELECT CAST(epoch_us(ts) AS BIGINT) -
        |    lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
        |      PARTITION BY user_id
        |      ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS gap_us
        |  FROM events),
        |gaps AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL),
        |u AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
        |cands(g_us) AS (VALUES
        |  (300000000), (900000000), (1800000000), (3600000000)),
        |st AS (
        |  SELECT CAST(g_us AS BIGINT) AS g_us, count(*) AS n_gaps,
        |    CAST(sum(CASE WHEN gap_us > g_us THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_breaks
        |  FROM gaps, cands GROUP BY 1),
        |st2 AS (
        |  SELECT g_us, n_gaps, n_breaks,
        |    n_breaks * 1000000 // n_gaps AS break_ppm
        |  FROM st),
        |ch AS (
        |  SELECT coalesce(min(CASE WHEN break_ppm <= 200000 THEN g_us END),
        |    max(g_us)) AS chosen_g FROM st2)
        |SELECT st2.g_us, st2.n_gaps, st2.n_breaks, st2.break_ppm,
        |  CAST(CASE WHEN st2.g_us = ch.chosen_g THEN 1 ELSE 0 END AS BIGINT)
        |    AS chosen,
        |  CAST(u.n_users + st2.n_breaks AS BIGINT) AS n_sessions
        |FROM st2, ch, u""".stripMargin,

    "q205_conversion_latency" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |  FROM events),
        |su AS (
        |  SELECT user_id, min(ts_us) AS su_us FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1),
        |lat AS (
        |  SELECT ev.user_id, su.su_us // 604800000000 AS cohort_wk,
        |    (min(ev.ts_us) - su.su_us) // 1000000 AS latency_s
        |  FROM ev JOIN su ON su.user_id = ev.user_id
        |  WHERE ev.event_type = 'purchase' AND ev.ts_us >= su.su_us
        |  GROUP BY ev.user_id, su.su_us),
        |rk AS (
        |  SELECT cohort_wk, latency_s,
        |    row_number() OVER (PARTITION BY cohort_wk
        |      ORDER BY latency_s, user_id) AS rn,
        |    count(*) OVER (PARTITION BY cohort_wk) AS n
        |  FROM lat)
        |SELECT cohort_wk, count(*) AS n_converted,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN latency_s END)
        |    AS BIGINT) AS median_s,
        |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN latency_s END)
        |    AS BIGINT) AS p90_s
        |FROM rk GROUP BY cohort_wk""".stripMargin,

    "q81_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |  FROM events),
        |v AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS first_view FROM ev),
        |c AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > first_view
        |    THEN ts_us END) OVER (PARTITION BY user_id) AS first_click FROM v),
        |p AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > first_click
        |    THEN ts_us END) OVER (PARTITION BY user_id) AS first_purchase FROM c)
        |SELECT DISTINCT user_id, first_view, first_click, first_purchase,
        |  CAST(CASE WHEN first_purchase IS NOT NULL THEN 3
        |            WHEN first_click IS NOT NULL THEN 2
        |            WHEN first_view IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS stage
        |FROM p""".stripMargin,

    // bin-trimmed robust mean; windowed sums cast (HUGEINT); cents
    // shifted +1e6 before every floor so `//` (floor) and Spark's
    // `div` (truncate) cannot diverge on negative values
    "q158_trimmed_mean" ->
      """WITH eb AS (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) + 1000000 AS cs,
        |    (CAST(round(value * 100) AS BIGINT) + 1000000) // 500 AS bin
        |  FROM events),
        |hist AS (SELECT event_type, bin, count(*) AS cnt FROM eb GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, bin,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM hist),
        |cuts AS (
        |  SELECT event_type, max(n) AS n,
        |    min(CASE WHEN cum * 10 >= n THEN bin END) AS lo_bin,
        |    min(CASE WHEN cum * 10 >= n * 9 THEN bin END) AS hi_bin
        |  FROM cum GROUP BY event_type)
        |SELECT eb.event_type, max(cuts.n) AS n, count(*) AS n_kept,
        |  max(cuts.lo_bin * 500 - 1000000) AS lo_c,
        |  max(cuts.hi_bin * 500 - 1000000) AS hi_c,
        |  CAST(sum(eb.cs) AS BIGINT) // count(*) - 1000000 AS wmean_c
        |FROM eb JOIN cuts ON cuts.event_type = eb.event_type
        |WHERE eb.bin >= cuts.lo_bin AND eb.bin <= cuts.hi_bin
        |GROUP BY eb.event_type""".stripMargin,

    "q100_robust_stats" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, CAST(round(value * 1024) AS BIGINT) AS vq
        |  FROM events),
        |r1 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY vq, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev),
        |med AS (
        |  SELECT event_type, max(n) AS n,
        |    CAST(max(CASE WHEN rn = (n + 1) // 2 THEN vq END)
        |       + max(CASE WHEN rn = (n + 2) // 2 THEN vq END) AS BIGINT) AS med2
        |  FROM r1 GROUP BY 1),
        |d AS (
        |  SELECT ev.event_type, ev.event_id, med.n, med.med2,
        |    abs(ev.vq * 2 - med.med2) AS dv
        |  FROM ev JOIN med USING (event_type)),
        |r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dv, event_id) AS rn
        |  FROM d)
        |SELECT event_type, max(n) AS n, max(med2) AS med2,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN dv END)
        |     + max(CASE WHEN rn = (n + 2) // 2 THEN dv END) AS BIGINT) AS mad4
        |FROM r2 GROUP BY event_type""".stripMargin,

    "q99_markov_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |  FROM events),
        |tr AS (
        |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |    AS prev_type, event_type FROM ev),
        |g AS (
        |  SELECT prev_type, event_type, count(*) AS n FROM tr
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  (n * 1000000) // CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_ppm
        |FROM g""".stripMargin,

    "q228_markov_backtest" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |    CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT) AS day
        |  FROM events),
        |tr AS (
        |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS prev_type,
        |    event_type, day
        |  FROM ev),
        |tr2 AS (SELECT * FROM tr WHERE prev_type IS NOT NULL),
        |mid AS (SELECT (min(day) + max(day)) // 2 AS mid_day FROM tr2),
        |train AS (
        |  SELECT prev_type, event_type, count(*) AS n
        |  FROM tr2 CROSS JOIN mid WHERE day < mid_day GROUP BY 1, 2),
        |pred AS (
        |  SELECT prev_type, event_type AS predicted FROM (
        |    SELECT prev_type, event_type,
        |      row_number() OVER (PARTITION BY prev_type
        |        ORDER BY n DESC, event_type) AS rn
        |    FROM train) t WHERE rn = 1)
        |SELECT t.prev_type, max(p.predicted) AS predicted,
        |  count(*) AS n_test,
        |  CAST(sum(CASE WHEN t.event_type = p.predicted THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_correct,
        |  CAST((sum(CASE WHEN t.event_type = p.predicted THEN 1 ELSE 0 END)
        |    * 1000000) // count(*) AS BIGINT) AS acc_ppm
        |FROM tr2 t CROSS JOIN mid
        |LEFT JOIN pred p ON p.prev_type = t.prev_type
        |WHERE t.day >= mid.mid_day
        |GROUP BY t.prev_type""".stripMargin,

    "q234_dispersion_index" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, count(*) AS n_days,
        |    CAST(sum(y) AS BIGINT) AS sum_y,
        |    sum(CAST(y AS HUGEINT) * y) AS sum_y2
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days, sum_y,
        |  CAST(CASE WHEN n_days > 1 AND sum_y > 0 THEN
        |    ((CAST(n_days AS HUGEINT) * sum_y2 -
        |      CAST(sum_y AS HUGEINT) * sum_y) * 1000000)
        |      // ((CAST(n_days AS HUGEINT) - 1) * sum_y)
        |    ELSE 0 END AS BIGINT) AS fano_ppm
        |FROM g""".stripMargin,

    // the doubled-midrank Pettitt identity replayed: r2 from the
    // per-type value-band table, U_t = cumulative r2 − t(n+1) over
    // day order, K/changepoint by max-|U| pick (earliest day on ties)
    "q237_pettitt_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |r2 AS (
        |  SELECT event_type, y,
        |    2 * (CAST(sum(nb) OVER (PARTITION BY event_type ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - nb) + nb + 1 AS r2
        |  FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS nb
        |        FROM daily GROUP BY 1, 2) b),
        |ut AS (
        |  SELECT event_type, day, n, s2 - t * (n + 1) AS u_t
        |  FROM (
        |    SELECT d.event_type, d.day,
        |      CAST(count(*) OVER (PARTITION BY d.event_type) AS BIGINT) AS n,
        |      CAST(row_number() OVER (PARTITION BY d.event_type
        |        ORDER BY d.day) AS BIGINT) AS t,
        |      CAST(sum(r2.r2) OVER (PARTITION BY d.event_type ORDER BY d.day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |        AS s2
        |    FROM daily d
        |    JOIN r2 ON d.event_type = r2.event_type AND d.y = r2.y) s
        |  WHERE t < n),
        |k AS (
        |  SELECT event_type, day, n, u_t,
        |    CAST(max(abs(u_t)) OVER (PARTITION BY event_type) AS BIGINT) AS k
        |  FROM ut)
        |SELECT event_type, max(n) AS n_days, max(k) AS k_stat,
        |  min(day) AS cp_day
        |FROM k WHERE abs(u_t) = k GROUP BY event_type""".stripMargin,

    // the pairwise-slope floor replayed with the identical +1e14·Δd
    // shift, lower weighted median by the 2·cum ≥ W rank rule
    "q247_theilsen_trend" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type,
        |    ((b.y - a.y) * 1000000 + 100000000000000 * (b.day - a.day))
        |      // (b.day - a.day) - 100000000000000 AS sl
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |bands AS (
        |  SELECT event_type, sl, CAST(count(*) AS BIGINT) AS b
        |  FROM pairs GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, sl, b,
        |    CAST(sum(b) OVER (PARTITION BY event_type ORDER BY sl
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    CAST(sum(b) OVER (PARTITION BY event_type) AS BIGINT) AS w
        |  FROM bands)
        |SELECT event_type, max(w) AS n_pairs,
        |  min(CASE WHEN cum * 2 >= w THEN sl END) AS med_slope_ppm
        |FROM cum GROUP BY 1""".stripMargin,

    // the Holt recurrence replayed per type over the day-index grid;
    // both numerators run the shifted-numerator floor (+4e15, a
    // multiple of 4, then −1e15 back) so the trajectory is identical
    // whether an engine's integer division truncates or floors
    "q223_holt_smoothing" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(datediff('day', DATE '2024-01-01', ts) AS BIGINT) AS day,
        |    event_type, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |seq AS (
        |  SELECT event_type, y,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS idx
        |  FROM daily),
        |nmax AS (SELECT event_type, max(idx) AS n FROM seq GROUP BY 1),
        |hw AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS idx, y AS l,
        |    CAST(0 AS BIGINT) AS t
        |  FROM seq WHERE idx = 1
        |  UNION ALL
        |  SELECT hw.event_type, hw.idx + 1,
        |    (s.y + 3 * (hw.l + hw.t) + 4000000000000000) // 4
        |      - 1000000000000000,
        |    (((s.y + 3 * (hw.l + hw.t) + 4000000000000000) // 4
        |        - 1000000000000000)
        |      - hw.l + 3 * hw.t + 4000000000000000) // 4
        |      - 1000000000000000
        |  FROM hw JOIN seq s
        |    ON s.event_type = hw.event_type AND s.idx = hw.idx + 1)
        |SELECT hw.event_type, hw.idx AS n_days, hw.l AS level, hw.t AS trend,
        |  hw.l + 7 * hw.t AS forecast_d7
        |FROM hw JOIN nmax
        |  ON nmax.event_type = hw.event_type AND hw.idx = nmax.n""".stripMargin,

    // q99's matrix replayed into an integer power iteration with the
    // tolerance-successor pick
    "q222_markov_stationary" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |  FROM events),
        |tr AS (
        |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |    AS prev_type, event_type FROM ev),
        |g AS (
        |  SELECT prev_type, event_type, count(*) AS n FROM tr
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |m AS (
        |  SELECT prev_type AS f, event_type AS t,
        |    (n * 1000000) // CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
        |      AS p_ppm
        |  FROM g),
        |types AS (SELECT DISTINCT f AS v FROM m),
        |nt AS (SELECT count(*) AS n_types FROM types),
        |pw AS (
        |  SELECT 0 AS iter, v, CAST(1000000 // n_types AS BIGINT) AS p
        |  FROM types CROSS JOIN nt
        |  UNION ALL
        |  SELECT pw.iter + 1, m.t AS v,
        |    CAST(sum(pw.p * m.p_ppm) AS BIGINT) // 1000000 AS p
        |  FROM m JOIN pw ON pw.v = m.f
        |  WHERE pw.iter < 16
        |  GROUP BY pw.iter, m.t),
        |conv AS (
        |  SELECT a.iter + 1 AS k
        |  FROM pw a JOIN pw b ON b.iter = a.iter + 1 AND b.v = a.v
        |  GROUP BY a.iter
        |  HAVING max(abs(a.p - b.p)) <= 1),
        |pick AS (SELECT coalesce(min(k), 16) AS k FROM conv)
        |SELECT pw.v AS event_type, CAST(pw.p AS BIGINT) AS stationary_ppm
        |FROM pw JOIN pick ON pw.iter = pick.k""".stripMargin,

    "q96_bipartite_prop" ->
      """WITH edges AS (
        |  SELECT DISTINCT user_id, CAST(props->>'k' AS BIGINT) AS k
        |  FROM events WHERE event_type = 'click'),
        |deg AS (SELECT user_id, count(*) AS user_deg FROM edges GROUP BY 1)
        |SELECT k, count(*) AS channel_deg,
        |  CAST(sum(1000000 // user_deg) AS BIGINT) AS score_ppm
        |FROM edges JOIN deg USING (user_id)
        |GROUP BY k""".stripMargin,

    "q98_twap" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |    CAST(round(value * 1024) AS BIGINT) AS vq
        |  FROM events),
        |iv AS (
        |  SELECT user_id, vq,
        |    lead(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us
        |      AS dur_us
        |  FROM ev)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(dur_us) AS BIGINT) AS sum_dur_us,
        |  CAST(sum(vq * dur_us) // sum(dur_us) AS BIGINT) AS twap_q
        |FROM iv WHERE dur_us IS NOT NULL AND dur_us > 0
        |GROUP BY user_id""".stripMargin,

    // identical 40/20/40 split, struct-min first purchase, per-touch
    // ppm floors; DuckDB min(struct).field per the composite-key rule
    "q333_ushape_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |    CAST(props->>'k' AS BIGINT) AS k,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |firstp AS (
        |  SELECT user_id,
        |    min(struct_pack(ts_us := ts_us, event_id := event_id,
        |      cents := cents)) AS fp
        |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id),
        |fpx AS (
        |  SELECT user_id, fp.ts_us AS pts, fp.event_id AS pid,
        |    fp.cents AS conv_cents
        |  FROM firstp),
        |path AS (
        |  SELECT e.user_id, e.k, e.ts_us, e.event_id, f.conv_cents
        |  FROM ev e JOIN fpx f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'click'
        |    AND (e.ts_us < f.pts OR (e.ts_us = f.pts AND e.event_id < f.pid))),
        |pos AS (
        |  SELECT user_id, k, conv_cents,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS BIGINT) AS p,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        |  FROM path),
        |credited AS (
        |  SELECT user_id, k,
        |    CASE WHEN n = 1 THEN 1000000
        |         WHEN n = 2 THEN 500000
        |         WHEN p = 1 OR p = n THEN 400000
        |         ELSE 200000 // (n - 2) END AS credit_ppm,
        |    conv_cents * (CASE WHEN n = 1 THEN 1000000
        |         WHEN n = 2 THEN 500000
        |         WHEN p = 1 OR p = n THEN 400000
        |         ELSE 200000 // (n - 2) END) // 1000000 AS attr_cents
        |  FROM pos),
        |unattributed AS (
        |  SELECT f.user_id, CAST(NULL AS BIGINT) AS k,
        |    CAST(1000000 AS BIGINT) AS credit_ppm,
        |    f.conv_cents AS attr_cents
        |  FROM fpx f
        |  WHERE f.user_id NOT IN (SELECT user_id FROM credited)),
        |allc AS (
        |  SELECT * FROM credited UNION ALL SELECT * FROM unattributed)
        |SELECT k AS attr_k, count(*) AS n_touches,
        |  CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_sum,
        |  CAST(sum(attr_cents) AS BIGINT) AS attr_cents
        |FROM allc GROUP BY k""".stripMargin,

    "q92_last_touch" ->
      s"""WITH ev AS (
        |  SELECT user_id, event_type, event_id, value, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |    CAST(props->>'k' AS BIGINT) AS k
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |m AS (
        |  SELECT *, last_value(CASE WHEN event_type = 'click' THEN k END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_k
        |  FROM ev)
        |SELECT attr_k, count(*) AS n_purchases, ${Exact.sumMoneySql("value")} AS attr_value
        |FROM m WHERE event_type = 'purchase' GROUP BY attr_k""".stripMargin,

    "q95_zscore_anomaly" ->
      """WITH hourly AS (
        |  SELECT user_id, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
        |    CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, hr, x,
        |    count(*) OVER (PARTITION BY user_id) AS n,
        |    CAST(sum(x) OVER (PARTITION BY user_id) AS BIGINT) AS sx,
        |    CAST(sum(x * x) OVER (PARTITION BY user_id) AS BIGINT) AS sx2
        |  FROM hourly)
        |SELECT user_id, hr, x,
        |  CAST(CASE WHEN n >= 24 AND (n*x - sx)*(n*x - sx) > 9*(n*sx2 - sx*sx)
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM w""".stripMargin,

    "q88_gap_fill" ->
      """WITH hourly AS (
        |  SELECT user_id, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
        |    CAST(sum(coalesce(CAST(round(value * 1024) AS BIGINT), 0)) AS BIGINT) AS hr_vq
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hr FROM spans),
        |j AS (SELECT g.user_id, g.hr, h.hr_vq FROM grid g
        |      LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr)
        |SELECT user_id, hr,
        |  CAST(last_value(hr_vq IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vq_fill,
        |  CAST(CASE WHEN hr_vq IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
        |FROM j""".stripMargin,

    "q89_cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
        |  FROM events),
        |c AS (SELECT user_id, wk,
        |        min(wk) OVER (PARTITION BY user_id) AS cohort_wk FROM ev),
        |a AS (SELECT cohort_wk, wk - cohort_wk AS wk_offset,
        |        count(DISTINCT user_id) AS n_active
        |      FROM c GROUP BY 1, 2)
        |SELECT cohort_wk, wk_offset, n_active,
        |  CAST(max(CASE WHEN wk_offset = 0 THEN n_active END)
        |    OVER (PARTITION BY cohort_wk) AS BIGINT) AS cohort_size,
        |  CAST((n_active * 1000000) // max(CASE WHEN wk_offset = 0 THEN n_active END)
        |    OVER (PARTITION BY cohort_wk) AS BIGINT) AS ret_ppm
        |FROM a""".stripMargin,

    "q84_change_intervals" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sg AS (
        |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg
        |  FROM m)
        |SELECT user_id, seg, min(event_type) AS event_type,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us, count(*) AS n_events
        |FROM sg GROUP BY user_id, seg""".stripMargin,

    "q68_rolling_user_features" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |    CAST(round(value * 1024) AS BIGINT) AS v_q
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(v_q) OVER (PARTITION BY user_id ORDER BY ts_us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS hr_sum_q,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts_us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS hr_n
        |FROM ev""".stripMargin,

    "q23_tumbling_window" ->
      s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS start_s,
        |  event_type, count(*) AS n, ${Exact.sumMoneySql("value")} AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "q24_sliding_window" ->
      s"""SELECT CAST(epoch(date_trunc('hour', ts) - to_hours(k.k)) AS BIGINT) AS start_s,
        |  event_type, count(*) AS n, ${Exact.sumMoneySql("value")} AS sum_value
        |FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
        |GROUP BY 1, 2""".stripMargin,

    "q114_sliding_dau" ->
      """SELECT CAST((epoch_us(ts) // 21600000000 - k.k) * 21600 AS BIGINT) AS start_s,
        |  count(DISTINCT user_id) AS dau, count(*) AS n
        |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
        |GROUP BY 1""".stripMargin,

    "q25_session_window" ->
      s"""WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS sess_start_us,
        |  CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT) AS sess_end_us,
        |  count(*) AS n, ${Exact.sumMoneySql("value")} AS sum_value
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    "q26_first_event" ->
      """SELECT user_id, event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,

    "q27_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
        |  count(DISTINCT CAST(props->>'k' AS INTEGER)) AS n_distinct_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q111_variant_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k,
        |  count(miss) AS n_miss
        |FROM (
        |  SELECT event_type, CAST(props->>'k' AS INTEGER) AS k,
        |    CAST(props->>'missing' AS INTEGER) AS miss
        |  FROM events) t
        |GROUP BY event_type""".stripMargin,

    "q28_sql_surface" -> sqlSurfaceText,

    "q50_grouping_sets" -> groupingSetsText,

    "q29_asof_join" ->
      """SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, last_click
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
        |  FROM events WHERE event_type IN ('click', 'purchase')) t
        |WHERE event_type = 'purchase'""".stripMargin,

    "q176_peak_concurrency" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked),
        |bounds AS (
        |  SELECT user_id, sid, CAST(epoch_us(min(ts)) AS BIGINT) AS s_us,
        |    CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT) AS e_us
        |  FROM sess GROUP BY user_id, sid),
        |marks AS (
        |  SELECT s_us AS t, 1 AS d FROM bounds
        |  UNION ALL SELECT e_us, -1 FROM bounds),
        |m2 AS (SELECT t, d, t // 3600000000 AS hour FROM marks),
        |cum AS (
        |  SELECT hour, t, d,
        |    CAST(sum(d) OVER (PARTITION BY hour ORDER BY t, d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_in
        |  FROM m2),
        |peaks AS (
        |  SELECT hour, max(cum_in) AS max_in, CAST(sum(d) AS BIGINT) AS hd
        |  FROM cum GROUP BY hour),
        |po AS (
        |  SELECT hour, max_in,
        |    coalesce(CAST(sum(hd) OVER (ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
        |  FROM peaks)
        |SELECT CAST(hour * 3600 AS BIGINT) AS hour_start_s,
        |  CAST(off + greatest(0, max_in) AS BIGINT) AS peak_sessions
        |FROM po""".stripMargin,

    "q173_session_metrics" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked),
        |per AS (
        |  SELECT user_id, sid, count(*) AS n,
        |    CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dwell_us
        |  FROM sess GROUP BY user_id, sid)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
        |  CAST(sum(dwell_us) AS BIGINT) AS total_dwell_us,
        |  CAST(max(n) AS BIGINT) AS max_session_events
        |FROM per GROUP BY user_id""".stripMargin,

    "q170_recursive_series" -> recursiveSeriesText,

    "q171_sql_udf" ->
      """SELECT CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) < 5000000 THEN 'low'
        |  WHEN CAST(round(o_totalprice * 100) AS BIGINT) < 15000000 THEN 'mid'
        |  ELSE 'high' END AS tier,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |FROM orders GROUP BY 1""".stripMargin,

    "q169_asof_tolerance" ->
      """SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |  CASE WHEN epoch_us(ts) - lcu <= 3600000000 THEN lc END
        |    AS click_within_1h,
        |  CASE WHEN epoch_us(ts) - lcu <= 3600000000
        |    THEN CAST(epoch_us(ts) - lcu AS BIGINT) END AS gap_us
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc,
        |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lcu
        |  FROM events WHERE event_type IN ('click', 'purchase')) t
        |WHERE event_type = 'purchase'""".stripMargin,

    "q47_interval_join" ->
      s"""SELECT c.user_id, count(*) AS n_pairs,
        |  count(DISTINCT p.event_id) AS n_purchases,
        |  ${Exact.sumMoneySql("p.value")} AS attributed_value
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |GROUP BY c.user_id""".stripMargin,

    "q30_range_join" ->
      s"""SELECT tier, count(*) AS n, ${Exact.sumMoneySql("value")} AS sum_value
        |FROM events
        |JOIN (VALUES ('t1_low', 0.0, 10.0), ('t2_mid', 10.0, 50.0),
        |             ('t3_high', 50.0, 200.0), ('t4_top', 200.0, 1e9)) AS t(tier, lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY tier""".stripMargin,

    "q103_cooccur_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |marg AS (SELECT event_type, count(*) AS m FROM ut GROUP BY event_type),
        |u AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
        |pairs AS (
        |  SELECT x.event_type AS a, y.event_type AS b, count(*) AS n_both
        |  FROM ut x JOIN ut y ON x.user_id = y.user_id AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT b, a, n_both,
        |  (n_both * 1000000) // n_users AS support_ppm,
        |  (ma.m * 1000000) // n_users AS a_ppm,
        |  (mb.m * 1000000) // n_users AS b_ppm
        |FROM pairs
        |JOIN marg ma ON ma.event_type = pairs.a
        |JOIN marg mb ON mb.event_type = pairs.b
        |CROSS JOIN u""".stripMargin,

    "q108_ewma_fold" ->
      """WITH s AS (
        |  SELECT user_id,
        |    list(CAST(round(value * 100) AS BIGINT) ORDER BY ts, event_id) AS vqs
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(len(vqs) AS BIGINT) AS n_events,
        |  vqs[1] AS first_vq,
        |  list_reduce(vqs, (acc, x) -> (x + 3 * acc) // 4) AS ewma_vq
        |FROM s""".stripMargin,

    "q104_user_type_map" ->
      """SELECT user_id,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
        |  count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id""".stripMargin)
}
