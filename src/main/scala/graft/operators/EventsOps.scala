package graft.operators

import graft.{Q, Tables}
import graft.Q.QueryFn
import org.apache.spark.sql.functions._

/** Event-time window operators over the `events` stream table — the
  * batch-verifiable analogues of the reference's buffer windows
  * (SURVEY.md §2.4: tumbling_window / sliding_window / session_window,
  * crates/arkflow-plugin/src/buffer/). The reference fires these on
  * processing time; the Spark-native design uses event-time `window()` /
  * `session_window()` (identical code path in Structured Streaming with a
  * watermark — see graft.streaming for the processing-time-faithful mode).
  *
  * `ts` arrives as epoch-nanosecond BIGINT (nanosAsLong); converting via
  * timestamp_micros(ts DIV 1000) matches the oracle's `epoch_ns // 1000`
  * truncation exactly.
  */
object EventsOps {

  private def withTs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events")
      .withColumn("tsc", expr("timestamp_micros(ts DIV 1000)"))

  /** Time-series GAP FILL + forward fill — the dense-grid completion an
    * aggregated event stream needs before charting/joining: per key,
    * every `stepSeconds` bucket between that key's first and last
    * observation exists in the output, empty buckets carry n=0 with the
    * last observed aggregate forward-filled.
    *
    * Scale shape: the aggregation is the usual two-phase hash agg; the
    * dense grid is generated ROW-LOCALLY per key (one sequence/explode
    * per key span — never a global calendar cross join); the
    * forward-fill window partitions BY KEY, so no single task ever owns
    * more than one key's timeline. Keys are bounded (event types,
    * devices), buckets per key are span/step — both independent of
    * corpus row count, which is what keeps this plan flat at 100 TB.
    */
  /** OHLC resample — open/high/low/close compression of an irregular
    * value stream into fixed buckets, the standard downsample that
    * keeps the shape of a signal (first, extremes, last) when charting
    * or archiving raw events would drown downstream consumers.
    *
    * One hash aggregation: open/close are struct-ordered min_by/max_by
    * — tie-safe on (ts, tie) even when timestamps collide — and
    * partial-aggregate map-side like every min/max, so the shuffle
    * carries one row per (key, bucket) at any corpus size. Bucket
    * arithmetic is TRUE floor division (matching SQL `//`), so
    * pre-epoch timestamps land in their floor bucket instead of
    * silently sharing bucket 0 with the epoch.
    */
  def ohlcResample(events: org.apache.spark.sql.DataFrame, keyCol: String,
      tsNanosCol: String, tieCol: String, valueCol: String,
      stepSeconds: Long): org.apache.spark.sql.DataFrame = {
    require(stepSeconds > 0, s"step must be positive, got $stepSeconds")
    // integral floor-div (w > 0): trunc-div minus one when the remainder
    // is negative — exact at any magnitude, unlike floor(x / 1e9)
    def fdiv(e: String, w: Long) =
      s"(($e) div $w - (CASE WHEN ($e) % $w < 0 THEN 1 ELSE 0 END))"
    events
      .select(col(keyCol).as("key"), col(tsNanosCol).cast("long").as("tsn"),
        col(tieCol).as("tie"), col(valueCol).as("v"))
      .withColumn("bucket",
        expr(s"${fdiv(fdiv("tsn", 1000000000L), stepSeconds)} * $stepSeconds"))
      .groupBy(col("key"), col("bucket"))
      .agg(
        min_by(col("v"), struct(col("tsn"), col("tie"))).as("open"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        max_by(col("v"), struct(col("tsn"), col("tie"))).as("close"),
        count(lit(1)).as("n"),
        Q.dsum(col("v")).as("sum_value"))
  }

  /** Per-event SESSIONIZATION — stamps each event with its session
    * ordinal: a new session opens when the gap since the key's previous
    * event EXCEEDS `gapNanos` (gap == gapNanos continues the session,
    * matching session_window's gap semantics). The per-event companion
    * of the session-window aggregate (q44): downstream pipelines need
    * the session id ON the event row (dwell time, in-session funnels,
    * per-session packing) — the aggregate alone can't give it.
    *
    * One lag() plus one running sum over the SAME key-partitioned
    * (ts, tie) order — Spark plans both in a single window stage over
    * one shuffle; no task owns more than one key's timeline.
    */
  /** Multi-touch conversion ATTRIBUTION: for every conversion event,
    * the touch events by the same user inside the lookback window get
    * the credit — first-touch and last-touch identified, plus linear
    * (1/n) credit split by touch type. The events-side completion of
    * the funnel family: q133 asks "did the path complete", this asks
    * "which touch earns the conversion".
    *
    * Shape: conversions LEFT-join touches on the user key (zero-touch
    * conversions survive with n=0), bounded by the lookback predicate —
    * per-user fanout is capped by activity within the window, never the
    * full history. One aggregation per conversion; first/last ride a
    * struct-min/max (ts, tie, type) so ties resolve identically to the
    * oracle's ROW_NUMBER. Linear credits are exact rationals rounded at
    * 6dp in both engines.
    */
  def attribution(events: org.apache.spark.sql.DataFrame, keyCol: String,
      tsNanosCol: String, typeCol: String, tieCol: String, convType: String,
      touchTypes: Seq[String], lookbackNanos: Long): org.apache.spark.sql.DataFrame = {
    require(lookbackNanos > 0, s"lookback must be positive, got $lookbackNanos")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    val base = events.select(col(keyCol).as("user_id"),
      col(tsNanosCol).cast("long").as("tsn"), col(typeCol).as("etype"),
      col(tieCol).cast("long").as("eid"))
    val convs = base.filter(col("etype") === convType)
      .select(col("user_id"), col("eid").as("conv_id"), col("tsn").as("conv_tsn"))
    val touches = base.filter(col("etype").isInCollection(touchTypes))
      .select(col("user_id"), col("eid").as("touch_id"),
        col("tsn").as("touch_tsn"), col("etype").as("touch_type"))
    val joined = convs.join(touches, Seq("user_id"), "left")
      .withColumn("in_window",
        col("touch_tsn").isNotNull &&
          col("touch_tsn") <= col("conv_tsn") &&
          col("conv_tsn") - col("touch_tsn") <= lookbackNanos)
    val nWin = sum(when(col("in_window"), 1L).otherwise(0L))
    val credits = touchTypes.map { t =>
      // explicit zero-touch guard: a bare 0/0 is null in Spark but
      // engine-defined elsewhere — CASE it identically to the oracle
      when(nWin > 0,
        round(sum(when(col("in_window") && col("touch_type") === t, 1L)
          .otherwise(0L)).cast("double") / nWin, 6))
        .as(s"credit_$t")
    }
    val aggs = Seq(
      nWin.as("n_touches"),
      min(when(col("in_window"),
        struct(col("touch_tsn"), col("touch_id"), col("touch_type"))))
        .getField("touch_type").as("first_type"),
      max(when(col("in_window"),
        struct(col("touch_tsn"), col("touch_id"), col("touch_type"))))
        .getField("touch_type").as("last_type")) ++ credits
    joined
      .groupBy(col("user_id"), col("conv_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  def sessionize(events: org.apache.spark.sql.DataFrame, keyCol: String,
      tsNanosCol: String, tieCol: String, gapNanos: Long): org.apache.spark.sql.DataFrame = {
    require(gapNanos > 0, s"gap must be positive, got $gapNanos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("tsn"), col("tie"))
    events
      .select(col(keyCol).as("key"), col(tsNanosCol).cast("long").as("tsn"),
        col(tieCol).as("tie"))
      .withColumn("brk",
        when(col("tsn") - lag(col("tsn"), 1).over(w) > gapNanos, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_seq",
        sum(col("brk")).over(w.rowsBetween(Long.MinValue, 0)) + 1L)
      .select(col("key"), col("tie"), col("tsn"), col("session_seq"))
  }

  /** Time-weighted average — the integral mean of an irregularly
    * sampled signal: each observation holds its value until the next
    * one, so the mean weights every value by its HOLDING TIME, not its
    * sample count (a sensor reporting rarely at a high value no longer
    * drowns in a chatty neighbor's samples). The companion of EMA
    * (q119, recency weighting) and gap fill (q130, grid completion)
    * in the irregular-series family.
    *
    * Per key: one lead() window and one aggregation, both partitioned
    * by key — no task ever owns more than one key's timeline. The
    * value×duration products ride DECIMAL: at nanosecond durations a
    * term tops 1e18, past double's 2^53 exact-integer range, so double
    * arithmetic would silently lose grade-visible precision. Values
    * quantize to DECIMAL(12,2) first (the fixture's native granularity)
    * making every term exact in any engine.
    */
  def twap(events: org.apache.spark.sql.DataFrame, keyCol: String,
      tsNanosCol: String, valueCol: String, tieCol: String): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("tsn"), col("tie"))
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 2)
    events
      .select(col(keyCol).as("key"), col(tsNanosCol).cast("long").as("tsn"),
        col(valueCol).cast(org.apache.spark.sql.types.DataTypes
          .createDecimalType(12, 2)).as("v"),
        col(tieCol).as("tie"))
      .withColumn("dt", lead(col("tsn"), 1).over(w) - col("tsn"))
      // dt > 0, not just non-null: the last sample holds for zero time,
      // and duplicate-timestamp rows would otherwise drive span to 0
      // and emit NaN (0/0) for the key
      .filter(col("dt") > 0)
      .groupBy(col("key"))
      .agg(sum((col("v") * col("dt")).cast(dec)).as("vdt"),
        sum(col("dt")).as("span"), count(lit(1)).as("n_holds"))
      .select(col("key"),
        round(col("vdt").cast("double") / col("span"), 6).as("twap"),
        col("span").as("span_ns"), col("n_holds"))
  }

  def gapFill(events: org.apache.spark.sql.DataFrame, keyCol: String,
      tsCol: String, valueCol: String, stepSeconds: Long): org.apache.spark.sql.DataFrame = {
    require(stepSeconds > 0, s"step must be positive, got $stepSeconds")
    val agg = events
      .select(col(keyCol).as("key"),
        // floor, not cast-truncate: pre-epoch timestamps must land in
        // the same bucket the oracle's integer floor-division (//)
        // assigns them to
        (floor(unix_timestamp(col(tsCol)).cast("long") / stepSeconds)
          .cast("long") * stepSeconds).as("bucket"),
        col(valueCol).as("v"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("n"), Q.dsum(col("v")).as("sum_value"))
    val grid = agg.groupBy(col("key"))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("key"),
        explode(sequence(col("mn"), col("mx"), lit(stepSeconds))).as("bucket"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Long.MinValue, 0)
    val wNext = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(0, Long.MaxValue)
    val obsBucket = when(col("sum_value").isNotNull, col("bucket"))
    grid.join(agg, Seq("key", "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("filled_value", last(col("sum_value"), ignoreNulls = true).over(wPrev))
      .withColumn("pb", last(obsBucket, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("sum_value"), ignoreNulls = true).over(wNext))
      .withColumn("nb", first(obsBucket, ignoreNulls = true).over(wNext))
      // linear interpolation across the gap; trailing gaps (no next
      // observation) degrade to the forward fill
      .withColumn("lerp_value", round(
        when(col("nb").isNull || col("nb") === col("pb"), col("filled_value"))
          .otherwise(col("filled_value") +
            (col("nv") - col("filled_value")) *
              (col("bucket") - col("pb")).cast("double") / (col("nb") - col("pb"))), 4))
      .withColumn("is_gap", col("n") === 0)
      .select(col("key"), col("bucket"), col("n"), col("sum_value"),
        col("filled_value"), col("lerp_value"), col("is_gap"))
  }

  /** Ordered-funnel analysis (the ClickHouse `windowFunnel` shape): per
    * user, the earliest time each funnel step completes STRICTLY AFTER
    * the previous step — `steps` is how deep the user got, plus the
    * end-to-end conversion time for full completions.
    *
    * Scale shape: one shuffle on the user key, then three window
    * passes and the final aggregate all reuse the SAME partitioning
    * (Spark plans a single Exchange); per-task state is one user's
    * events. No joins, no ordered global state — this is the funnel
    * formulation that survives billions of events, unlike sessionized
    * sort-and-scan UDFs.
    */
  def funnel(events: org.apache.spark.sql.DataFrame, userCol: String,
      typeCol: String, tsSecCol: String,
      steps: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // partition by the RENAMED key: with userCol != "user_id" the
    // original name no longer exists after the projection below
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val base = events.select(col(userCol).as("user_id"),
      col(typeCol).as("et"), col(tsSecCol).cast("long").as("tsn"))
    val staged = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val cond = if (i == 0) col("et") === step
        else col("et") === step && col("tsn") > col(s"s$i")
      df.withColumn(s"s${i + 1}", min(when(cond, col("tsn"))).over(w))
    }
    val stepCols = steps.indices.map(i => max(col(s"s${i + 1}")).as(s"s${i + 1}"))
    // deepest step wins: the LAST fold iteration must wrap outermost
    val depth = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"s${i + 1}").isNotNull, i + 1).otherwise(acc)
    }
    staged.groupBy(col("user_id"))
      .agg(stepCols.head, stepCols.tail: _*)
      .withColumn("steps", depth)
      .withColumn("convert_secs",
        col(s"s${steps.size}") - col("s1"))
  }

  /** Cohort retention — users grouped by first-seen week, counted in
    * each subsequent week they return: the (cohort, offset) → users
    * retention matrix every activation dashboard is built on. Two
    * user-keyed shuffles: dedupe to (user, week), derive each user's
    * first week, re-join on the same key (no extra exchange shape), and
    * count distinct users per matrix cell — state is bounded by active
    * (user, week) pairs, never raw events. No windows, no ordering.
    */
  def cohortRetention(events: org.apache.spark.sql.DataFrame, userCol: String,
      tsSecCol: String, bucketSeconds: Long = 604800L): org.apache.spark.sql.DataFrame = {
    require(bucketSeconds > 0, s"bucket must be positive, got $bucketSeconds")
    val act = events.select(col(userCol).as("user_id"),
      // floor (not cast-truncate) for pre-epoch parity with the
      // oracle's // division
      floor(col(tsSecCol).cast("long") / bucketSeconds).cast("long").as("wk"))
      .distinct()
    val firstWk = act.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    act.join(firstWk, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Event-transition matrix (first-order Markov counts): for every
    * user's time-ordered event stream, count (from → to) adjacent
    * pairs — the "what do users do next" table behind path analysis
    * and next-action models. One user-keyed shuffle for the lag
    * window (ties broken by event id for determinism), then a
    * map-side-combinable count by the (from, to) cell — cardinality
    * = |event types|², independent of event volume.
    */
  def transitions(events: org.apache.spark.sql.DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events.select(col(userCol), col(typeCol).as("to_type"),
        col(tsCol), col(idCol))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Rolling z-score rate anomalies over the DENSE count series (the
    * [[gapFill]] grid shape — a missing bucket is a zero-count
    * observation, which is exactly what an outage looks like; stats
    * over only observed buckets would hide it). For each bucket, z
    * scores the event count against the trailing `lookback` buckets
    * (exclusive).
    *
    * Numeric parity: counts are integers, so the trailing sum, sum of
    * squares, and the variance NUMERATOR `W·Σx² − (Σx)²` are all exact
    * long arithmetic — the zero-variance guard is an integer compare,
    * and the single double division + sqrt at the end is IEEE-identical
    * across engines. Same per-key window family as the fill itself: one
    * key shuffle serves everything.
    */
  def rateAnomalies(events: org.apache.spark.sql.DataFrame, keyCol: String,
      tsCol: String, stepSeconds: Long,
      lookback: Int = 24, zThreshold: Double = 3.0): org.apache.spark.sql.DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    val wl = lookback.toLong
    // dense COUNT grid (the gapFill shape minus its value machinery —
    // this operator rates event counts, no value column involved)
    val agg = events.select(col(keyCol).as("key"),
        (floor(unix_timestamp(col(tsCol)).cast("long") / stepSeconds)
          .cast("long") * stepSeconds).as("bucket"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val grid = agg.groupBy(col("key"))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("key"),
        explode(sequence(col("mn"), col("mx"), lit(stepSeconds))).as("bucket"))
    grid.join(agg, Seq("key", "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .withColumn("cnt", count(col("n")).over(w))
      .filter(col("cnt") === wl) // full trailing window only
      .withColumn("varnum", lit(wl) * col("s2") - col("s1") * col("s1")) // exact
      .withColumn("z", when(col("varnum") > 0, round(
        (lit(wl) * col("n") - col("s1")).cast("double") /
          sqrt(col("varnum").cast("double") * wl / (wl - 1)), 4)))
      .withColumn("is_anomaly", col("z").isNotNull && abs(col("z")) >= zThreshold)
      .select(col("key"), col("bucket"), col("n"), col("z"), col("is_anomaly"))
  }

  /** Z-ORDER layout keys (the Delta/Iceberg OPTIMIZE ZORDER technique):
    * Morton-interleave the bits of two clustering dimensions so that
    * sorting/binning by the single `zkey` keeps files range-bounded in
    * BOTH dimensions — a time-sorted layout prunes only time predicates,
    * a z-ordered one prunes user AND time scans. Files are FIXED z-range
    * bins (`zkey >> fileShift`), the static-boundary assignment a
    * production writer uses: deterministic, scan-parallel, no global
    * window, and by construction a file's span in EACH dimension is
    * < 2^ceil(shift/2) values. Returns per-file min/max stats — exactly
    * the footer metadata data-skipping reads.
    *
    * The interleave is a literal 2·bits-term shift/mask sum — pure
    * codegen, and the DuckDB oracle evaluates the same arithmetic.
    */
  def zOrderLayout(events: org.apache.spark.sql.DataFrame, uCol: String,
      tCol: String, bits: Int = 12, fileShift: Int = 14): org.apache.spark.sql.DataFrame = {
    require(bits > 0 && bits <= 20 && fileShift >= 0 && fileShift < 2 * bits,
      s"need 0 < bits <= 20 and 0 <= fileShift < 2*bits, got $bits/$fileShift")
    val z = (0 until bits).map { j =>
      s"shiftleft(shiftright($uCol, $j) & 1, ${2 * j}) + " +
        s"shiftleft(shiftright($tCol, $j) & 1, ${2 * j + 1})"
    }.mkString("CAST(", " + ", " AS BIGINT)")
    // FAIL LOUDLY on out-of-range coordinates: a value >= 2^bits (or a
    // negative, whose two's-complement bits shift in sign bits) would
    // silently ALIAS distant keys into the same z-range — destroying
    // exactly the per-file range bounds the layout exists to provide
    // (caught in review: sf0.1's 1500 users overflowed the old 10-bit
    // default and files spanned 1151 users while every check passed)
    val lim = 1L << bits
    events
      .withColumn("zkey", expr(
        s"""CASE WHEN $uCol < 0 OR $uCol >= $lim OR $tCol < 0 OR $tCol >= $lim
           |THEN CAST(raise_error(concat('zOrderLayout: coordinate out of [0, $lim): ',
           |     $uCol, '/', $tCol)) AS BIGINT) ELSE $z END""".stripMargin))
      .withColumn("file_id", expr(s"zkey DIV ${1L << fileShift}"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(uCol)).as("min_u"), max(col(uCol)).as("max_u"),
        min(col(tCol)).as("min_t"), max(col(tCol)).as("max_t"),
        min(col("zkey")).as("min_z"), max(col("zkey")).as("max_z"))
  }

  /** Per-stage Hilbert xy→d expressions (s halving each stage), shared
    * VERBATIM by the Spark projection chain and the oracle CTE text so
    * the two engines can never fork: hd accumulates s²·((3rx)⊕ry)
    * (spelled as a CASE — no XOR dialect split), then (hx,hy) rotate.
    * All three read the PREVIOUS stage's columns, so each stage is one
    * projection. */
  private[operators] def hilbertStage(s: Long): (String, String, String) = (
    s"""hd + ${s * s} * (CASE
       |  WHEN (hx & $s) > 0 AND (hy & $s) > 0 THEN 2
       |  WHEN (hx & $s) > 0 THEN 3
       |  WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)""".stripMargin,
    s"""CASE WHEN (hy & $s) > 0 THEN hx
       |  WHEN (hx & $s) > 0 THEN $s - 1 - hy ELSE hy END""".stripMargin,
    s"""CASE WHEN (hy & $s) > 0 THEN hy
       |  WHEN (hx & $s) > 0 THEN $s - 1 - hx ELSE hx END""".stripMargin)

  /** HILBERT-curve layout keys — the locality-preserving alternative
    * to [[zOrderLayout]]'s Morton interleave: consecutive Hilbert keys
    * are ALWAYS grid-adjacent (Morton jumps across quadrant seams), so
    * fixed key-range files get tighter per-dimension bounds at the
    * same file count — the reason Databricks liquid clustering moved
    * beyond Z-order. Same contract as q139: fixed key-range file bins,
    * per-file min/max footer stats, loud range guard. The curve
    * property itself (bijection + unit-step adjacency) is pinned by a
    * ScalaTest property spec, so the shared-expression oracle diff
    * can't hide an algorithmic slip. Pure projection chain — one
    * stage per bit, zero shuffles before the stats aggregation.
    */
  /** Per-row Hilbert keys (`hd` column added; `uCol`/`tCol` carried) —
    * the raw-key core of [[hilbertLayout]], separated so the curve
    * property spec can pin bijection + unit-step adjacency. */
  private[operators] def hilbertKeys(events: org.apache.spark.sql.DataFrame,
      uCol: String, tCol: String,
      bits: Int): org.apache.spark.sql.DataFrame = {
    val lim = 1L << bits
    var df = events
      .withColumn("hx", expr(
        s"""CASE WHEN $uCol < 0 OR $uCol >= $lim OR $tCol < 0 OR $tCol >= $lim
           |THEN CAST(raise_error(concat('hilbertLayout: coordinate out of [0, $lim): ',
           |     $uCol, '/', $tCol)) AS BIGINT) ELSE CAST($uCol AS BIGINT) END""".stripMargin))
      .withColumn("hy", col(tCol).cast("long"))
      .withColumn("hd", lit(0L))
    (0 until bits).foreach { i =>
      val (hdE, hxE, hyE) = hilbertStage(1L << (bits - 1 - i))
      df = df.select(col(uCol), col(tCol),
        expr(hdE).as("hd"), expr(hxE).as("hx"), expr(hyE).as("hy"))
    }
    df.select(col(uCol), col(tCol), col("hd"))
  }

  def hilbertLayout(events: org.apache.spark.sql.DataFrame, uCol: String,
      tCol: String, bits: Int = 11,
      fileShift: Int = 14): org.apache.spark.sql.DataFrame = {
    require(bits > 0 && bits <= 20 && fileShift >= 0 && fileShift < 2 * bits,
      s"need 0 < bits <= 20 and 0 <= fileShift < 2*bits, got $bits/$fileShift")
    hilbertKeys(events, uCol, tCol, bits)
      .withColumn("file_id", expr(s"hd DIV ${1L << fileShift}"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(uCol)).as("min_u"), max(col(uCol)).as("max_u"),
        min(col(tCol)).as("min_t"), max(col(tCol)).as("max_t"),
        min(col("hd")).as("min_h"), max(col("hd")).as("max_h"))
  }

  /** Trimmed + winsorized mean per group — the robust location
    * estimators a metrics pipeline swaps in when raw means chase
    * outliers ([[Selection]] q204's modified-z flags them; these
    * summarize WITHOUT them). Rank-based trimming (drop the lowest and
    * highest n/`trimDenom` BY COUNT, deterministic tiebreak) rather
    * than value-quantile trimming, so the estimate is exact under ties
    * and engine-identical. Winsorizing clamps instead of dropping:
    * winsor_mean = (trimmed_sum + k·lo + k·hi)/n — computed post-agg
    * from the boundary values, no second pass.
    *
    * One rank window per group + one aggregation, both partitioned by
    * the group key; values ride DECIMAL so sums are exact.
    */
  def trimmedStats(events: org.apache.spark.sql.DataFrame, groupCol: String,
      valCol: String, tieCol: String,
      trimDenom: Int = 10): org.apache.spark.sql.DataFrame = {
    require(trimDenom >= 3, s"trimDenom must be >= 3, got $trimDenom")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(12, 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("tie"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    events
      .select(col(groupCol).as("g"), col(valCol).cast(dec).as("v"),
        col(tieCol).as("tie"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("k", expr(s"n div $trimDenom"))
      .groupBy(col("g"))
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        sum(when(col("rnk") > col("k") && col("rnk") <= col("n") - col("k"),
          col("v"))).as("tsum"),
        max(when(col("rnk") === col("k") + 1, col("v"))).as("lo_v"),
        max(when(col("rnk") === col("n") - col("k"), col("v"))).as("hi_v"))
      .select(col("g"), col("n"), col("k"),
        col("lo_v").cast("double").as("lo_v"),
        col("hi_v").cast("double").as("hi_v"),
        round(col("tsum").cast("double") / (col("n") - lit(2L) * col("k")), 6)
          .as("trimmed_mean"),
        round((col("tsum") + col("lo_v") * col("k") + col("hi_v") * col("k"))
          .cast("double") / col("n"), 6).as("winsor_mean"))
  }

  /** Kaplan-Meier survival over user lifetimes — the retention curve
    * with CENSORING done right: a user still active near the corpus
    * edge hasn't churned, they're censored, and dropping that
    * distinction biases survival low (the q134 cohort table can't
    * express it). Lifetime = whole days first→last event (integer
    * nanosecond division); censored when the last event falls within
    * `censorDays` of the corpus max. S(t) = Π_{u≤t}(1 − d_u/n_u) with
    * the at-risk set as a suffix sum over the duration table; every
    * factor is a ratio of integers, the product runs as a DECIMAL
    * cumulative log-sum (exp at the end), and an all-remaining-die
    * final step short-circuits to exactly 0 instead of ln(0).
    *
    * The corpus collapses to one row per user, then one row per
    * distinct duration (support-bounded) — the windows run over THAT.
    */
  def kaplanMeier(events: org.apache.spark.sql.DataFrame, userCol: String,
      tsNanosCol: String,
      censorDays: Long = 7L): org.apache.spark.sql.DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 18)
    val day = 86400000000000L
    val per = events.groupBy(col(userCol).as("u"))
      .agg(min(col(tsNanosCol).cast("long")).as("t0"),
        max(col(tsNanosCol).cast("long")).as("t1"))
    val mx = per.agg(max(col("t1")).as("tmax"))
    val base = per.crossJoin(broadcast(mx))
      .select(expr(s"(t1 - t0) div $day").as("dur"),
        (col("tmax") - col("t1") >= lit(censorDays * day)).cast("long")
          .as("event"))
    val byDur = base.groupBy(col("dur"))
      .agg(count(lit(1)).as("c_all"), sum(col("event")).as("d"))
    val wRisk = org.apache.spark.sql.expressions.Window
      .orderBy(col("dur")).rowsBetween(0, Long.MaxValue)
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("dur")).rowsBetween(Long.MinValue, 0)
    byDur
      .withColumn("n_risk", sum(col("c_all")).over(wRisk))
      .withColumn("ln_term",
        when(col("d") > 0 && col("n_risk") > col("d"),
          log((col("n_risk") - col("d")).cast("double") / col("n_risk")))
          .otherwise(lit(0.0)).cast(dec))
      .withColumn("zero_flag",
        when(col("d") > 0 && col("n_risk") === col("d"), 1L).otherwise(0L))
      .withColumn("cum_zero", max(col("zero_flag")).over(wCum))
      .withColumn("cum_ln", sum(col("ln_term")).over(wCum))
      .filter(col("d") > 0)
      .select(col("dur").as("dur_days"), col("n_risk"),
        col("d").as("d_events"),
        when(col("cum_zero") === 1, lit(0.0))
          .otherwise(round(exp(col("cum_ln").cast("double")), 6))
          .as("survival"))
  }

  /** Association rules over session item sets — support / confidence /
    * lift for every co-occurring pair of event types within a session
    * (market-basket over behavioral sessions; lift > 1 = genuinely
    * associated, not just both-frequent). Sessions are the q160 gap
    * sessionization; item sets are DISTINCT types per session, so the
    * pair self-join fans out only |types|² per session — bounded by
    * the type vocabulary, not event volume.
    */
  def assocRules(events: org.apache.spark.sql.DataFrame, userCol: String,
      tsNanosCol: String, tieCol: String, itemCol: String, gapNanos: Long,
      minSupport: Long = 5L): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("tsn"), col("tie"))
    val items = events
      .select(col(userCol).as("key"), col(tsNanosCol).cast("long").as("tsn"),
        col(tieCol).as("tie"), col(itemCol).as("item"))
      .withColumn("brk",
        when(col("tsn") - lag(col("tsn"), 1).over(w) > gapNanos, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_seq",
        sum(col("brk")).over(w.rowsBetween(Long.MinValue, 0)) + 1L)
      .select(col("key"), col("session_seq"), col("item")).distinct()
    val totals = items.agg(
      countDistinct(col("key"), col("session_seq")).as("ns"))
    val counts = items.groupBy(col("item")).agg(count(lit(1)).as("n_i"))
    val pairs = items.select(col("key"), col("session_seq"), col("item").as("a"))
      .join(items.select(col("key"), col("session_seq"), col("item").as("b")),
        Seq("key", "session_seq"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    pairs.filter(col("n_ab") >= minSupport)
      .join(counts.select(col("item").as("a"), col("n_i").as("n_a")), "a")
      .join(counts.select(col("item").as("b"), col("n_i").as("n_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_a"), col("n_b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_ab"),
        round(col("n_ab").cast("double") / col("n_b"), 6).as("conf_ba"),
        round((col("n_ab") * col("ns")).cast("double") /
          (col("n_a") * col("n_b")), 6).as("lift"))
  }

  /** Rate changepoint by binary segmentation (one split) — "WHEN did
    * the rate change": the split hour minimizing the two-segment SSE
    * of hourly counts, the sequential complement to [[overdispersion]]
    * (bursty overall) and q136 (which hours are odd). Every candidate
    * split is scored from integer prefix sums (k, Σn, Σn²) — cost =
    * (q₁ − s₁²/k₁) + ((Q−q₁) − (S−s₁)²/(K−k₁)) — so the scan is one
    * window pass over the support-bounded hour table; the argmin takes
    * rounded cost with the hour as deterministic tiebreak. Output: the
    * split, both segment means, and the SSE with/without the split
    * (the variance-reduction evidence; recurse on segments for more
    * changepoints). Σn² rides BIGINT — corpus counts past ~3e9 per
    * bucket want a DECIMAL cast.
    *
    * Hours are OBSERVED hours ([[overdispersion]]'s convention —
    * densify with q130 first if gaps matter).
    */
  def rateChangepoint(events: org.apache.spark.sql.DataFrame,
      tsNanosCol: String,
      stepSeconds: Long = 3600L): org.apache.spark.sql.DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val byT = events
      .select(expr(
        s"CAST($tsNanosCol AS BIGINT) div ${stepSeconds * 1000000000L}")
        .as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("t")).rowsBetween(Long.MinValue, 0)
    val tot = byT.agg(count(lit(1)).as("kk"), sum(col("n")).as("ss"),
      sum(col("n") * col("n")).as("qq"))
    byT
      .withColumn("k1", count(lit(1)).over(w))
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("q1", sum(col("n") * col("n")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("k1") < col("kk"))
      .select(col("t").as("split_t"), col("k1").as("k_left"),
        (col("kk") - col("k1")).as("k_right"),
        round(col("s1").cast("double") / col("k1"), 6).as("mean_left"),
        round((col("ss") - col("s1")).cast("double") /
          (col("kk") - col("k1")), 6).as("mean_right"),
        round((col("q1").cast("double") -
            (col("s1") * col("s1")).cast("double") / col("k1")) +
          ((col("qq") - col("q1")).cast("double") -
            ((col("ss") - col("s1")) * (col("ss") - col("s1")))
              .cast("double") / (col("kk") - col("k1"))), 6).as("sse_split"),
        round(col("qq").cast("double") -
          (col("ss") * col("ss")).cast("double") / col("kk"), 6)
          .as("sse_total"))
      .orderBy(col("sse_split"), col("split_t"))
      .limit(1)
  }

  /** Count overdispersion audit — per key, is the daily event count
    * Poisson-like (VMR ≈ 1) or bursty (VMR ≫ 1)? The check that must
    * precede any Poisson-assuming rate alarm (q136's z-scores): bursty
    * traffic under a Poisson model fires false anomalies all day.
    * Variance-to-mean ratio and the chi-square dispersion index both
    * reduce to exact integer ratios over (k, Σn, Σn²) — VMR =
    * (k·Σn² − (Σn)²) / ((k−1)·Σn) — and the over-threshold flag
    * compares INTEGERS (k·Σn² − (Σn)² > T·(k−1)·Σn), so no rounded
    * double ever gates a decision. Days are observed days (a key with
    * zero-count gap days understates variance; densify with q130's
    * gap fill first if that matters).
    *
    * Two aggregations: corpus → (key, day) → key. Map-side combinable
    * throughout.
    */
  def overdispersion(events: org.apache.spark.sql.DataFrame, keyCol: String,
      tsNanosCol: String,
      threshold: Long = 2L): org.apache.spark.sql.DataFrame = {
    val day = 86400000000000L
    val byDay = events
      .select(col(keyCol).as("key"),
        expr(s"CAST($tsNanosCol AS BIGINT) div $day").as("d"))
      .groupBy(col("key"), col("d")).agg(count(lit(1)).as("n"))
    byDay.groupBy(col("key"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
      .select(col("key"), col("k"), col("s1").as("total"),
        round(col("s1").cast("double") / col("k"), 6).as("mean"),
        round((col("k") * col("s2") - col("s1") * col("s1")).cast("double") /
          ((col("k") - lit(1L)) * col("s1")), 6).as("vmr"),
        round((col("k") * col("s2") - col("s1") * col("s1")).cast("double") /
          col("s1"), 6).as("chi2"),
        (col("k") * col("s2") - col("s1") * col("s1") >
          lit(threshold) * (col("k") - lit(1L)) * col("s1")).cast("int")
          .as("overdispersed"))
  }

  /** Chat-template flattening with loss-mask spans — the SFT-data
    * assembly step: interaction logs sessionize into conversations,
    * turns alternate user/assistant roles, each conversation flattens
    * under a fixed template (`<|role|>content<|end|>` per turn), and
    * the trainer needs the character spans of ASSISTANT content only —
    * the loss mask (user turns are context, not targets). Emits one
    * row per assistant turn with its 0-based [mask_start, mask_end)
    * span in the flattened text, plus the session's turn count and
    * total length.
    *
    * All windows partition by (user, session) — no task ever owns more
    * than one conversation; offsets are exact integer running sums of
    * template-part lengths (no text materialization needed to place
    * the spans).
    */
  def chatTemplate(events: org.apache.spark.sql.DataFrame, userCol: String,
      tsNanosCol: String, tieCol: String, contentCol: String,
      gapNanos: Long): org.apache.spark.sql.DataFrame = {
    require(gapNanos > 0, s"gap must be positive, got $gapNanos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("tsn"), col("tie"))
    val base = events
      .select(col(userCol).as("key"), col(tsNanosCol).cast("long").as("tsn"),
        col(tieCol).as("tie"), col(contentCol).as("content"))
      .withColumn("brk",
        when(col("tsn") - lag(col("tsn"), 1).over(w) > gapNanos, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_seq",
        sum(col("brk")).over(w.rowsBetween(Long.MinValue, 0)) + 1L)
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"), col("session_seq"))
      .orderBy(col("tsn"), col("tie"))
    val wsAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"), col("session_seq"))
    base
      .withColumn("turn_idx", row_number().over(ws).cast("long"))
      .withColumn("role",
        when(col("turn_idx") % 2 === 1, lit("user")).otherwise(lit("assistant")))
      .withColumn("plen",
        length(concat(lit("<|"), col("role"), lit("|>"), col("content"),
          lit("<|end|>"))).cast("long"))
      .withColumn("prior",
        coalesce(sum(col("plen")).over(ws.rowsBetween(Long.MinValue, -1)),
          lit(0L)))
      .withColumn("n_turns", count(lit(1)).over(wsAll))
      .withColumn("total_len", sum(col("plen")).over(wsAll))
      .filter(col("role") === "assistant")
      .select(col("key").as("user_id"), col("session_seq"), col("turn_idx"),
        (col("prior") + lit("<|assistant|>".length.toLong)).as("mask_start"),
        (col("prior") + lit("<|assistant|>".length.toLong) +
          length(col("content")).cast("long")).as("mask_end"),
        col("n_turns"), col("total_len"))
  }

  /** RFM segmentation — the classic behavioral user segmentation
    * (Recency of last event, Frequency of events, Monetary value),
    * each quartiled and concatenated to a 3-digit segment label
    * ("444" = best customers, "111" = churned low-value). Recency is
    * whole days behind the corpus max timestamp (integer nanosecond
    * division — the epoch-nano values exceed 2^53, so double math
    * would corrupt them). One aggregation to the per-user table; the
    * ntile windows run over THAT table (one row per user, the usual
    * orders-of-magnitude collapse), with the user id as the
    * deterministic tiebreak. Quartile direction follows the RFM
    * convention: 4 = most recent / most frequent / highest value.
    */
  def rfmSegments(events: org.apache.spark.sql.DataFrame, userCol: String,
      tsCol: String, valueCol: String): org.apache.spark.sql.DataFrame = {
    val per = events.groupBy(col(userCol).as("user_id"))
      .agg(max(col(tsCol)).as("last_ts"),
        count(lit(1)).as("frequency"),
        Q.dsum(col(valueCol)).as("monetary"))
    val mx = per.agg(max(col("last_ts")).as("max_ts"))
    val base = per.crossJoin(broadcast(mx))
      .withColumn("recency_days",
        expr("(max_ts - last_ts) div 86400000000000"))
    val wR = org.apache.spark.sql.expressions.Window
      .orderBy(col("recency_days").desc, col("user_id"))
    val wF = org.apache.spark.sql.expressions.Window
      .orderBy(col("frequency"), col("user_id"))
    val wM = org.apache.spark.sql.expressions.Window
      .orderBy(col("monetary"), col("user_id"))
    base
      .withColumn("r_q", ntile(4).over(wR))
      .withColumn("f_q", ntile(4).over(wF))
      .withColumn("m_q", ntile(4).over(wM))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_q"), col("f_q"), col("m_q"),
        concat(col("r_q"), col("f_q"), col("m_q")).as("segment"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q215_rfm" -> ((s, dir) =>
      rfmSegments(Tables.load(s, dir, "events"), "user_id", "ts", "value")
        .orderBy(col("user_id"))),

    "q238_overdispersion" -> ((s, dir) =>
      overdispersion(Tables.load(s, dir, "events"), "event_type", "ts")
        .orderBy(col("key"))),

    "q241_changepoint" -> ((s, dir) =>
      rateChangepoint(Tables.load(s, dir, "events"), "ts")),

    "q226_trimmed_mean" -> ((s, dir) =>
      trimmedStats(Tables.load(s, dir, "events"), "event_type", "value",
        "event_id", trimDenom = 10)
        .orderBy(col("g"))),

    // 1-day horizon: the synthetic users are near-continuously active
    // over the whole corpus span, so day-scale inactivity IS churn here
    "q227_kaplan_meier" -> ((s, dir) =>
      kaplanMeier(Tables.load(s, dir, "events"), "user_id", "ts",
        censorDays = 1L)
        .orderBy(col("dur_days"))),

    "q228_assoc_rules" -> ((s, dir) =>
      assocRules(Tables.load(s, dir, "events"), "user_id", "ts", "event_id",
        "event_type", gapNanos = 4L * 3600L * 1000000000L)
        .orderBy(col("a"), col("b"))),

    // q160's 4-hour session gap; event_type as the turn content
    "q222_chat_template" -> ((s, dir) =>
      chatTemplate(Tables.load(s, dir, "events"), "user_id", "ts",
        "event_id", "event_type", gapNanos = 4L * 3600L * 1000000000L)
        .orderBy(col("user_id"), col("session_seq"), col("turn_idx"))),

    "q236_hilbert_layout" -> ((s, dir) =>
      hilbertLayout(Tables.load(s, dir, "events")
          .withColumn("u", col("user_id").cast("long"))
          .withColumn("t", expr(
            "CAST(floor((ts DIV 1000000000 - 1704067200) / 3600) AS BIGINT)")),
        "u", "t")
        .orderBy(col("file_id"))),

    "q139_zorder_layout" -> ((s, dir) =>
      zOrderLayout(Tables.load(s, dir, "events")
          .withColumn("u", col("user_id").cast("long"))
          // hour index from the fixed corpus origin (2024-01-01);
          // floor (not DIV-truncate) so a pre-origin timestamp would
          // match the oracle's // — and then fail the range guard
          // loudly rather than interleave sign bits
          .withColumn("t", expr(
            "CAST(floor((ts DIV 1000000000 - 1704067200) / 3600) AS BIGINT)")),
        "u", "t")
        .orderBy(col("file_id"))),

    "q136_rate_anomalies" -> ((s, dir) =>
      rateAnomalies(withTs(s, dir), "event_type", "tsc",
        stepSeconds = 3600L, lookback = 24, zThreshold = 3.0)
        .orderBy(col("key"), col("bucket"))),

    "q135_transitions" -> ((s, dir) =>
      transitions(Tables.load(s, dir, "events"), "user_id", "event_type",
        "ts", "event_id")
        .orderBy(col("from_type"), col("to_type"))),

    "q134_cohort_retention" -> ((s, dir) =>
      cohortRetention(Tables.load(s, dir, "events")
          .withColumn("tsn", expr("ts DIV 1000000000")),
        "user_id", "tsn")
        .orderBy(col("cohort_wk"), col("week_offset"))),

    "q182_attribution" -> ((s, dir) =>
      attribution(Tables.load(s, dir, "events"), "user_id", "ts",
        "event_type", "event_id", convType = "purchase",
        touchTypes = Seq("view", "click"),
        lookbackNanos = 7L * 86400L * 1000000000L)
        .orderBy(col("user_id"), col("conv_id"))),

    "q133_funnel" -> ((s, dir) =>
      funnel(Tables.load(s, dir, "events")
          .withColumn("tsn", expr("ts DIV 1000000000")),
        "user_id", "event_type", "tsn", Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))),

    // sessionize ∘ funnel: q133 measures view→click→purchase over a
    // user's WHOLE history; product metrics want it within one visit.
    // The composite (user:session) key also partitions the funnel
    // windows finer than q133's per-user frames — more parallelism.
    "q166_session_funnel" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val stamped = sessionize(ev, "user_id", "ts", "event_id",
        gapNanos = 4L * 3600L * 1000000000L)
      val sessed = ev.select(col("event_id"), col("user_id"),
          col("event_type"), expr("ts DIV 1000000000").as("tsn0"))
        .join(stamped.select(col("tie").as("event_id"), col("session_seq")),
          "event_id")
        .withColumn("skey",
          concat_ws(":", col("user_id"), col("session_seq")))
      funnel(sessed, "skey", "event_type", "tsn0",
          Seq("view", "click", "purchase"))
        .select(
          split(col("user_id"), ":").getItem(0).cast("long").as("user_id"),
          split(col("user_id"), ":").getItem(1).cast("long").as("session_seq"),
          col("s1"), col("s2"), col("s3"), col("steps"), col("convert_secs"))
        .orderBy(col("user_id"), col("session_seq"))
    }),

    "q130_gapfill" -> ((s, dir) =>
      gapFill(withTs(s, dir), "event_type", "tsc", "value", stepSeconds = 3600L)
        .orderBy(col("key"), col("bucket"))),

    "q159_twap" -> ((s, dir) =>
      twap(Tables.load(s, dir, "events"), "user_id", "ts", "value", "event_id")
        .orderBy(col("key"))),

    "q160_sessionize" -> ((s, dir) =>
      sessionize(Tables.load(s, dir, "events"), "user_id", "ts", "event_id",
        gapNanos = 4L * 3600L * 1000000000L)
        .orderBy(col("key"), col("tsn"), col("tie"))),

    "q162_ohlc" -> ((s, dir) =>
      ohlcResample(Tables.load(s, dir, "events"), "event_type", "ts",
        "event_id", "value", stepSeconds = 3600L)
        .orderBy(col("key"), col("bucket"))),

    // Tumbling 1-hour windows (buffer/tumbling_window.rs:39-47 analogue).
    "q42_tumbling_window" -> ((s, dir) =>
      withTs(s, dir)
        .groupBy(window(col("tsc"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))),

    // Sliding 1-hour/30-minute windows (buffer/sliding_window.rs:41-50).
    "q43_sliding_window" -> ((s, dir) =>
      withTs(s, dir)
        .groupBy(window(col("tsc"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))),

    // Session windows, 10-minute gap, keyed by user (buffer/session_window.rs:40-49).
    "q44_session_window" -> ((s, dir) =>
      withTs(s, dir)
        .groupBy(session_window(col("tsc"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("session_start"),
          unix_timestamp(col("session_window.end")).as("session_end"),
          col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))),

    // Deterministic dedup-keep-first on (user_id, event_type): the
    // arkflow `DISTINCT`/drop-duplicates shape but with a total order, so
    // the survivor is well-defined (dropDuplicates picks arbitrarily).
    "q45_dedup_first" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q215_rfm" ->
      """WITH per AS (
        |  SELECT user_id, max(epoch_ns(ts)) AS last_ts,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
        |      AS monetary
        |  FROM events GROUP BY user_id
        |), mx AS (SELECT max(last_ts) AS max_ts FROM per),
        |base AS (
        |  SELECT p.user_id, p.frequency, p.monetary,
        |    (mx.max_ts - p.last_ts) // 86400000000000 AS recency_days
        |  FROM per p CROSS JOIN mx
        |), q AS (
        |  SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
        |    frequency, monetary,
        |    CAST(ntile(4) OVER (ORDER BY recency_days DESC, user_id) AS INT) AS r_q,
        |    CAST(ntile(4) OVER (ORDER BY frequency, user_id) AS INT) AS f_q,
        |    CAST(ntile(4) OVER (ORDER BY monetary, user_id) AS INT) AS m_q
        |  FROM base
        |)
        |SELECT user_id, recency_days, frequency, monetary, r_q, f_q, m_q,
        |  CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) ||
        |    CAST(m_q AS VARCHAR) AS segment
        |FROM q
        |ORDER BY user_id""".stripMargin,

    "q236_hilbert_layout" -> {
      val bits = 11
      val stages = (0 until bits).map { i =>
        val (hdE, hxE, hyE) = hilbertStage(1L << (bits - 1 - i))
        s"""h${i + 1} AS (
           |  SELECT u, t,
           |    $hdE AS hd,
           |    $hxE AS hx,
           |    $hyE AS hy
           |  FROM h$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT CAST(user_id AS BIGINT) AS u,
         |    (epoch_ns(ts) // 1000000000 - 1704067200) // 3600 AS t
         |  FROM events
         |), h0 AS (
         |  SELECT u, t, u AS hx, t AS hy, CAST(0 AS BIGINT) AS hd FROM e
         |),
         |$stages
         |SELECT hd // 16384 AS file_id, count(*) AS n_rows,
         |  min(u) AS min_u, max(u) AS max_u,
         |  min(t) AS min_t, max(t) AS max_t,
         |  min(hd) AS min_h, max(hd) AS max_h
         |FROM h$bits
         |GROUP BY file_id
         |ORDER BY file_id""".stripMargin
    },

    "q139_zorder_layout" -> {
      val z = (0 until 12).map { j =>
        s"(((u >> $j) & 1) << ${2 * j}) + (((t >> $j) & 1) << ${2 * j + 1})"
      }.mkString("CAST(", " + ", " AS BIGINT)")
      s"""WITH e AS (
         |  SELECT CAST(user_id AS BIGINT) AS u,
         |    (epoch_ns(ts) // 1000000000 - 1704067200) // 3600 AS t
         |  FROM events
         |), z AS (
         |  SELECT u, t, $z AS zkey FROM e
         |)
         |SELECT zkey // 16384 AS file_id, count(*) AS n_rows,
         |  min(u) AS min_u, max(u) AS max_u,
         |  min(t) AS min_t, max(t) AS max_t,
         |  min(zkey) AS min_z, max(zkey) AS max_z
         |FROM z
         |GROUP BY file_id
         |ORDER BY file_id""".stripMargin
    },

    "q136_rate_anomalies" ->
      """WITH agg AS (
        |  SELECT event_type AS key,
        |    epoch_ns(ts) // 3600000000000 * 3600 AS bucket, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), spans AS (
        |  SELECT key, min(bucket) AS mn, max(bucket) AS mx FROM agg GROUP BY key
        |), grid AS (
        |  SELECT key, CAST(unnest(generate_series(mn, mx, 3600)) AS BIGINT) AS bucket
        |  FROM spans
        |), filled AS (
        |  SELECT g.key, g.bucket, CAST(coalesce(n, 0) AS BIGINT) AS n
        |  FROM grid g LEFT JOIN agg a ON a.key = g.key AND a.bucket = g.bucket
        |), stats AS (
        |  SELECT key, bucket, n,
        |    CAST(sum(n) OVER tw AS BIGINT) AS s1,
        |    CAST(sum(n * n) OVER tw AS BIGINT) AS s2,
        |    count(n) OVER tw AS cnt
        |  FROM filled
        |  WINDOW tw AS (PARTITION BY key ORDER BY bucket
        |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |), scored AS (
        |  SELECT key, bucket, n, 24 * s2 - s1 * s1 AS varnum, s1
        |  FROM stats WHERE cnt = 24
        |)
        |SELECT key, bucket, n,
        |  CASE WHEN varnum > 0 THEN
        |    round(CAST(24 * n - s1 AS DOUBLE) / sqrt(CAST(varnum AS DOUBLE) * 24 / 23), 4)
        |  END AS z,
        |  CASE WHEN varnum > 0 THEN
        |    abs(round(CAST(24 * n - s1 AS DOUBLE) / sqrt(CAST(varnum AS DOUBLE) * 24 / 23), 4)) >= 3.0
        |  ELSE FALSE END AS is_anomaly
        |FROM scored
        |ORDER BY key, bucket""".stripMargin,

    "q135_transitions" ->
      """WITH o AS (
        |  SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events
        |)
        |SELECT from_type, to_type, count(*) AS n
        |FROM o WHERE from_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,

    "q134_cohort_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 1000000000 // 604800 AS wk
        |  FROM events
        |), fw AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id
        |)
        |SELECT cohort_wk, wk - cohort_wk AS week_offset,
        |  count(DISTINCT act.user_id) AS n_users
        |FROM act JOIN fw USING (user_id)
        |GROUP BY cohort_wk, week_offset
        |ORDER BY cohort_wk, week_offset""".stripMargin,

    "q166_session_funnel" ->
      """WITH o AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) AS tsn9,
        |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
        |        PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        |      > 14400000000000 THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), e AS (
        |  SELECT user_id,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tsn9, event_id
        |      ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT) AS session_seq,
        |    event_type, tsn9 // 1000000000 AS tsn
        |  FROM o
        |), u1 AS (
        |  SELECT user_id, session_seq,
        |    min(CASE WHEN event_type = 'view' THEN tsn END) AS s1
        |  FROM e GROUP BY 1, 2
        |), u2 AS (
        |  SELECT e.user_id, e.session_seq,
        |    min(CASE WHEN event_type = 'click' AND tsn > s1 THEN tsn END) AS s2
        |  FROM e JOIN u1 USING (user_id, session_seq) GROUP BY 1, 2
        |), u3 AS (
        |  SELECT e.user_id, e.session_seq,
        |    min(CASE WHEN event_type = 'purchase' AND tsn > s2 THEN tsn END) AS s3
        |  FROM e JOIN u2 USING (user_id, session_seq) GROUP BY 1, 2
        |)
        |SELECT u1.user_id, u1.session_seq, s1, s2, s3,
        |  CASE WHEN s3 IS NOT NULL THEN 3 WHEN s2 IS NOT NULL THEN 2
        |       WHEN s1 IS NOT NULL THEN 1 ELSE 0 END AS steps,
        |  s3 - s1 AS convert_secs
        |FROM u1 JOIN u2 USING (user_id, session_seq)
        |JOIN u3 USING (user_id, session_seq)
        |ORDER BY user_id, session_seq""".stripMargin,

    "q133_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS tsn FROM events
        |), u1 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN tsn END) AS s1
        |  FROM e GROUP BY user_id
        |), u2 AS (
        |  SELECT e.user_id,
        |    min(CASE WHEN event_type = 'click' AND tsn > s1 THEN tsn END) AS s2
        |  FROM e JOIN u1 USING (user_id) GROUP BY e.user_id
        |), u3 AS (
        |  SELECT e.user_id,
        |    min(CASE WHEN event_type = 'purchase' AND tsn > s2 THEN tsn END) AS s3
        |  FROM e JOIN u2 USING (user_id) GROUP BY e.user_id
        |)
        |SELECT u1.user_id, s1, s2, s3,
        |  CASE WHEN s3 IS NOT NULL THEN 3 WHEN s2 IS NOT NULL THEN 2
        |       WHEN s1 IS NOT NULL THEN 1 ELSE 0 END AS steps,
        |  s3 - s1 AS convert_secs
        |FROM u1 JOIN u2 USING (user_id) JOIN u3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // unique ts in the fixture makes arg_min/arg_max on ts alone
    // deterministic; the Spark side stays tie-safe via struct min_by
    "q162_ohlc" ->
      """SELECT event_type AS key,
        |  epoch_ns(ts) // 1000000000 // 3600 * 3600 AS bucket,
        |  arg_min(value, epoch_ns(ts)) AS open,
        |  max(value) AS high, min(value) AS low,
        |  arg_max(value, epoch_ns(ts)) AS close,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
        |    AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY key, bucket""".stripMargin,

    "q182_attribution" ->
      """WITH base AS (
        |  SELECT user_id, epoch_ns(ts) AS tsn, event_type AS etype,
        |    event_id AS eid
        |  FROM events
        |), convs AS (
        |  SELECT user_id, eid AS conv_id, tsn AS conv_tsn
        |  FROM base WHERE etype = 'purchase'
        |), touches AS (
        |  SELECT user_id, eid AS touch_id, tsn AS touch_tsn,
        |    etype AS touch_type
        |  FROM base WHERE etype IN ('view', 'click')
        |), j AS (
        |  SELECT c.user_id, c.conv_id, t.touch_id, t.touch_tsn, t.touch_type,
        |    t.touch_tsn IS NOT NULL AND t.touch_tsn <= c.conv_tsn AND
        |      c.conv_tsn - t.touch_tsn <= 604800000000000 AS in_window
        |  FROM convs c LEFT JOIN touches t USING (user_id)
        |), ranked AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id, conv_id
        |      ORDER BY in_window DESC, touch_tsn, touch_id) AS rn_first,
        |    row_number() OVER (PARTITION BY user_id, conv_id
        |      ORDER BY in_window DESC, touch_tsn DESC, touch_id DESC) AS rn_last
        |  FROM j
        |)
        |SELECT user_id, conv_id,
        |  CAST(sum(CASE WHEN in_window THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_touches,
        |  max(CASE WHEN in_window AND rn_first = 1 THEN touch_type END)
        |    AS first_type,
        |  max(CASE WHEN in_window AND rn_last = 1 THEN touch_type END)
        |    AS last_type,
        |  CASE WHEN sum(CASE WHEN in_window THEN 1 ELSE 0 END) > 0 THEN
        |    round(CAST(sum(CASE WHEN in_window AND touch_type = 'view'
        |      THEN 1 ELSE 0 END) AS DOUBLE) /
        |      sum(CASE WHEN in_window THEN 1 ELSE 0 END), 6) END AS credit_view,
        |  CASE WHEN sum(CASE WHEN in_window THEN 1 ELSE 0 END) > 0 THEN
        |    round(CAST(sum(CASE WHEN in_window AND touch_type = 'click'
        |      THEN 1 ELSE 0 END) AS DOUBLE) /
        |      sum(CASE WHEN in_window THEN 1 ELSE 0 END), 6) END AS credit_click
        |FROM ranked
        |GROUP BY user_id, conv_id
        |ORDER BY user_id, conv_id""".stripMargin,

    "q241_changepoint" ->
      """WITH byt AS (
        |  SELECT epoch_ns(ts) // 3600000000000 AS t,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS kk,
        |    CAST(sum(n) AS BIGINT) AS ss, CAST(sum(n * n) AS BIGINT) AS qq
        |  FROM byt
        |), pre AS (
        |  SELECT t,
        |    CAST(count(*) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS k1,
        |    CAST(sum(n) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS s1,
        |    CAST(sum(n * n) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS q1
        |  FROM byt
        |), c AS (
        |  SELECT t AS split_t, k1 AS k_left, kk - k1 AS k_right,
        |    round(CAST(s1 AS DOUBLE) / k1, 6) AS mean_left,
        |    round(CAST(ss - s1 AS DOUBLE) / (kk - k1), 6) AS mean_right,
        |    round((CAST(q1 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) / k1) +
        |      (CAST(qq - q1 AS DOUBLE) -
        |       CAST((ss - s1) * (ss - s1) AS DOUBLE) / (kk - k1)), 6)
        |      AS sse_split,
        |    round(CAST(qq AS DOUBLE) - CAST(ss * ss AS DOUBLE) / kk, 6)
        |      AS sse_total
        |  FROM pre CROSS JOIN tot
        |  WHERE k1 < kk
        |)
        |SELECT * FROM c
        |ORDER BY sse_split, split_t
        |LIMIT 1""".stripMargin,

    "q238_overdispersion" ->
      """WITH byday AS (
        |  SELECT event_type AS key, epoch_ns(ts) // 86400000000000 AS d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), per AS (
        |  SELECT key, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n * n) AS BIGINT) AS s2
        |  FROM byday GROUP BY key
        |)
        |SELECT key, k, s1 AS total,
        |  round(CAST(s1 AS DOUBLE) / k, 6) AS mean,
        |  round(CAST(k * s2 - s1 * s1 AS DOUBLE) / ((k - 1) * s1), 6) AS vmr,
        |  round(CAST(k * s2 - s1 * s1 AS DOUBLE) / s1, 6) AS chi2,
        |  CAST(k * s2 - s1 * s1 > 2 * (k - 1) * s1 AS INT) AS overdispersed
        |FROM per
        |ORDER BY key""".stripMargin,

    "q226_trimmed_mean" ->
      """WITH b AS (
        |  SELECT event_type AS g, CAST(value AS DECIMAL(12,2)) AS v,
        |    event_id AS tie
        |  FROM events
        |), r AS (
        |  SELECT g, v,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY v, tie)
        |      AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM b
        |), k AS (
        |  SELECT g, v, rnk, n, n // 10 AS k FROM r
        |), a AS (
        |  SELECT g, max(n) AS n, max(k) AS k,
        |    sum(CASE WHEN rnk > k AND rnk <= n - k THEN v END) AS tsum,
        |    max(CASE WHEN rnk = k + 1 THEN v END) AS lo_v,
        |    max(CASE WHEN rnk = n - k THEN v END) AS hi_v
        |  FROM k GROUP BY g
        |)
        |SELECT g, n, k,
        |  CAST(lo_v AS DOUBLE) AS lo_v, CAST(hi_v AS DOUBLE) AS hi_v,
        |  round(CAST(tsum AS DOUBLE) / (n - 2 * k), 6) AS trimmed_mean,
        |  round(CAST(tsum + lo_v * k + hi_v * k AS DOUBLE) / n, 6)
        |    AS winsor_mean
        |FROM a
        |ORDER BY g""".stripMargin,

    "q227_kaplan_meier" ->
      """WITH per AS (
        |  SELECT user_id AS u, min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1
        |  FROM events GROUP BY user_id
        |), mx AS (SELECT max(t1) AS tmax FROM per),
        |base AS (
        |  SELECT (t1 - t0) // 86400000000000 AS dur,
        |    CASE WHEN tmax - t1 >= 1 * 86400000000000 THEN 1 ELSE 0 END
        |      AS event
        |  FROM per CROSS JOIN mx
        |), bd AS (
        |  SELECT dur, CAST(count(*) AS BIGINT) AS c_all,
        |    CAST(sum(event) AS BIGINT) AS d
        |  FROM base GROUP BY dur
        |), risk AS (
        |  SELECT dur, c_all, d,
        |    CAST(sum(c_all) OVER (ORDER BY dur
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |      AS n_risk
        |  FROM bd
        |), t AS (
        |  SELECT dur, d, n_risk,
        |    CAST(CASE WHEN d > 0 AND n_risk > d
        |      THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk)
        |      ELSE CAST(0.0 AS DOUBLE) END AS DECIMAL(38,18)) AS ln_term,
        |    CASE WHEN d > 0 AND n_risk = d THEN 1 ELSE 0 END AS zero_flag
        |  FROM risk
        |), c AS (
        |  SELECT dur, d, n_risk,
        |    max(zero_flag) OVER (ORDER BY dur
        |      ROWS UNBOUNDED PRECEDING) AS cum_zero,
        |    sum(ln_term) OVER (ORDER BY dur
        |      ROWS UNBOUNDED PRECEDING) AS cum_ln
        |  FROM t
        |)
        |SELECT dur AS dur_days, n_risk, d AS d_events,
        |  CASE WHEN cum_zero = 1 THEN 0.0
        |    ELSE round(exp(CAST(cum_ln AS DOUBLE)), 6) END AS survival
        |FROM c
        |WHERE d > 0
        |ORDER BY dur_days""".stripMargin,

    "q228_assoc_rules" ->
      """WITH o AS (
        |  SELECT user_id AS key, event_id AS tie, epoch_ns(ts) AS tsn,
        |    event_type AS item,
        |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
        |        PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        |      > 14400000000000 THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), s AS (
        |  SELECT key, item,
        |    sum(brk) OVER (PARTITION BY key ORDER BY tsn, tie
        |      ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
        |  FROM o
        |), items AS (
        |  SELECT DISTINCT key, session_seq, item FROM s
        |), totals AS (
        |  SELECT CAST(count(*) AS BIGINT) AS ns FROM (
        |    SELECT DISTINCT key, session_seq FROM items) t
        |), counts AS (
        |  SELECT item, CAST(count(*) AS BIGINT) AS n_i
        |  FROM items GROUP BY item
        |), pairs AS (
        |  SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM items x JOIN items y
        |    ON x.key = y.key AND x.session_seq = y.session_seq
        |    AND x.item < y.item
        |  GROUP BY x.item, y.item
        |)
        |SELECT a, b, ca.n_i AS n_a, cb.n_i AS n_b, n_ab,
        |  round(CAST(n_ab AS DOUBLE) / ca.n_i, 6) AS conf_ab,
        |  round(CAST(n_ab AS DOUBLE) / cb.n_i, 6) AS conf_ba,
        |  round(CAST(n_ab * ns AS DOUBLE) / (ca.n_i * cb.n_i), 6) AS lift
        |FROM pairs
        |JOIN counts ca ON ca.item = a
        |JOIN counts cb ON cb.item = b
        |CROSS JOIN totals
        |WHERE n_ab >= 5
        |ORDER BY a, b""".stripMargin,

    "q222_chat_template" ->
      """WITH o AS (
        |  SELECT user_id AS key, event_id AS tie, epoch_ns(ts) AS tsn,
        |    event_type AS content,
        |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
        |        PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        |      > 14400000000000 THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), s AS (
        |  SELECT key, tie, tsn, content,
        |    CAST(sum(brk) OVER (PARTITION BY key ORDER BY tsn, tie
        |      ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT) AS session_seq
        |  FROM o
        |), t AS (
        |  SELECT key, session_seq, tsn, tie, content,
        |    CAST(row_number() OVER (
        |      PARTITION BY key, session_seq ORDER BY tsn, tie) AS BIGINT)
        |      AS turn_idx
        |  FROM s
        |), p AS (
        |  SELECT key, session_seq, turn_idx, content,
        |    CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
        |    CAST(len('<|' ||
        |      (CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END) ||
        |      '|>' || content || '<|end|>') AS BIGINT) AS plen
        |  FROM t
        |), c AS (
        |  SELECT key, session_seq, turn_idx, role, content,
        |    CAST(coalesce(sum(plen) OVER (
        |      PARTITION BY key, session_seq ORDER BY turn_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prior,
        |    CAST(count(*) OVER (PARTITION BY key, session_seq) AS BIGINT)
        |      AS n_turns,
        |    CAST(sum(plen) OVER (PARTITION BY key, session_seq) AS BIGINT)
        |      AS total_len
        |  FROM p
        |)
        |SELECT key AS user_id, session_seq, turn_idx,
        |  prior + 13 AS mask_start,
        |  prior + 13 + CAST(len(content) AS BIGINT) AS mask_end,
        |  n_turns, total_len
        |FROM c
        |WHERE role = 'assistant'
        |ORDER BY user_id, session_seq, turn_idx""".stripMargin,

    "q160_sessionize" ->
      """WITH o AS (
        |  SELECT user_id AS key, event_id AS tie, epoch_ns(ts) AS tsn,
        |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
        |        PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        |      > 14400000000000 THEN 1 ELSE 0 END AS brk
        |  FROM events
        |)
        |SELECT key, tie, tsn,
        |  CAST(sum(brk) OVER (PARTITION BY key ORDER BY tsn, tie
        |    ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT) AS session_seq
        |FROM o
        |ORDER BY key, tsn, tie""".stripMargin,

    "q159_twap" ->
      """WITH o AS (
        |  SELECT user_id AS key, epoch_ns(ts) AS tsn,
        |    CAST(value AS DECIMAL(12,2)) AS v,
        |    lead(epoch_ns(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) - epoch_ns(ts) AS dt
        |  FROM events
        |)
        |SELECT key,
        |  round(CAST(sum(CAST(v * dt AS DECIMAL(38,2))) AS DOUBLE) / sum(dt), 6)
        |    AS twap,
        |  CAST(sum(dt) AS BIGINT) AS span_ns, count(*) AS n_holds
        |FROM o WHERE dt > 0
        |GROUP BY key
        |ORDER BY key""".stripMargin,

    "q130_gapfill" ->
      """WITH agg AS (
        |  SELECT event_type AS key,
        |    epoch_ns(ts) // 3600000000000 * 3600 AS bucket,
        |    count(*) AS n,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
        |  FROM events GROUP BY 1, 2
        |), spans AS (
        |  SELECT key, min(bucket) AS mn, max(bucket) AS mx FROM agg GROUP BY key
        |), grid AS (
        |  SELECT key, CAST(unnest(generate_series(mn, mx, 3600)) AS BIGINT) AS bucket
        |  FROM spans
        |)
        |, joined AS (
        |  SELECT g.key, g.bucket, CAST(coalesce(n, 0) AS BIGINT) AS n, sum_value,
        |    last_value(sum_value IGNORE NULLS) OVER (PARTITION BY g.key
        |      ORDER BY g.bucket ROWS UNBOUNDED PRECEDING) AS filled_value,
        |    last_value(CASE WHEN sum_value IS NOT NULL THEN g.bucket END IGNORE NULLS)
        |      OVER (PARTITION BY g.key ORDER BY g.bucket
        |            ROWS UNBOUNDED PRECEDING) AS pb,
        |    first_value(sum_value IGNORE NULLS) OVER (PARTITION BY g.key
        |      ORDER BY g.bucket
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN sum_value IS NOT NULL THEN g.bucket END IGNORE NULLS)
        |      OVER (PARTITION BY g.key ORDER BY g.bucket
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        |  FROM grid g LEFT JOIN agg a ON a.key = g.key AND a.bucket = g.bucket
        |)
        |SELECT key, bucket, n, sum_value, filled_value,
        |  round(CASE WHEN nb IS NULL OR nb = pb THEN filled_value
        |        ELSE filled_value + (nv - filled_value) *
        |             CAST(bucket - pb AS DOUBLE) / (nb - pb) END, 4) AS lerp_value,
        |  n = 0 AS is_gap
        |FROM joined
        |ORDER BY key, bucket""".stripMargin,

    "q42_tumbling_window" ->
      """SELECT epoch_ns(ts) // 3600000000000 * 3600 AS win_start, event_type,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin,

    "q43_sliding_window" ->
      """WITH base AS (
        |  SELECT epoch_ns(ts) // 1800000000000 * 1800 AS s30, event_type, value FROM events
        |), w AS (
        |  SELECT s30 AS win_start, event_type, value FROM base
        |  UNION ALL
        |  SELECT s30 - 1800 AS win_start, event_type, value FROM base
        |)
        |SELECT win_start, event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
        |FROM w
        |GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin,

    // Gaps-and-islands reconstruction of session semantics: a new session
    // starts when the gap is >= 10 minutes (Spark sessions are [t, t+gap)).
    // Times truncated to micros first to mirror Spark's nanos->micros read.
    "q44_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, value FROM events
        |), m AS (
        |  SELECT user_id, tus, value,
        |    CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
        |           OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus) >= 600000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |), g AS (
        |  SELECT user_id, tus, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY tus ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m
        |)
        |SELECT user_id,
        |  min(tus) // 1000000 AS session_start,
        |  max(tus) // 1000000 + 600 AS session_end,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
        |FROM g
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q45_dedup_first" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin
  )
}
