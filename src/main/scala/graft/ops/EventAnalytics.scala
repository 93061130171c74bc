package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over keyed event streams — funnel
  * conversion, cohort retention, and per-group outlier detection: the
  * standard read-side workloads a transcript/event warehouse serves next
  * to its KG build. All three are single-logical-shuffle shapes: every
  * window and aggregation below is keyed on the entity (user) or the
  * group, so Catalyst reuses one exchange per keyed stage and nothing
  * ever funnels through a single task.
  */
object EventAnalytics {

  /** Ordered funnel conversion: how many users reach stage i, where
    * reaching stage i means an event of type `stages(i)` STRICTLY AFTER
    * the time the user first reached stage i−1 — and, with
    * `maxGapMicros`, no more than that long after it (inclusive) —
    * first-touch semantics: each stage anchors at its earliest
    * qualifying event. Returns one row per stage:
    * (stage_idx, stage, n_users), n_users non-increasing.
    *
    * Shape: the per-stage anchors are chained window MINs over the SAME
    * user partitioning — one exchange total, k window passes — then one
    * per-user collapse and one global count row that is exploded back to
    * per-stage rows (no driver collect).
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts", maxGapMicros: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate stages in $stages")
    require(maxGapMicros.forall(_ > 0), s"maxGapMicros must be positive")
    val w = Window.partitionBy(userCol)
    var df = events.select(col(userCol), col(typeCol), col(tsCol))
    stages.zipWithIndex.foreach { case (st, i) =>
      val qualifies =
        if (i == 0) col(typeCol) === st
        else {
          val prev = col(s"_t${i - 1}")
          val inWindow = maxGapMicros.fold(lit(true))(g =>
            unix_micros(col(tsCol).cast("timestamp")) <=
              unix_micros(prev.cast("timestamp")) + g)
          col(typeCol) === st && prev.isNotNull && col(tsCol) > prev && inWindow
        }
      df = df.withColumn(s"_t$i", min(when(qualifies, col(tsCol))).over(w))
    }
    val perUser = df.groupBy(userCol)
      .agg(min(col("_t0")).as("_t0"),
        stages.indices.drop(1).map(i => min(col(s"_t$i")).as(s"_t$i")): _*)
    val counts = perUser.agg(
      count(col("_t0")).as("_n0"),
      stages.indices.drop(1).map(i => count(col(s"_t$i")).as(s"_n$i")): _*)
    counts.select(explode(array(stages.zipWithIndex.map { case (st, i) =>
        struct(lit(i).as("stage_idx"), lit(st).as("stage"),
          col(s"_n$i").as("n_users"))
      }: _*)).as("x"))
      .select(col("x.stage_idx"), col("x.stage"), col("x.n_users"))
  }

  /** Weekly cohort retention: users are cohorted by the Monday-start week
    * of their FIRST event; each (cohort_week, week_offset) cell counts
    * the distinct cohort members active in that later week. Offsets are
    * whole weeks between two week-truncated timestamps — exact integers,
    * no float date math.
    *
    * Shape: one user-keyed window MIN for the cohort anchor, then one
    * (cohort, offset)-keyed distinct-count aggregation.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(userCol)
    events.select(col(userCol), col(tsCol))
      .withColumn("_cw", date_trunc("week", min(col(tsCol)).over(w)))
      .withColumn("_off",
        floor(datediff(date_trunc("week", col(tsCol)), col("_cw")) / 7).cast("int"))
      .groupBy(col("_cw").as("cohort_week"), col("_off").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }

  /** First-order Markov transition estimates over per-key event
    * sequences: one (from, to) row per observed adjacent pair under the
    * caller's total order, with its count and the row-normalized
    * probability p = n / Σ_to n — the behavioral-model fit (what follows
    * what) and the anomaly baseline (improbable transitions). Two keyed
    * passes that share work: one lag window on the entity keys, one
    * (from, to) aggregation, one from-keyed window for the normalizer.
    */
  def transitionMatrix(events: DataFrame, keys: Seq[String],
                       typeCol: String = "event_type", tsCol: String = "ts",
                       orderCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "transitionMatrix needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(tsCol) +: orderCols.map(col)).map(_.asc): _*)
    events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") /
        sum(col("n")).over(Window.partitionBy("from_type")), 6))
  }

  /** Key-skew profile: the topN heaviest keys with their row count, corpus
    * share, and hotness ratio (count ÷ mean count per key). This is the
    * diagnostic that DECIDES the skew mitigations elsewhere in the repo —
    * a ratio ≫ 1 on a join/grouping key is the signal to salt it (the
    * [[graft.kg.Pipeline.convStatsSalted]] pattern) or lean on AQE's skew
    * split; share quantifies how much of the table one straggler task
    * would own.
    *
    * Scale shape: one map-side-partial count per key, a 1-row totals
    * aggregate joined back as a broadcast, and a TakeOrdered for the topN
    * — never a global sort, nothing driver-side.
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("_tot"),
      count(lit(1)).cast("double").as("_nk"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("n"),
        round(col("n").cast("double") / col("_tot"), 6).as("share"),
        round(col("n").cast("double") * col("_nk") / col("_tot"), 6).as("ratio"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
  }

  /** Equi-depth bucketing: per-group ntile assignment (1-based) under a
    * caller-supplied TOTAL order — decile features, per-segment quantile
    * cohorts, rank-based normalization. SQL-standard ntile (first
    * `count mod n` buckets one row larger), so the assignment is a pure
    * function of the ordered group; pass `orderCols` tiebreakers to make
    * the order total or ties land engine-dependently. One shuffle on the
    * group keys + one per-partition sort.
    */
  def equiDepthBuckets(df: DataFrame, valueCol: String, groupCols: Seq[String],
                       nBuckets: Int, orderCols: Seq[String] = Nil,
                       bucketCol: String = "bucket"): DataFrame = {
    require(groupCols.nonEmpty, "equiDepthBuckets needs at least one group column")
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((col(valueCol) +: orderCols.map(col)).map(_.asc): _*)
    df.withColumn(bucketCol, ntile(nBuckets).over(w))
  }

  /** Per-group winsorization: clip `valueCol` into its group's exact
    * interpolated [lo, hi] percentile band (the robust-statistics tamer
    * for heavy-tailed feature columns). Percentiles are computed with
    * Spark's exact `percentile` — engine-portable interpolation, the
    * same contract [[CorpusOps.tokenPercentiles]] gates — in one
    * group-keyed aggregation, then joined back (group cardinality is
    * tiny next to the data, so Catalyst broadcasts) and clipped with
    * `greatest`/`least` in a codegen projection. Swap `approx_percentile`
    * in at 10^12-row scale, same shape.
    */
  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                lo: Double, hi: Double): DataFrame = {
    require(groupCols.nonEmpty, "winsorize needs at least one group column")
    require(0 <= lo && lo <= hi && hi <= 1, s"need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, $lo)").as("_plo"),
        expr(s"percentile($valueCol, $hi)").as("_phi"))
    df.join(bounds, groupCols)
      .withColumn(s"${valueCol}_w",
        greatest(col("_plo"), least(col("_phi"), col(valueCol))))
      .drop("_plo", "_phi")
  }

  /** Per-group z-score outliers: rows whose value sits `threshold` or
    * more sample standard deviations from their group's mean. The z is
    * rounded to 6 dp BEFORE thresholding so the kept set is a pure
    * function of the rounded scores (cross-engine-stable; a group with
    * zero variance yields null z and keeps nothing). Group stats ride a
    * single group-keyed window — one exchange, no join.
    */
  def zscoreOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                     threshold: Double): DataFrame = {
    require(groupCols.nonEmpty, "zscoreOutliers needs at least one group column")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("_mu", avg(col(valueCol)).over(w))
      .withColumn("_sd", stddev_samp(col(valueCol)).over(w))
      .withColumn("z", when(col("_sd") > lit(0.0), // ANSI-safe: sd=0 → null z
        round((col(valueCol) - col("_mu")) / col("_sd"), 6)))
      .filter(abs(col("z")) >= threshold)
      .drop("_mu", "_sd")
  }

  /** Per-group trailing EWMA (exponentially weighted moving average) over
    * the last `k` observations under the (orderCols) total order:
    *   ewma_i = Σ_{j<k} r^j·x_{i−j} / Σ_{j<k} r^j,  r = 1−alpha,
    * with missing lags (sequence head) truncated from BOTH sums — the
    * standard finite-window form of exponential smoothing (burst
    * detection, drift baselines). The k lag terms share one window spec,
    * so Catalyst evaluates them in a SINGLE Window pass — one shuffle on
    * the group key, no self-joins; r is chosen by the caller and with
    * r = 0.5 every weight is an exact IEEE double, so a SQL oracle with
    * the same unrolled lag expression reproduces the value bit-for-bit
    * before rounding.
    */
  def ewma(df: DataFrame, valueCol: String, groupCols: Seq[String],
           orderCols: Seq[String], k: Int, alpha: Double,
           outCol: String = "ewma"): DataFrame = {
    require(groupCols.nonEmpty, "ewma needs at least one group column")
    require(k >= 1 && k <= 32, s"k must be in [1,32] (unrolled lags), got $k")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val r = 1.0 - alpha
    val terms = (0 until k).map { j =>
      val x = if (j == 0) col(valueCol) else lag(col(valueCol), j).over(w)
      (when(x.isNotNull, x * lit(math.pow(r, j))),
       when(x.isNotNull, lit(math.pow(r, j))))
    }
    val num = terms.map(t => coalesce(t._1, lit(0.0))).reduce(_ + _)
    val den = terms.map(t => coalesce(t._2, lit(0.0))).reduce(_ + _)
    // den = 0 only when every windowed value is null — emit null, not the
    // engine-dependent 0/0 (NaN on Spark, NULL on DuckDB)
    df.withColumn(outCol, when(den > 0, num / den))
  }

  /** OHLC time bars — the standard downsample of a value series to fixed
    * buckets (metrics rollups, rate dashboards, financial bars): per (key,
    * epoch-aligned bucket) the OPEN (first value by (time, order)), HIGH,
    * LOW, CLOSE (last value) and count. One map-side-partial aggregation
    * on the (key, bucket) grain — `min_by`/`max_by` over the µs timestamp
    * with an id tiebreak folded into the ordering key, so the open/close
    * picks are total-order deterministic (same-µs ties can't flip
    * cross-engine). NULL values drop (they carry no price).
    */
  def ohlcBars(events: DataFrame, keys: Seq[String], timeCol: String,
               valueCol: String, bucketSec: Long,
               orderCol: String): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    require(keys.nonEmpty, "ohlcBars needs at least one key column")
    val us = unix_micros(col(timeCol).cast("timestamp"))
    val bucketUs = bucketSec * 1000000L
    // total order within the bar: µs time then the id column, folded into
    // one sortable long pair via a struct
    val ord = struct(us.as("_t"), col(orderCol).cast("long").as("_o"))
    events.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col) :+
        // re-cast to the input's own timestamp type (NTZ in, NTZ out — the
        // resampleLocf rule) so the dump's physical type matches the oracle
        timestamp_micros(us - pmod(us, lit(bucketUs)))
          .cast(events.schema(timeCol).dataType).as("bar_ts"): _*)
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n"))
  }
}
