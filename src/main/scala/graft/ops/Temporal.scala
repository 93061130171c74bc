package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-ordered operators over keyed event streams — the point-in-time
  * primitives a feature / training-data pipeline needs (join each sample to
  * the state that was current WHEN the sample happened, never to the
  * future: the leakage-free feature lookup).
  */
object Temporal {

  /** Trailing time-range window over keyed events — "state of the last N
    * hours at every event" (rate limiting, burst detection, rolling
    * feature aggregates). Returns a WindowSpec partitioned by the keys and
    * RANGE-framed on epoch MICROseconds `[t − trailingMicros, t]`
    * inclusive, so frame membership is exact at the timestamp's native
    * resolution (a seconds-granularity cast would silently widen the
    * frame). Apply any aggregate over it:
    * `df.withColumn("n_24h", count(lit(1)).over(Temporal.trailingWindow(...)))`.
    *
    * One shuffle on the keys + a per-partition sort; Spark evaluates the
    * sliding range frame incrementally, so prefer order-insensitive
    * aggregates (counts, integer sums, min/max) for cross-engine-exact
    * results — float sums accumulate in frame order on every engine.
    */
  def trailingWindow(keys: Seq[String], timeCol: String,
                     trailingMicros: Long): org.apache.spark.sql.expressions.WindowSpec = {
    require(keys.nonEmpty, "trailingWindow needs at least one key column")
    require(trailingMicros >= 0, "trailingMicros must be non-negative")
    Window.partitionBy(keys.map(col): _*)
      // NTZ columns (parquet default) cast through the session zone (UTC
      // in every graft session) so unix_micros accepts either flavor
      .orderBy(unix_micros(col(timeCol).cast("timestamp")))
      .rangeBetween(-trailingMicros, 0)
  }

  /** Gaps-and-islands sessionization: per key, a NEW session starts at
    * the first event and at every event whose gap from its predecessor
    * exceeds `gapMicros`; every row gains a 0-based `session_idx`
    * (running count of starts). This is the session-ID assignment
    * (each row keeps its session), complementing the stateful
    * snapshot-per-conversation face in `streaming.SessionTracker`.
    * `orderCols` break timestamp ties — pass enough to make the
    * per-key order total, or the lag is engine-dependent.
    *
    * One shuffle on the keys + one per-partition sort shared by the lag
    * and the running sum (same window partitioning and order).
    */
  def sessionIds(events: DataFrame, keys: Seq[String], tsCol: String,
                 gapMicros: Long, orderCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "sessionIds needs at least one key column")
    require(gapMicros > 0, s"gapMicros must be positive, got $gapMicros")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(tsCol) +: orderCols.map(col)).map(_.asc): _*)
    events
      .withColumn("_tm", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("_prev", lag(col("_tm"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col("_tm") - col("_prev") > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_idx", (sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - 1).cast("int"))
      .drop("_tm", "_prev", "_new")
  }

  /** Banded interval (range-containment) join: one output row per
    * (left, right) pair sharing `keys` where the left row's `leftTime`
    * falls INSIDE the right row's `[startCol, endCol]` interval —
    * inclusive on both ends, matching SQL `BETWEEN`. Right intervals
    * with end < start are dropped as malformed.
    *
    * Spark-first shape: a raw `l.t >= r.s AND l.t <= r.e` join condition
    * has no equi-key, so Catalyst falls back to a
    * BroadcastNestedLoopJoin — an O(n·m) pair scan. Instead both sides
    * are BANDED on time: a left row lands in the single band
    * ⌊t/W⌋; a right interval explodes to every band it overlaps
    * (⌊s/W⌋..⌊e/W⌋, `sequence` + explode). The join is then a plain
    * equi-join on (keys…, band) with the exact containment predicate as
    * a post-filter. Because a left row occupies exactly ONE band, each
    * qualifying pair matches exactly once — no dedup pass. Cost: one
    * hash shuffle per side on (keys, band); right-side fan-out is
    * span/W + 1 rows per interval, so pick `bandMicros` near the typical
    * interval length (fan-out ~2) — wider bands trade fewer duplicate
    * interval copies for more false candidates in the post-filter. Hot
    * (key, band) cells are ordinary join skew, AQE-visible.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, startCol: String, endCol: String,
                   rightCols: Seq[String], bandMicros: Long,
                   prefix: String = "iv_"): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one key column")
    require(rightCols.nonEmpty, "intervalJoin needs at least one right column")
    require(bandMicros > 0, s"bandMicros must be positive, got $bandMicros")
    val outCols = rightCols.map(prefix + _)
    require(!left.columns.exists(outCols.contains),
      s"prefixed right columns $outCols collide with left columns")
    val lt = unix_micros(col(leftTime).cast("timestamp"))
    val rs = unix_micros(col(startCol).cast("timestamp"))
    val re = unix_micros(col(endCol).cast("timestamp"))
    val l = left.withColumn("_band", floor(lt / bandMicros))
      .withColumn("_lt", lt)
    val r = right
      .filter(re >= rs)
      .select(keys.map(col) ++ Seq(rs.as("_rs"), re.as("_re")) ++
        rightCols.map(c => col(c).as(prefix + c)): _*)
      .withColumn("_band", explode(sequence(
        floor(col("_rs") / bandMicros), floor(col("_re") / bandMicros))))
    l.join(r, keys :+ "_band")
      .filter(col("_lt") >= col("_rs") && col("_lt") <= col("_re"))
      .drop("_band", "_lt", "_rs", "_re")
  }

  /** As-of join, backward and inclusive: attach to every left row the
    * chosen columns of the LATEST right row sharing `keys` whose
    * `rightTime` is <= the left row's `leftTime` (and, with `tolerance`,
    * no older than `leftTime - tolerance`; tolerance is in MICROSECONDS
    * for timestamp time columns, in the column's own units for numeric
    * ones). Unmatched left rows keep nulls — the left side is never
    * dropped, and a matched row's fields arrive as ONE unit (a genuinely
    * NULL right field stays NULL, never back-filled from an older row).
    *
    * Spark-first shape: there is NO join operator at all. Both sides are
    * UNIONed, and the match is a running `last(..., ignoreNulls)` over a
    * window partitioned by the keys and ordered by (time, side) — right
    * rows sort before a left row with the identical timestamp, which is
    * what makes the match inclusive. The whole operator is ONE shuffle on
    * the key columns plus a per-partition sort: the same exchange a
    * sort-merge join pays, but with no row multiplication on duplicate
    * keys and no range-condition BroadcastNestedLoopJoin hazard (the plan
    * Spark picks for a raw `l.ts >= r.ts` join condition — an O(n·m) scan
    * at corpus scale). At 100 TB each side shuffles exactly once; key skew
    * is the same story as any keyed window and is AQE-visible.
    *
    * Contract: right (keys, time) pairs should be unique — as-of semantics
    * are ill-defined under right-side timestamp ties (this matches
    * e.g. DuckDB's ASOF JOIN, whose pick among tied rows is unspecified).
    */
  /** Resample an event series onto a REGULAR time grid with
    * last-observation-carried-forward — the alignment pass before
    * training/joining on fixed time steps (feature snapshots every N
    * minutes, sensor downsampling): per key, grid points every `stepSec`
    * seconds spanning [floor(min_ts, step), max_ts], each carrying the
    * latest event payload at-or-before it via [[asofJoin]] (so a grid
    * point before the key's first event carries NULLs — nothing is
    * invented). Grid timestamps are epoch-aligned (floor to a multiple of
    * `stepSec`), so grids of different keys line up with each other and
    * with reruns over grown data.
    *
    * Shape: the grid generates from each key's (min, max) aggregate — one
    * slim row per key exploded to its grid points (never a global
    * calendar cross join) — and the LOCF lookup inherits [[asofJoin]]'s
    * no-join union + running-last shape: ONE shuffle per side on the key,
    * no row multiplication, no range-condition BNLJ.
    */
  def resampleLocf(events: DataFrame, keys: Seq[String], timeCol: String,
                   valueCols: Seq[String], stepSec: Long): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive, got $stepSec")
    require(keys.nonEmpty && valueCols.nonEmpty, "keys and valueCols required")
    val stepUs = stepSec * 1000000L
    // NTZ inputs cast through TIMESTAMP for the µs arithmetic (wall clock
    // preserved under the UTC session contract) and the grid re-casts to
    // the input's own timestamp type so the as-of comparison is same-type
    val tsc = unix_micros(col(timeCol).cast("timestamp"))
    val span = events.groupBy(keys.map(col): _*)
      .agg(min(tsc).as("_lo"), max(tsc).as("_hi"))
    val grid = span.select(keys.map(col) :+
        explode(sequence(
          (col("_lo") - pmod(col("_lo"), lit(stepUs))),
          col("_hi"), lit(stepUs))).as("_gus"): _*)
      .select(keys.map(col) :+
        timestamp_micros(col("_gus"))
          .cast(events.schema(timeCol).dataType).as("grid_ts"): _*)
    asofJoin(grid, events, keys, "grid_ts", timeCol, valueCols)
  }

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, rightCols: Seq[String],
               prefix: String = "asof_",
               tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(rightCols.nonEmpty, "asofJoin needs at least one right column")
    val leftPayload =
      left.columns.filterNot(c => keys.contains(c) || c == leftTime).toSeq
    val outCols = rightCols.map(prefix + _)
    require(!leftPayload.exists(outCols.contains),
      s"prefixed right columns $outCols collide with left columns")
    import org.apache.spark.sql.types.{StructField, StructType, TimestampType, DataType}
    // the matched right row travels as ONE struct: either the whole latest
    // right row matched or nothing did. Per-column running-last would let
    // a matched row's genuinely-NULL field be back-filled by a STALE value
    // from an older right row — and different output columns could come
    // from different right rows (a torn match).
    val mType = StructType(
      StructField("_rt", right.schema(rightTime).dataType) +:
        rightCols.map(c => StructField(prefix + c, right.schema(c).dataType)))

    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side")) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(mType).as("_m")): _*)
    // a NULL rightTime can never satisfy "rt <= t": drop such rows BEFORE
    // the union — unioned, their NULL _t would sort FIRST and their
    // non-null match struct would pollute every row's running last
    val rSide = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(col(rightTime).as("_rt") +:
          rightCols.map(c => col(c).as(prefix + c)): _*).as("_m")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lSide.unionByName(rSide)
      .select(keys.map(col) ++ Seq(col("_t"), col("_side")) ++
        leftPayload.map(col) ++
        Seq(last(col("_m"), ignoreNulls = true).over(w).as("_m")): _*)
      .filter(col("_side") === 1)
    // tolerance units: MICROSECONDS for timestamp time columns, the
    // column's own units for numeric ones (matching the sibling *Micros
    // APIs — a raw long cast of a timestamp would compare SECONDS)
    def micros(c: Column, dt: DataType): Column = dt match {
      case TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
    val matched = tolerance match {
      case Some(tol) =>
        val age = micros(col("_t"), left.schema(leftTime).dataType) -
          micros(col("_m").getField("_rt"), right.schema(rightTime).dataType)
        when(col("_m").isNull || age > tol.cast("long"),
          lit(null).cast(mType)).otherwise(col("_m"))
      case None => col("_m")
    }
    joined.withColumn("_m", matched)
      .select(keys.map(col) ++ Seq(col("_t").as(leftTime)) ++
        leftPayload.map(col) ++
        outCols.map(c => col("_m").getField(c).as(c)): _*)
  }

  /** Time-weighted average per key: each sample holds its value until the
    * next sample, so the mean weighs every value by its holding interval —
    * Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first) — the correct aggregate for
    * irregularly-sampled telemetry (a plain AVG over-counts burst
    * periods). The last sample bounds the window and carries no weight;
    * single-sample keys have a zero-width window and yield null.
    *
    * Weights are exact integer microsecond deltas (NTZ cast through the
    * UTC session zone), so the products and their sum are the same IEEE
    * doubles on any engine. One key shuffle; the lead and the aggregation
    * share the sort. A NULL-valued sample's holding interval is excluded
    * from BOTH sums (an unknown segment, not a zero) — it still bounds
    * its predecessor's interval as an observation time.
    */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], timeCol: String,
                      valueCol: String, orderCols: Seq[String] = Seq.empty,
                      outCol: String = "twa"): DataFrame = {
    require(keys.nonEmpty, "timeWeightedAvg needs at least one key column")
    val ord = (col(timeCol) +: orderCols.map(col)).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val us = unix_micros(col(timeCol).cast("timestamp"))
    val nextUs = unix_micros(lead(col(timeCol), 1).over(w).cast("timestamp"))
    val known = col("_dt").isNotNull && col(valueCol).isNotNull
    df.withColumn("_dt", (nextUs - us).cast("double"))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(when(known, col(valueCol) * col("_dt"))).as("_num"),
        sum(when(known, col("_dt"))).as("_den"))
      .withColumn(outCol, when(col("_den") > 0, col("_num") / col("_den")))
      .drop("_num", "_den")
  }
}
