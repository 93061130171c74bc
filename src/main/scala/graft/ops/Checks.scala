package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the Deequ-style validation layer a
  * 10^12-row ingest runs BEFORE graph construction, and the distributed
  * analogue of the reference's uniqueness/index constraints
  * (graphio enforces per-label unique merge keys via Neo4j indexes,
  * `/root/reference/graphio/bulk/nodeset.py:180-184`): here the same
  * contracts are verified as Spark aggregations that emit evidence rows
  * instead of trusting the store.
  *
  * Every check returns ONE row — (check, n_rows, n_violations, pass) — so
  * a suite is a `union` and the result is a tiny audit artifact to persist
  * next to the load's lineage rows. Scale shape per check:
  * uniqueness = one map-side-partial count per key + a count over
  * multi-row keys (key columns only — the table's payload never
  * shuffles); notNull / acceptedValues = zero-shuffle codegen'd scans;
  * referential = a keys-only distinct + left-anti probe (broadcast when
  * the parent key set is dimension-sized, shuffle otherwise — Spark
  * picks by stats). Nothing collects to the driver.
  */
object Checks {

  private def result(name: String, total: Column, violations: Column,
                     df: DataFrame): DataFrame =
    df.agg(total.as("_n"), violations.as("_v"))
      .select(lit(name).as("check"), col("_n").as("n_rows"),
        col("_v").as("n_violations"), (col("_v") === 0L).as("pass"))

  /** Rows whose key tuple occurs more than once (every member of a
    * duplicated key group counts — the rows a unique index would reject).
    */
  def uniqueness(df: DataFrame, keyCols: Seq[String],
                 name: String = ""): DataFrame = {
    require(keyCols.nonEmpty, "uniqueness needs at least one key column")
    val nm = if (name.nonEmpty) name else s"unique(${keyCols.mkString(",")})"
    val grouped = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_c"))
    grouped.agg(
        sum(col("_c")).as("_n"),
        coalesce(sum(when(col("_c") > 1, col("_c"))), lit(0L)).as("_v"))
      .select(lit(nm).as("check"), col("_n").as("n_rows"),
        col("_v").as("n_violations"), (col("_v") === 0L).as("pass"))
  }

  /** Null (or NaN-free for doubles is the caller's cast) count on one
    * column. */
  def notNull(df: DataFrame, c: String, name: String = ""): DataFrame =
    result(if (name.nonEmpty) name else s"not_null($c)",
      count(lit(1)), count(lit(1)) - count(col(c)), df)

  /** Rows whose value is outside the accepted literal set (nulls count as
    * violations — accepted means present AND allowed). */
  def acceptedValues(df: DataFrame, c: String, values: Seq[String],
                     name: String = ""): DataFrame = {
    require(values.nonEmpty, "acceptedValues needs a non-empty set")
    result(if (name.nonEmpty) name else s"accepted($c)",
      count(lit(1)),
      coalesce(sum(when(col(c).isInCollection(values), 0L).otherwise(1L)),
        lit(0L)), df)
  }

  /** Child rows whose key has no match in the parent key set — referential
    * integrity (dangling edges, in graph terms: what RelSetOps drops).
    * Keys-only: both sides reduce to their key columns before the probe.
    */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  name: String = ""): DataFrame = {
    val nm = if (name.nonEmpty) name else s"fk($childKey->$parentKey)"
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("_v"))
    child.agg(count(lit(1)).as("_n"))
      .crossJoin(broadcast(orphans))
      .select(lit(nm).as("check"), col("_n").as("n_rows"),
        col("_v").as("n_violations"), (col("_v") === 0L).as("pass"))
  }

  /** Per-column profile: (column, n_rows, n_null, n_distinct) — the
    * drift-detection snapshot persisted per ingest batch; compare against
    * the previous batch's profile to catch schema/content drift before it
    * poisons a merge. Exact distinct here (the gate's contract); swap in
    * `approx_count_distinct` per column at 10^12 rows — each column scans
    * independently (pruned to itself), so the profile parallelizes across
    * the cluster rather than multiplying one scan by Expand.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(count(lit(1)).as("_n"), count(col(c)).as("_nn"),
          countDistinct(col(c)).as("_d"))
        .select(lit(c).as("column"), col("_n").as("n_rows"),
          (col("_n") - col("_nn")).as("n_null"),
          col("_d").as("n_distinct"))
    }.reduce(_ unionByName _)
  }

  /** Population Stability Index between a REFERENCE and an ACTUAL sample
    * of a numeric column — the standard train/serve (or train/test) drift
    * score: bin edges come from the reference min/max (`nBins` equal-width
    * bins; actual values clamp into the edge bins), shares are
    * Laplace-smoothed ((n+1)/(N+nBins) — the explicit, engine-portable way
    * to keep empty bins out of the log), and each bin contributes
    * (q−p)·ln(q/p). Rule of thumb: Σ < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 shifted. Emits one row per bin (n_expected, n_actual,
    * psi_term rounded 6dp) — sum the terms for the headline number; the
    * per-bin rows say WHERE the mass moved.
    *
    * Shape: one 1-row (min, max) aggregate on the reference, broadcast;
    * one map-side-partial bin count per side; an nBins-row join. Both
    * inputs scan pruned to the one column.
    */
  def psi(expected: DataFrame, actual: DataFrame, c: String,
          nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val spark = expected.sparkSession
    import spark.implicits._
    val b = expected.filter(col(c).isNotNull)
      .agg(min(col(c).cast("double")).as("_lo"), max(col(c).cast("double")).as("_hi"))
    def binned(df: DataFrame, n: String) = df.filter(col(c).isNotNull)
      .crossJoin(broadcast(b))
      .select(when(col("_hi") === col("_lo"), lit(0L)).otherwise(
        greatest(lit(0L), least(lit(nBins - 1L),
          floor((col(c).cast("double") - col("_lo")) * nBins /
            (col("_hi") - col("_lo")))))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(n))
    val bins = spark.range(0, nBins).select(col("id").as("bin"))
    val joined = bins
      .join(binned(expected, "n_expected"), Seq("bin"), "left_outer")
      .join(binned(actual, "n_actual"), Seq("bin"), "left_outer")
      .select(col("bin"),
        coalesce(col("n_expected"), lit(0L)).as("n_expected"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"))
    val totE = sum(col("n_expected")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    val totA = sum(col("n_actual")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    joined
      .withColumn("_p", (col("n_expected") + 1) / (totE + nBins))
      .withColumn("_q", (col("n_actual") + 1) / (totA + nBins))
      .select(col("bin"), col("n_expected"), col("n_actual"),
        round((col("_q") - col("_p")) * log(col("_q") / col("_p")), 6)
          .as("psi_term"))
  }

  /** Mutual information between two CATEGORICAL columns — the dependence
    * audit (is `lang` confounded with `source`? is a label leaking through
    * a metadata field?): per observed (x, y) cell the joint count and its
    * MI contribution (n_xy/N)·ln(N·n_xy / (n_x·n_y)), rounded 6dp — sum
    * for the headline nats; per-cell rows localize the dependence. One
    * joint aggregation + two broadcast-joined marginals; the only
    * unpartitioned window (the N total) runs over the CELL table, which is
    * category-cardinality-sized, never row-sized.
    */
  def categoricalMi(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("x"), col(yCol).as("y"))
    val joint = base.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val mx = base.groupBy("x").agg(count(lit(1)).as("_nx"))
    val my = base.groupBy("y").agg(count(lit(1)).as("_ny"))
    val tot = sum(col("n_xy")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    joint.join(broadcast(mx), Seq("x")).join(broadcast(my), Seq("y"))
      .withColumn("_n", tot)
      .select(col("x"), col("y"), col("n_xy"),
        // products in DOUBLE — the Long N·n_xy / n_x·n_y forms wrap past
        // ~3e9 rows (ADVICE r5); exact below 2^53, so values are unchanged
        round((col("n_xy") / col("_n")) *
          log((col("_n").cast("double") * col("n_xy")) /
            (col("_nx").cast("double") * col("_ny"))), 6)
          .as("mi_term"))
  }

  /** Cohen's kappa between two label columns — chance-corrected agreement,
    * the inter-annotator / gold-vs-model QA metric for labeled training
    * data: κ = (p_o − p_e)/(1 − p_e) with p_o the raw agreement rate and
    * p_e = Σ_c p_a(c)·p_b(c) the by-chance rate from the marginals.
    * Labels present on only one side contribute 0 to p_e (the inner
    * marginal join). Emits ONE row (n_items, po, pe, kappa, 6dp); kappa
    * is NULL when p_e = 1 (a single shared category — undefined).
    *
    * Shape: one 1-row (count, agree) aggregate + two category-cardinality
    * marginal tables joined and summed — nothing row-sized ever
    * cross-joins.
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("a"), col(bCol).as("b"))
    val stats = base.agg(count(lit(1)).as("_n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("_agree"))
    val ma = base.groupBy("a").agg(count(lit(1)).as("_na"))
      .select(col("a").as("_c"), col("_na"))
    val mb = base.groupBy("b").agg(count(lit(1)).as("_nb"))
      .select(col("b").as("_c"), col("_nb"))
    // marginal products and n² in DOUBLE: the Long forms silently wrap past
    // ~3e9 rows (ADVICE r5); exact integers below 2^53 are unchanged
    val pe2 = ma.join(mb, "_c")
      .agg(coalesce(sum(col("_na").cast("double") * col("_nb")), lit(0.0)).as("_pe2"))
    val po = col("_agree") / col("_n")
    val pe = col("_pe2") / (col("_n").cast("double") * col("_n"))
    stats.crossJoin(pe2).select(
      col("_n").as("n_items"),
      round(po, 6).as("po"),
      round(pe, 6).as("pe"),
      when(pe < 1, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** k-anonymity audit over quasi-identifier columns — the privacy gate a
    * training-data release runs before shipping: every row whose
    * quasi-identifier combination is shared by FEWER than k rows is
    * re-identifiable at group size < k and must be suppressed or
    * generalized. Returns one row per violating group: (the quasi-id
    * columns, group_size) — empty result ⇔ the table IS k-anonymous.
    *
    * Shape: one map-side-partial groupBy on the quasi-id key, then a
    * HAVING filter — the violating groups are the small ones, so the
    * result is at most (k−1)× the violating-group count, never
    * table-sized.
    */
  def kAnonymityViolations(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(quasiIds.nonEmpty, "kAnonymityViolations needs quasi-id columns")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
  }

  /** The suppression half of [[kAnonymityViolations]]: drop every row in
    * a sub-k group, keeping the table k-anonymous by construction. One
    * extra key-shuffle (a left-anti join against the violating groups).
    */
  def kAnonymize(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame =
    df.join(kAnonymityViolations(df, quasiIds, k).select(quasiIds.map(col): _*),
      quasiIds, "left_anti")

  /** Fixed-width histogram of a numeric column — the distribution half of
    * the drift snapshot (compare bin masses batch-over-batch; a shifted
    * mode is drift [[profile]]'s counts can't see). Bin i covers
    * [min + i·w, min + (i+1)·w) with w = (max−min)/nBins; the max value
    * folds into the last bin, NULLs drop. Two passes: a 1-row (min, max)
    * broadcast, then one codegen'd bin projection + count — both
    * map-side-partial aggregations, nothing driver-side. Degenerate
    * min == max puts every row in bin 0.
    */
  def histogram(df: DataFrame, c: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val v = col(c).cast("double")
    val bounds = df.filter(v.isNotNull)
      .agg(min(v).as("_lo"), max(v).as("_hi"))
    val bin = least(lit(nBins - 1),
      floor((v - col("_lo")) * nBins / (col("_hi") - col("_lo"))))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(bounds))
      .select(when(col("_hi") === col("_lo"), lit(0L))
        .otherwise(bin.cast("long")).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }
}
