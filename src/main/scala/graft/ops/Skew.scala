package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-taming join faces — the reusable form of the salting pattern the
  * KG pipeline applies to hot conversations
  * ([[graft.kg.Pipeline.convStatsSalted]]): when one join key owns a
  * disproportionate share of a 10^12-row table (the hot `conv_id`, the
  * viral document, the null-ish default key), a plain hash join sends the
  * whole hot key to ONE reducer and the stage runs at straggler speed.
  * AQE's skew-join split handles sort-merge cases adaptively; salting is
  * the explicit, planner-independent fix — and the only one available
  * when the hot side feeds an aggregation or the join is already keyed by
  * the shuffle you want to reuse. Use [[EventAnalytics.keySkew]] to decide
  * WHEN: a hotness ratio ≫ 1 on the join key is the trigger.
  */
object Skew {

  /** Inner equi-join with the hot side salted: every left row carries a
    * deterministic salt in [0, salt) derived from the caller's `spread`
    * expression (any column that varies WITHIN a hot key — a line number,
    * a turn index, a hash of the payload), and the right side replicates
    * `salt`× so each (key, salt) cell joins locally. The hot key's rows
    * now land on `salt` reducers instead of one; the result is EXACTLY the
    * plain inner join (each left row meets precisely the one right copy
    * tagged with its salt).
    *
    * Cost model: the right side shuffles `salt`× its size — worth it when
    * `|right| · salt ≪ hot-key share of |left|`, i.e. for dimension-sized
    * right sides under heavy skew (a broadcastable right side needs no
    * salting at all — Spark's broadcast join has no reducer to skew).
    * Right-side key multiplicity is preserved (m matches per key join m
    * times per left row, same as unsalted).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 spread: Column, salt: Int): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    require(salt > 0, s"salt must be positive, got $salt")
    // NULL spread values fold to salt cell 0 — they must still JOIN
    // (pmod(NULL) = NULL would silently drop those left rows)
    val l = left.withColumn("_salt",
      pmod(coalesce(spread.cast("long"), lit(0L)), lit(salt.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1L))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
