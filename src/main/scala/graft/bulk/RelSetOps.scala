package graft.bulk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType
import graft.schema.{ArrayKey, EqKey, KeyMatch, RelSpec}

/** RelationshipSet semantics (reference: graphio/bulk/relationshipset.py) as
  * DataFrame transforms.
  *
  * A staged edge batch is a DataFrame with flattened endpoint match columns
  * `start_<k>` / `end_<k>` plus relationship property columns — exactly the
  * UNWIND parameter shape the reference flattens to
  * (rels_params_from_objects, relationshipset.py:279-311).
  *
  * A resolved edge table has `src_id, dst_id, rel_type` plus property
  * columns. Edge identity is (src_id, dst_id, rel_type) ONLY — properties
  * are excluded, mirroring "The MERGE on relationships does not take
  * relationship properties into account!" (relationshipset.py:385).
  *
  * Scale: endpoint resolution is two equi-joins against the node table.
  * Catalyst broadcast-joins a small node side automatically; a big×big
  * resolve shuffles both sides on the match key once. ArrayProperty
  * containment joins are planned as explode-then-equi-join so they stay
  * shuffle-joinable instead of falling into BroadcastNestedLoopJoin.
  */
object RelSetOps {
  val OrdCol = NodeSetOps.OrdCol
  val SrcId = "src_id"
  val DstId = "dst_id"
  val RelType = "rel_type"

  private def hasCol(df: DataFrame, c: String) = df.columns.contains(c)

  /** Stable node identity for a node-table row: hash of (primary label,
    * merge-key values). Mirrors Neo4j's internal node id at the semantic
    * level: two rows with the same primary label + keys are the same node.
    *
    * Identity uses labels[0] ONLY — the spec's primary label, which is
    * immutable: NodeSetOps stamps it first at create/merge and label
    * accumulation (`SET n:Extra` → array_union, which preserves first-seen
    * order) can only APPEND. Hashing the full label array would silently
    * re-identify a node (orphaning its resolved edges) whenever a later
    * merge added a label — the reference's node identity (Neo4j internal id)
    * is stable under added labels (nodeset.py:322-326).
    */
  def withNodeId(nodes: DataFrame, mergeKeys: Seq[String], idCol: String = "_node_id"): DataFrame =
    nodes.withColumn(idCol,
      xxhash64(element_at(col(NodeSetOps.LabelsCol), 1),
        struct(mergeKeys.map(col): _*)))

  /** A3 — edge ingest: overlay default rel props (relationshipset.py:121-126)
    * and stamp ingest order.
    */
  def ingest(rows: DataFrame, spec: RelSpec): DataFrame = {
    val ordered = NodeSetOps.withIngestOrder(rows)
    spec.defaultProps.foldLeft(ordered) { case (df, (k, v)) =>
      if (hasCol(df, k)) df.withColumn(k, coalesce(col(k), lit(v)))
      else df.withColumn(k, lit(v))
    }
  }

  /** A4 — staged-edge uniqueness (rs.unique=True): drop exact duplicates of
    * (endpoint keys, props). Deviation (documented in SURVEY §2 A4): the
    * reference keys on frozenset(values) — order/key-name-insensitive and
    * collision-prone; we key on the canonical column tuple.
    */
  def uniqueEdges(rows: DataFrame, spec: RelSpec): DataFrame = {
    val df = NodeSetOps.withIngestOrder(rows)
    val keyCols = df.columns.filterNot(_ == OrdCol).toSeq
    // r6: every column except the ordinal IS the group key, so the kept
    // (first) row differs from its duplicates only in OrdCol — one hash
    // aggregation taking min(ord) replaces the row_number window (partial
    // agg, no sort; guide §2.3). Value-identical by construction.
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(OrdCol)).as(OrdCol))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Label-set filter on the uber node table. EMPTY label list ⇒ match-all —
    * the cross-label blowup is observed reference behavior (100 rels → 900
    * when 3 labels match both ends, test_relationshipset.py:142-154).
    */
  private def labelFilter(labels: Seq[String]): Column =
    if (labels.isEmpty) lit(true)
    else labels.map(l => array_contains(col(NodeSetOps.LabelsCol), l)).reduce(_ && _)

  /** One endpoint resolution: inner-join staged edges to the node table on
    * the endpoint match keys; dangling refs drop silently (inner-join
    * semantics, docs/details/bulk.md:409-421).
    *
    * ArrayKey (containment) is rewritten explode→equi-join to keep the join
    * hash-partitionable at scale; broadcast still kicks in when the node
    * side is small.
    */
  private def resolveEndpoint(
      edges: DataFrame,
      nodes: DataFrame,
      labels: Seq[String],
      keys: Seq[KeyMatch],
      prefix: String,
      outId: String): DataFrame = {
    val filtered = withNodeId(nodes.filter(labelFilter(labels)),
      keys.map(_.name), "_rid_" + prefix)
    // Explode array-match columns so every join predicate is an equality.
    val (exploded, joinPairs) = keys.foldLeft((filtered, Seq.empty[(String, String)])) {
      case ((n, acc), EqKey(k)) => (n, acc :+ (k -> s"${prefix}_$k"))
      case ((n, acc), ArrayKey(k)) =>
        // distinct first: containment is a per-node predicate — a value
        // occurring twice in the array must not yield two edges
        val ex = n.withColumn(s"_x_$k", explode(array_distinct(col(k))))
        (ex, acc :+ (s"_x_$k" -> s"${prefix}_$k"))
    }
    val nSide = exploded
      .withColumnRenamed("_rid_" + prefix, outId)
      .select((joinPairs.map(_._1).distinct :+ outId).map(col): _*)
      .alias("n" + prefix)
    val eSide = edges.alias("e" + prefix)
    val cond = joinPairs.map { case (nk, ek) =>
      col(s"n$prefix.$nk") === col(s"e$prefix.$ek")
    }.reduce(_ && _)
    eSide.join(nSide, cond, "inner")
      .select((edges.columns.map(c => col(s"e$prefix.$c")) :+ col(s"n$prefix.$outId")).toSeq: _*)
  }

  /** B3 — bulk edge create: resolve both endpoints (MATCH a, b), emit
    * resolved edge rows. Blind append — duplicates allowed. If `relTypeCol`
    * is set, the edge type is taken per-row from that column (one physical
    * edge table for many logical RelationshipSets — the scale-friendly
    * layout); otherwise it is stamped from the spec.
    */
  def resolve(edges: DataFrame, nodes: DataFrame, spec: RelSpec,
              relTypeCol: Option[String] = None): DataFrame = {
    val e0 = ingest(edges, spec)
    val e1 = resolveEndpoint(e0, nodes, spec.startNodeLabels, spec.startNodeProperties, "start", SrcId)
    val e2 = resolveEndpoint(e1, nodes, spec.endNodeLabels, spec.endNodeProperties, "end", DstId)
    val startCols = spec.startNodeProperties.map(k => s"start_${k.name}")
    val endCols = spec.endNodeProperties.map(k => s"end_${k.name}")
    val relType = relTypeCol.map(col).getOrElse(lit(spec.relType))
    val propCols = e0.columns.filterNot(c =>
      startCols.contains(c) || endCols.contains(c) || c == OrdCol ||
      relTypeCol.contains(c)).toSeq
    e2.select((Seq(col(SrcId), col(DstId), relType.as(RelType)) ++
      propCols.map(col) :+ col(OrdCol)): _*)
  }

  def create(target: Option[DataFrame], edges: DataFrame, nodes: DataFrame, spec: RelSpec): DataFrame = {
    val staged = if (spec.unique) uniqueEdges(edges, spec) else edges
    val resolved = resolve(staged, nodes, spec).drop(OrdCol)
    target match {
      case Some(t) => t.unionByName(resolved, allowMissingColumns = true)
      case None    => resolved
    }
  }

  /** Intra-batch reduce on edge identity (src,dst,type): later rows overwrite
    * scalars, append props accumulate in order — same rules as nodes (B4,
    * relationshipset.py:373-450).
    */
  private[graft] def reduceBatch(resolved: DataFrame, spec: RelSpec): DataFrame = {
    // r6: same hash-aggregation rewrite as NodeSetOps.reduceBatch (see the
    // rule table there): partial agg on the edge identity, no sort.
    val keys = Seq(SrcId, DstId, RelType)
    val df = NodeSetOps.withIngestOrder(resolved)
    val propCols = df.columns.filterNot(c => keys.contains(c) || c == OrdCol).toSeq
    val ord = col(OrdCol)
    val aggs = propCols.map { c =>
      val cc = col(c)
      val v =
        if (spec.appendProps.contains(c)) {
          val sorted = array_sort(
            collect_list(when(cc.isNotNull, struct(ord.as("o"), cc.as("v")))),
            (l, r) => when(l("o") < r("o"), -1).when(l("o") > r("o"), 1).otherwise(0))
          val vals = transform(sorted, x => x("v"))
          df.schema(c).dataType match {
            case _: ArrayType => flatten(vals)
            case _            => vals
          }
        }
        else if (spec.sumProps.contains(c)) sum(cc)
        else if (spec.minProps.contains(c)) min(cc)
        else if (spec.maxProps.contains(c)) max(cc)
        else max_by(cc, when(cc.isNotNull, ord))
      v.as(c)
    }
    if (aggs.isEmpty) df.drop(OrdCol).distinct()
    else df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(df.columns.filterNot(_ == OrdCol).map(col).toIndexedSeq: _*)
  }

  /** B4 — bulk edge merge: endpoint resolution as B3, then keyed upsert on
    * (src_id, dst_id, rel_type). Re-merging the same batch keeps counts
    * stable (idempotence, test_relationshipset.py:244-256).
    *
    * `appendProps` is the per-call override of the container config —
    * relationshipset.py:218-226 (the only merge kwarg the reference takes).
    */
  def merge(target: Option[DataFrame], edges: DataFrame, nodes: DataFrame, spec0: RelSpec,
            relTypeCol: Option[String] = None,
            appendProps: Option[Seq[String]] = None): DataFrame = {
    val spec = spec0.copy(appendProps = appendProps.getOrElse(spec0.appendProps))
    val staged = if (spec.unique) uniqueEdges(edges, spec) else edges
    mergeResolved(target, resolve(staged, nodes, spec, relTypeCol), spec)
  }

  /** Merge a batch that is already endpoint-resolved (has src_id / dst_id /
    * rel_type). This is the `MERGE INTO edges ON (src_id, dst_id, rel_type)`
    * core without the resolution joins.
    */
  def mergeResolved(target: Option[DataFrame], resolved: DataFrame, spec: RelSpec): DataFrame = {
    val batch0 = reduceBatch(resolved, spec)
    def asInsert(df: DataFrame): DataFrame =
      spec.appendProps.foldLeft(df) { (acc, c) =>
        if (!hasCol(acc, c)) acc
        else acc.schema(c).dataType match {
          case _: ArrayType => acc
          case _            => acc.withColumn(c, array(col(c)))
        }
      }
    target match {
      case None =>
        val ins = asInsert(batch0)
        val keys = Seq(SrcId, DstId, RelType)
        val props = ins.columns.filterNot(keys.contains).sorted
        ins.select((keys ++ props).map(col): _*)
      case Some(t0) =>
        val batch = asInsert(batch0)
        val tCols = t0.columns.toSet
        val uCols = batch.columns.toSet
        val t = (uCols -- tCols).foldLeft(t0)((acc, c) =>
          acc.withColumn(c, lit(null).cast(batch.schema(c).dataType)))
        val u = (tCols -- uCols).foldLeft(batch)((acc, c) =>
          acc.withColumn(c, lit(null).cast(t0.schema(c).dataType)))
        val keys = Seq(SrcId, DstId, RelType)
        val tt = t.withColumn("_t_exists", lit(true)).alias("t")
        val uu = u.withColumn("_u_exists", lit(true)).alias("u")
        val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
        val joined = tt.join(uu, cond, "full_outer")
        val tEx = coalesce(col("t._t_exists"), lit(false))
        val uEx = coalesce(col("u._u_exists"), lit(false))
        val propCols = (tCols ++ uCols) -- keys - "_t_exists" - "_u_exists"
        val keyCols = keys.map(k => coalesce(col(s"u.$k"), col(s"t.$k")).as(k))
        val outProps = propCols.toSeq.sorted.map { c =>
          val tc = col(s"t.$c"); val uc = col(s"u.$c")
          val merged =
            if (spec.appendProps.contains(c))
              when(tEx && uEx, concat(coalesce(tc, array()), coalesce(uc, array())))
                .when(tEx, tc).otherwise(uc)
            else if (spec.sumProps.contains(c))
              // arithmetic update on match: r.c = r.c + u.c (nulls = 0)
              when(tEx && uEx, coalesce(tc, lit(0)) + coalesce(uc, lit(0)))
                .when(tEx, tc).otherwise(uc)
            else if (spec.minProps.contains(c))
              // temporal validity interval: first_seen (least/greatest skip nulls)
              when(tEx && uEx, least(tc, uc)).when(tEx, tc).otherwise(uc)
            else if (spec.maxProps.contains(c))
              when(tEx && uEx, greatest(tc, uc)).when(tEx, tc).otherwise(uc)
            else when(uEx, coalesce(uc, tc)).otherwise(tc)
          merged.as(c)
        }
        joined.select(keyCols ++ outProps: _*)
    }
  }
}
