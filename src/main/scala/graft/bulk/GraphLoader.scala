package graft.bulk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ogm.Graph
import graft.schema.{NodeSpec, RelSpec}

/** B12 — the cascade create/merge orchestration as a reusable API
  * (reference: NodeModel.create()/merge(), model.py:717-797): ALL node sets
  * materialize before ANY relationship set resolves, the same dependency
  * rule as docs/details/bulk.md:305-319 — endpoint resolution can only see
  * nodes that exist.
  *
  * The node sets union into ONE uber node table (labels column
  * distinguishes them; schemas align by name) and the relationship sets
  * into ONE edge table with per-row rel_type — the scale-friendly layout:
  * one MERGE target per kind instead of a table per label/type.
  *
  * Deviation (documented): the reference's instance-level re-create
  * produces idiosyncratic duplicate counts (a relset rebuilt per pair,
  * test_model.py:334-388); here create is uniformly blind-append (×2 on
  * re-create) and merge is uniformly idempotent — the same rules as the
  * underlying B1-B4 operators.
  */
object GraphLoader {

  final case class NodeBatch(spec: NodeSpec, rows: DataFrame)
  /** `staged` carries the flattened `start_&lt;k&gt;` / `end_&lt;k&gt;` match columns (A7). */
  final case class EdgeBatch(spec: RelSpec, staged: DataFrame)

  private def loadNodes(target: Option[DataFrame], batches: Seq[NodeBatch],
                        create: Boolean): Option[DataFrame] =
    batches.foldLeft(target) { (acc, b) =>
      Some(if (create) NodeSetOps.create(acc, b.rows, b.spec)
           else NodeSetOps.merge(acc, b.rows, b.spec))
    }

  private def loadEdges(target: Option[DataFrame], nodes: DataFrame,
                        batches: Seq[EdgeBatch], create: Boolean): Option[DataFrame] =
    batches.foldLeft(target) { (acc, b) =>
      Some(if (create) RelSetOps.create(acc, b.staged, nodes, b.spec)
           else RelSetOps.merge(acc, b.staged, nodes, b.spec))
    }

  /** Cascade CREATE: blind-append node sets, then resolve + append edges. */
  def create(nodes: Seq[NodeBatch], edges: Seq[EdgeBatch],
             into: Option[Graph] = None): Graph = {
    val nodeTable = loadNodes(into.map(_.nodes), nodes, create = true).get
    val edgeTable = loadEdges(into.map(_.edges), nodeTable, edges, create = true)
    Graph(nodeTable, edgeTable.getOrElse(emptyEdges(nodeTable)))
  }

  /** Cascade MERGE: keyed-upsert node sets, then resolve + upsert edges on
    * (src, dst, type). Idempotent end-to-end.
    */
  def merge(nodes: Seq[NodeBatch], edges: Seq[EdgeBatch],
            into: Option[Graph] = None): Graph = {
    val nodeTable = loadNodes(into.map(_.nodes), nodes, create = false).get
    val edgeTable = loadEdges(into.map(_.edges), nodeTable, edges, create = false)
    Graph(nodeTable, edgeTable.getOrElse(emptyEdges(nodeTable)))
  }

  private def emptyEdges(nodes: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField(RelSetOps.SrcId, LongType),
        StructField(RelSetOps.DstId, LongType),
        StructField(RelSetOps.RelType, StringType))))
  }
}
