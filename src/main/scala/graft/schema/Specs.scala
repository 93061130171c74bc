package graft.schema

/** Typed specs — the Scala form of the reference's container configuration.
  *
  * Reference: graphio's NodeSet config (graphio/bulk/nodeset.py:23-53) and
  * RelationshipSet config (graphio/bulk/relationshipset.py:42-76). In the
  * reference these are runtime attributes on Python container objects; here
  * they are immutable case classes interpreted by `graft.bulk` operators over
  * DataFrames — no driver-side row buffering (the "buffer" is the DataFrame).
  */
final case class NodeSpec(
    labels: Seq[String],
    mergeKeys: Seq[String],
    defaultProps: Map[String, Any] = Map.empty,
    preserve: Seq[String] = Nil,
    appendProps: Seq[String] = Nil,
    additionalLabels: Seq[String] = Nil,
    deduplicate: Boolean = false,
    // EXTENSION (no reference analogue): numeric props accumulated by
    // ADDITION on match — the merge rule incremental/streaming loads need so
    // counts converge to the batch pipeline's totals (arithmetic-update
    // MERGE, à la `UPDATE SET n.c = n.c + u.c`).
    sumProps: Seq[String] = Nil,
    // EXTENSION: temporal-validity accumulation on match — minProps keep
    // the smallest value ever merged (first_seen), maxProps the largest
    // (last_seen). Orderable types (timestamps, numerics, strings).
    minProps: Seq[String] = Nil,
    maxProps: Seq[String] = Nil
) {
  require(mergeKeys.nonEmpty, "mergeKeys must be non-empty (nodeset.py:180-184)")
  def allLabels: Seq[String] = (labels ++ additionalLabels).distinct
}

/** Endpoint match key for relationship resolution.
  * EqKey: `rel.start_k = node.k` equality (relationshipset.py:330-338).
  * ArrayKey: `rel.start_k IN node.k` containment — the reference's
  * ArrayProperty (relationshipset.py:344-352, test_relationshipset.py:192-216).
  */
sealed trait KeyMatch { def name: String }
final case class EqKey(name: String) extends KeyMatch
final case class ArrayKey(name: String) extends KeyMatch

final case class RelSpec(
    relType: String,
    startNodeLabels: Seq[String],
    endNodeLabels: Seq[String],
    startNodeProperties: Seq[KeyMatch],
    endNodeProperties: Seq[KeyMatch],
    defaultProps: Map[String, Any] = Map.empty,
    appendProps: Seq[String] = Nil,
    unique: Boolean = false,
    // EXTENSION: numeric edge props accumulated by ADDITION on match (see
    // NodeSpec.sumProps) — support/mention counts under incremental merges.
    sumProps: Seq[String] = Nil,
    // EXTENSION: temporal-validity accumulation on match (see
    // NodeSpec.minProps/maxProps) — edge first_seen/last_seen intervals.
    minProps: Seq[String] = Nil,
    maxProps: Seq[String] = Nil
) {
  require(startNodeProperties.nonEmpty && endNodeProperties.nonEmpty,
    "endpoint match properties required (relationshipset.py:42-76)")
}

/** Filter predicate ADT — the Spark form of the reference's FilterOp /
  * RelField algebra (graphio/ogm/model.py:25-90). Conjunctive-only, same as
  * the reference (no OR / NOT in the public API).
  */
sealed trait FilterOp
object FilterOp {
  case object Eq extends FilterOp
  case object Ne extends FilterOp
  case object Gt extends FilterOp
  case object Lt extends FilterOp
  case object Ge extends FilterOp
  case object Le extends FilterOp
  case object StartsWith extends FilterOp
  case object EndsWith extends FilterOp
  case object Contains extends FilterOp
}

final case class FieldFilter(field: String, op: FilterOp, value: Any) {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}
  // value may be a scalar (incl. java.sql.Timestamp/Date for temporal
  // predicates, test_model.py:1259-1430) or a pre-built Column (e.g.
  // to_timestamp(...) when the caller wants session-timezone parsing)
  private def v: Column = value match {
    case c: Column => c
    case x         => lit(x)
  }
  def toColumn: Column = toColumnOn(col(field))
  def toColumnOn(c: Column): Column = op match {
    case FilterOp.Eq         => c === v
    case FilterOp.Ne         => c =!= v
    case FilterOp.Gt         => c > v
    case FilterOp.Lt         => c < v
    case FilterOp.Ge         => c >= v
    case FilterOp.Le         => c <= v
    case FilterOp.StartsWith => c.startsWith(value.toString)
    case FilterOp.EndsWith   => c.endsWith(value.toString)
    case FilterOp.Contains   => c.contains(value.toString)
  }
}

/** The primary input row shape, per BASELINE.json input_hint. */
final case class TranscriptTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // nullable
    ts: java.sql.Timestamp
)

/** One extracted knowledge triple. */
final case class Triple(
    subj: String,
    pred: String,
    obj: String,
    conv_id: String,
    turn_idx: Int,
    score: Double
)
