package graft.schema

import scala.collection.concurrent.TrieMap

/** B13 — the model registry / catalog, Scala form.
  *
  * The reference keeps a metaclass-populated `_MODEL_REGISTRY` name→class
  * map plus class-level driver/database config (graphio/ogm/model.py:13,
  * 239-242, 556-606). Here the registry is explicit: named NodeSpec/RelSpec
  * entries plus a target namespace ("database") that individual writes can
  * override per call — mirroring the database-parameter precedence tests
  * (test/ogm/test_model_database_parameter.py:80-118).
  */
final class GraphSchema(val defaultNamespace: String = "default") {
  private val nodeSpecs = TrieMap.empty[String, NodeSpec]
  private val relSpecs = TrieMap.empty[String, RelSpec]

  def register(name: String, spec: NodeSpec): this.type = { nodeSpecs.put(name, spec); this }
  def register(name: String, spec: RelSpec): this.type = { relSpecs.put(name, spec); this }

  def node(name: String): NodeSpec =
    nodeSpecs.getOrElse(name, throw new NoSuchElementException(
      s"no NodeSpec '$name' registered (get_class_by_name analogue)"))
  def rel(name: String): RelSpec =
    relSpecs.getOrElse(name, throw new NoSuchElementException(s"no RelSpec '$name' registered"))

  def nodeNames: Set[String] = nodeSpecs.keySet.toSet
  def relNames: Set[String] = relSpecs.keySet.toSet

  /** A11 — deterministic artifact naming (nodeset.py:123-141: e.g.
    * "nodeset_Label_key"). Per-call namespace override wins over the
    * registry default, like the reference's `database=` parameter.
    */
  def nodeTablePath(root: String, spec: NodeSpec, namespace: Option[String] = None): String =
    s"$root/${namespace.getOrElse(defaultNamespace)}/${GraphSchema.nodeTableName(spec)}"

  def relTablePath(root: String, spec: RelSpec, namespace: Option[String] = None): String =
    s"$root/${namespace.getOrElse(defaultNamespace)}/${GraphSchema.relTableName(spec)}"
}

object GraphSchema {
  def nodeTableName(spec: NodeSpec): String =
    s"nodeset_${spec.allLabels.mkString("_")}_${spec.mergeKeys.mkString("_")}"
  def relTableName(spec: RelSpec): String =
    s"relationshipset_${spec.relType}_${spec.startNodeLabels.mkString("_")}_${spec.endNodeLabels.mkString("_")}"
}
