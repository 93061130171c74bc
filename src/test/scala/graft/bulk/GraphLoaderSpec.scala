package graft.bulk

import graft.SparkSpec
import graft.bulk.GraphLoader.{EdgeBatch, NodeBatch}
import graft.schema.{EqKey, NodeSpec, RelSpec}
import org.apache.spark.sql.functions._

/** B12 cascade contracts (reference: NodeModel.create()/merge(),
  * model.py:717-797; many-to-many counts test_model.py:269-310).
  */
class GraphLoaderSpec extends SparkSpec {
  import spark.implicits._

  val personSpec = NodeSpec(Seq("Person"), Seq("name"))
  val orgSpec = NodeSpec(Seq("Org"), Seq("name"))
  val worksAt = RelSpec("WORKS_AT", Seq("Person"), Seq("Org"),
    Seq(EqKey("name")), Seq(EqKey("name")))

  def people = Seq(Tuple1("alice"), Tuple1("bob")).toDF("name")
  def orgs = Seq(Tuple1("acme"), Tuple1("globex")).toDF("name")
  def staged = Seq(
    ("alice", "acme"), ("alice", "globex"), ("bob", "acme"), ("bob", "globex")
  ).toDF("start_name", "end_name")

  test("cascade: nodes materialize before edges; 2x2 staging yields 4 edges (test_model.py:269-310)") {
    val g = GraphLoader.merge(
      Seq(NodeBatch(personSpec, people), NodeBatch(orgSpec, orgs)),
      Seq(EdgeBatch(worksAt, staged)))
    assert(g.nodes.count() == 4)
    assert(g.edges.count() == 4)
    assert(g.edges.select("rel_type").distinct().head().getString(0) == "WORKS_AT")
  }

  test("merge cascade is idempotent end-to-end; create cascade blind-appends") {
    val g1 = GraphLoader.merge(
      Seq(NodeBatch(personSpec, people), NodeBatch(orgSpec, orgs)),
      Seq(EdgeBatch(worksAt, staged)))
    val g2 = GraphLoader.merge(
      Seq(NodeBatch(personSpec, people), NodeBatch(orgSpec, orgs)),
      Seq(EdgeBatch(worksAt, staged)), into = Some(g1))
    assert(g2.nodes.count() == 4)
    assert(g2.edges.count() == 4)
    // create semantics: blind append. The second create duplicates every
    // node, so endpoint MATCH resolves each staged pair against BOTH copies
    // of each endpoint (2x2): 4 existing + 4 staged x 4 resolutions = 20 —
    // the same duplication blowup Cypher's MATCH (a),(b) CREATE exhibits
    // over duplicated nodes (cf. the reference's re-create duplication,
    // test_model.py:334-388).
    val c1 = GraphLoader.create(
      Seq(NodeBatch(personSpec, people), NodeBatch(orgSpec, orgs)),
      Seq(EdgeBatch(worksAt, staged)))
    val c2 = GraphLoader.create(
      Seq(NodeBatch(personSpec, people), NodeBatch(orgSpec, orgs)),
      Seq(EdgeBatch(worksAt, staged)), into = Some(c1))
    assert(c1.edges.count() == 4)
    assert(c2.nodes.count() == 8)
    assert(c2.edges.count() == 20)
  }

  test("label-scoped merge: same key value under different primary labels stays two nodes") {
    val g = GraphLoader.merge(
      Seq(NodeBatch(personSpec, Seq(Tuple1("mercury")).toDF("name")),
        NodeBatch(orgSpec, Seq(Tuple1("mercury")).toDF("name"))),
      Nil)
    assert(g.nodes.count() == 2) // MERGE (n:Person {name}) vs (n:Org {name})
    val labels = g.nodes.select(element_at(col("labels"), 1)).as[String].collect().toSet
    assert(labels == Set("Person", "Org"))
  }

  test("edges resolve only against label-matching endpoints") {
    // an Org also named 'alice' must not capture Person alice's edges
    val g = GraphLoader.merge(
      Seq(NodeBatch(personSpec, people),
        NodeBatch(orgSpec, orgs.unionAll(Seq(Tuple1("alice")).toDF("name")))),
      Seq(EdgeBatch(worksAt, staged)))
    assert(g.edges.count() == 4) // still exactly the staged Person->Org pairs
    val out = g.traverse(Seq("Person"), Seq("name"), "WORKS_AT", Seq("Org"), Seq("name"))
    assert(out.count() == 2) // DISTINCT reached orgs: acme, globex — not Org('alice')
  }
}
