package graft.schema

import org.scalatest.funsuite.AnyFunSuite

class GraphSchemaSpec extends AnyFunSuite {

  val person = NodeSpec(Seq("Person"), Seq("name"))
  val knows = RelSpec("KNOWS", Seq("Person"), Seq("Person"), Seq(EqKey("name")), Seq(EqKey("name")))

  test("registry lookup by name (B13, model.py:239-242)") {
    val g = new GraphSchema().register("Person", person).register("KNOWS", knows)
    assert(g.node("Person") == person)
    assert(g.rel("KNOWS") == knows)
    assert(g.nodeNames == Set("Person"))
    intercept[NoSuchElementException](g.node("Nope"))
  }

  test("deterministic artifact naming (A11, nodeset.py:123-141)") {
    val g = new GraphSchema("prod")
    val spec = NodeSpec(Seq("Test", "Foo"), Seq("uuid", "other"), additionalLabels = Seq("Extra"))
    assert(g.nodeTablePath("/w", spec) == "/w/prod/nodeset_Test_Foo_Extra_uuid_other")
    assert(g.relTablePath("/w", knows) == "/w/prod/relationshipset_KNOWS_Person_Person")
  }

  test("per-call namespace override wins (test_model_database_parameter.py:80-118)") {
    val g = new GraphSchema("global_db")
    assert(g.nodeTablePath("/w", person, Some("percall_db"))
      == "/w/percall_db/nodeset_Person_name")
  }

  test("NodeSpec validates merge keys like the reference (nodeset.py:180-184)") {
    intercept[IllegalArgumentException](NodeSpec(Seq("X"), Nil))
  }
}
