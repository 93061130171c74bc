package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BatchingSpec extends SparkSpec {
  import spark.implicits._

  test("25 rows @ batch 10 → 10/10/5 (test_nodeset.py:394-443)") {
    val df = (1 to 25).toDF("i")
    assert(Batching.batchCounts(df, col("i"), 10) == Seq(10L, 10L, 5L))
  }

  test("23 rows @ batch 10 → 10/10/3 (test_nodeset.py:446-483)") {
    val df = (1 to 23).toDF("i")
    assert(Batching.batchCounts(df, col("i"), 10) == Seq(10L, 10L, 3L))
  }

  test("27 rels @ batch 10 → 10/10/7; 22 → 10/10/2 (test_relationshipset.py:376-465)") {
    assert(Batching.batchCounts((1 to 27).toDF("i"), col("i"), 10) == Seq(10L, 10L, 7L))
    assert(Batching.batchCounts((1 to 22).toDF("i"), col("i"), 10) == Seq(10L, 10L, 2L))
  }

  test("exact multiple leaves no ragged batch") {
    assert(Batching.batchCounts((1 to 30).toDF("i"), col("i"), 10) == Seq(10L, 10L, 10L))
  }
}
