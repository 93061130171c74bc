package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("synthetic media table matches the declared schema contract") {
    val m = Multimodal.syntheticMedia(spark, 30)
    assert(m.columns.toSeq == Seq("media_id", "kind", "payload", "meta"))
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and batch-shaped") {
    val m = Multimodal.syntheticMedia(spark, 50)
    val f1 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(f => f.feature.forall(v => v >= 0f && v <= 1f)))
  }

  test("size-aware repartition spreads payload bytes") {
    val m = Multimodal.syntheticMedia(spark, 200)
    val parts = Multimodal.repartitionBySize(m, 4096)
    assert(parts.rdd.getNumPartitions >= 2)
    assert(parts.count() == 200)
  }

  test("byte-aware assignment bounds max partition bytes on a SKEWED fixture") {
    import spark.implicits._
    // 1 huge payload (16 KiB) + 300 small (~100 B) — hash-on-id partitioning
    // would co-locate the whale with ~equal row counts; byte-aware assignment
    // must keep every partition within 2x the 8 KiB target
    val target = 8192L
    val rows = (0 until 301).map { i =>
      val sz = if (i == 0) 16384 else 100
      (i.toLong, "image", Array.fill[Byte](sz)((i % 127).toByte))
    }.toDF("media_id", "kind", "payload").repartition(7)
    val parts = Multimodal.repartitionBySize(rows, target)
    val perPart = parts
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"),
        length(col("payload")).cast("long").as("b"))
      .groupBy("p").agg(sum(col("b")).as("bytes"))
      .collect().map(_.getLong(1))
    assert(parts.count() == 301)
    val maxItem = 16384L
    // bound: target + largest single payload (the whale can't split)
    assert(perPart.max <= target + maxItem, s"max partition ${perPart.max}")
    // and the small rows don't all pile into one partition either
    assert(perPart.count(_ > 0) >= 4, perPart.mkString(","))
  }

  test("frame-sample plan emits offsets only for video rows") {
    val m = Multimodal.syntheticMedia(spark, 30)
    val plan = Multimodal.frameSamplePlan(m, 1000)
    val ids = plan.select("media_id").distinct().count()
    val videos = m.filter(col("kind") === "video").count()
    assert(ids == videos)
    assert(plan.filter(col("frame_ms") % 1000 =!= 0).count() == 0)
  }
}
