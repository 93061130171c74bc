package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class StreamDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String, tsSec: Long) =
    StreamDoc(id, text, new java.sql.Timestamp(tsSec * 1000L))

  test("streaming dedup emits first arrival per content, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val out = StreamingDedup.dedupStream(input.toDF(), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData(doc(1, "alpha beta", 100), doc(2, "gamma delta", 110))
      q.processAllAvailable()
      // batch 2: one in-window duplicate (same text), one new doc
      input.addData(doc(3, "alpha beta", 200), doc(4, "epsilon", 210))
      q.processAllAvailable()
      // batch 3: duplicate of batch-2 content
      input.addData(doc(5, "epsilon", 300))
      q.processAllAvailable()

      val rows = spark.table("dedup_test").as[StreamDoc].collect()
      assert(rows.map(_.text).sorted.toSeq == Seq("alpha beta", "epsilon", "gamma delta"))
      // first arrival kept: ids 1, 2, 4
      assert(rows.map(_.doc_id).toSet == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("streaming dedup matches batch dedup on the same data (kept content set)") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      doc(10, "x y z", 100), doc(11, "x y z", 101), doc(12, "p q", 102),
      doc(13, "p q", 103), doc(14, "r s t", 104))
    val input = MemoryStream[StreamDoc]
    val out = StreamingDedup.dedupStream(input.toDF(), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_parity")
      .outputMode("append").start()
    try {
      data.grouped(2).foreach { g => input.addData(g: _*); q.processAllAvailable() }
      val streamTexts = spark.table("dedup_parity").as[StreamDoc]
        .collect().map(_.text).sorted.toSeq
      val batchTexts = graft.ops.Dedup.exact(data.toDF(), "doc_id", "text")
        .collect().map(_.getString(1)).sorted.toSeq
      assert(streamTexts == batchTexts)
    } finally q.stop()
  }
}
