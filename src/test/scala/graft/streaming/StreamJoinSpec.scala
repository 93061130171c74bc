package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class SideEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, tsSec: Long) =
    SideEvent(id, user, new java.sql.Timestamp(tsSec * 1000L))

  test("stream-stream interval join matches across micro-batches, both orders") {
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[SideEvent]
    val right = MemoryStream[SideEvent]
    val joined = StreamJoin.intervalJoin(
        left.toDF().withWatermark("ts", "1 hour"),
        right.toDF().withWatermark("ts", "1 hour"),
        "user_id", "ts", "ts", windowSec = 30)
      .select(col("l.user_id").as("u"),
        col("l.event_id").as("le"), col("r.event_id").as("re"))
    val q = joined.writeStream.format("memory").queryName("sjoin_test")
      .outputMode("append").start()
    try {
      // batch 1: a left row whose right partner arrives LATER, and a right
      // row whose left partner arrives later (both directions buffer)
      left.addData(ev(1, 7, 100))
      right.addData(ev(101, 9, 200))
      q.processAllAvailable()
      // batch 2: the partners — r.ts within [l.ts, l.ts+30] in both cases
      right.addData(ev(102, 7, 120))            // matches left id 1 (100+20)
      left.addData(ev(2, 9, 180))               // matches right id 101 (180+20)
      // and non-matches: wrong key, outside the window, r before l
      right.addData(ev(103, 7, 140))            // 100+40 > window → no match
      right.addData(ev(104, 8, 110))            // no left user 8
      left.addData(ev(3, 9, 250))               // right 101 at 200 < 250 → no
      q.processAllAvailable()
      val out = spark.table("sjoin_test").as[(Long, Long, Long)].collect().toSet
      assert(out === Set((7L, 1L, 102L), (9L, 2L, 101L)))
    } finally q.stop()
  }

  test("streaming result equals the batch join on identical inputs") {
    val l = Seq(ev(1, 1, 100), ev(2, 1, 160), ev(3, 2, 100)).toDF()
    val r = Seq(ev(10, 1, 110), ev(11, 1, 170), ev(12, 2, 200)).toDF()
    val out = StreamJoin.intervalJoin(l, r, "user_id", "ts", "ts", 30)
      .select(col("l.event_id"), col("r.event_id"))
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 11L)))
  }
}
