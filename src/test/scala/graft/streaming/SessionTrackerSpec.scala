package graft.streaming

import graft.SparkSpec
import graft.schema.TranscriptTurn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionTrackerSpec extends SparkSpec {
  import spark.implicits._

  private def turn(conv: String, idx: Int, role: String, tsSec: Long) =
    TranscriptTurn(conv, idx, role, s"text $idx", null,
      new java.sql.Timestamp(tsSec * 1000L))

  test("batch mode: one snapshot row per conversation, order-independent fold") {
    // rows deliberately out of turn order — the fold must not care
    val turns = Seq(
      turn("a", 2, "tool", 120), turn("a", 0, "user", 100), turn("a", 1, "assistant", 110),
      turn("b", 0, "user", 500)
    ).toDS()
    val got = SessionTracker.sessionize(turns, gapMs = 0L)
      .collect().map(s => s.conv_id -> s).toMap
    assert(got("a").n_turns == 3)
    assert(got("a").first_ts.getTime == 100000L && got("a").last_ts.getTime == 120000L)
    assert(got("a").last_role == "tool") // role at max turn_idx, not input order
    assert(!got("a").closed)
    assert(got("b").n_turns == 1 && got("b").last_role == "user")
  }

  test("streaming: state accumulates across micro-batches; inactivity gap closes the session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TranscriptTurn]
    val sessions = SessionTracker.sessionize(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs = 60000L) // 1-min gap
    val q = sessions.writeStream
      .format("memory").queryName("sess_test").outputMode("append").start()
    try {
      input.addData(turn("a", 0, "user", 1000), turn("a", 1, "assistant", 1010))
      q.processAllAvailable()
      input.addData(turn("a", 2, "tool", 1020)) // still inside the gap
      q.processAllAvailable()
      // a turn far in the future pushes the watermark past a's last+gap
      input.addData(turn("z", 0, "user", 10000))
      q.processAllAvailable()
      input.addData(turn("z", 1, "user", 20000)) // one more batch: fire timeouts
      q.processAllAvailable()

      val rows = spark.table("sess_test").as[ConvSession].collect()
      val aSnapshots = rows.filter(r => r.conv_id == "a" && !r.closed)
      // cumulative snapshots: 2 turns after batch 1, 3 after batch 2
      assert(aSnapshots.map(_.n_turns).sorted.toSeq == Seq(2L, 3L))
      val aClosed = rows.filter(r => r.conv_id == "a" && r.closed)
      assert(aClosed.length == 1, rows.mkString(";"))
      assert(aClosed.head.n_turns == 3)
      assert(aClosed.head.last_role == "tool")
      assert(aClosed.head.last_ts.getTime == 1020000L)
    } finally q.stop()
  }
}
