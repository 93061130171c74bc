package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot versioning + time travel: every (re)commit of a stage is a new
  * immutable version directory plus one atomic log line; resume reads the
  * LATEST committed version and older versions stay readable.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("recommit creates a new version; time travel reads the old one") {
    val wd = tmpDir("graft-snapver")
    val r = new StageRunner(spark, wd)
    try {
      val v1 = r.stage("vals")(Seq(1, 2, 3).toDF("x"))
      assert(v1.as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
      assert(r.log.latest("vals").get.version === 1)

      // stage() on a committed stage resumes, does NOT rebuild
      r.stage("vals")(sys.error("must not recompute"): org.apache.spark.sql.DataFrame)

      val v2 = r.recommit("vals")(Seq(4, 5).toDF("x"))
      assert(v2.as[Int].collect().sorted.toSeq === Seq(4, 5))
      assert(r.log.latest("vals").get.version === 2)

      // current read = latest version; time travel = the old snapshot
      assert(r.stage("vals")(sys.error("no"): org.apache.spark.sql.DataFrame)
        .as[Int].collect().sorted.toSeq === Seq(4, 5))
      assert(r.readAsOf("vals", 1).as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
      assert(intercept[IllegalArgumentException](r.readAsOf("vals", 9))
        .getMessage.contains("version=9"))
    } finally r.close()
  }

  test("expireSnapshots deletes old version dirs, keeps the log and batch idempotence") {
    val wd = tmpDir("graft-expire")
    val r = new StageRunner(spark, wd)
    try {
      r.mergeStage("t", "b1")(_ => Seq(1).toDF("x"))
      r.mergeStage("t", "b2")(prev => prev.get.unionAll(Seq(2).toDF("x")))
      r.mergeStage("t", "b3")(prev => prev.get.unionAll(Seq(3).toDF("x")))
      assert(r.log.latest("t").get.version === 3)

      val deleted = r.expireSnapshots("t", keepLast = 1)
      assert(deleted.size === 2 && deleted.forall(_.matches(""".*/v[12]$""")))
      deleted.foreach(p => assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
      // latest still reads; expired time travel now fails on the missing dir
      assert(r.readLatest("t").get.as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
      assert(intercept[Exception](r.readAsOf("t", 1).collect()) != null)
      // the log kept every batch note: replaying an EXPIRED batch still skips
      val replay = r.mergeStage("t", "b1")(_ => sys.error("must not re-apply"))
      assert(replay.as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
      assert(r.log.latest("t").get.version === 3)
      // keepLast must retain at least one version
      assert(intercept[IllegalArgumentException](r.expireSnapshots("t", 0)) != null)
    } finally r.close()
  }

  test("a deleted (uncommitted) log line recomputes into the same version slot") {
    val wd = tmpDir("graft-snapcrash")
    val r = new StageRunner(spark, wd)
    try {
      r.stage("a")(Seq(1).toDF("x"))
      r.stage("b")(Seq(2).toDF("x"))
      // simulate a crash before commit: drop stage a's log line; its data
      // dir is now orphaned garbage
      val logPath = java.nio.file.Paths.get(wd, "_graft_snapshots.jsonl")
      import scala.jdk.CollectionConverters._
      val kept = java.nio.file.Files.readAllLines(logPath).asScala
        .filterNot(_.contains("\"stage\":\"a\""))
      java.nio.file.Files.write(logPath, kept.asJava)

      val r2 = new StageRunner(spark, wd)
      try {
        // a recomputes (v1 overwritten); b resumes
        assert(r2.stage("a")(Seq(7).toDF("x")).as[Int].collect().toSeq === Seq(7))
        assert(r2.log.latest("a").get.version === 1)
        assert(r2.stage("b")(sys.error("no"): org.apache.spark.sql.DataFrame)
          .as[Int].collect().toSeq === Seq(2))
      } finally r2.close()
    } finally r.close()
  }

  test("legacy log lines without a version field read as version 1") {
    val wd = tmpDir("graft-snaplegacy")
    val dataDir = s"$wd/old_stage"
    Seq(10, 20).toDF("x").write.parquet(dataDir)
    val log = new SnapshotLog(wd)
    // pre-versioning line shape: no "version" key
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(wd, "_graft_snapshots.jsonl"),
      s"""{"stage":"old_stage","path":"$dataDir","rows":2,"partitions":1,"ts":1}\n""")
    assert(log.latest("old_stage").get.version === 1)
    val r = new StageRunner(spark, wd)
    try assert(r.stage("old_stage")(sys.error("no"): org.apache.spark.sql.DataFrame)
      .as[Int].collect().sorted.toSeq === Seq(10, 20))
    finally r.close()
  }

  test("recommit of a legacy stage anchors beside the legacy dir, not inside it") {
    val wd = tmpDir("graft-snaplegacy2")
    val dataDir = s"$wd/old_stage"
    Seq(10, 20).toDF("x").write.parquet(dataDir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(wd, "_graft_snapshots.jsonl"),
      s"""{"stage":"old_stage","path":"$dataDir","rows":2,"partitions":1,"ts":1}\n""")
    val r = new StageRunner(spark, wd)
    try {
      val v2 = r.recommit("old_stage")(Seq(30).toDF("x"))
      assert(v2.as[Int].collect().toSeq === Seq(30))
      // the new version directory must NOT nest inside the legacy parquet
      // dir (that would break legacy-path reads with mixed files+subdirs)
      val p2 = r.log.latest("old_stage").get.path
      assert(r.log.latest("old_stage").get.version === 2)
      assert(!p2.startsWith(dataDir + "/"), p2)
      // both versions stay readable: time travel to v1 AND current v2
      assert(r.readAsOf("old_stage", 1).as[Int].collect().sorted.toSeq === Seq(10, 20))
      assert(r.stage("old_stage")(sys.error("no"): org.apache.spark.sql.DataFrame)
        .as[Int].collect().toSeq === Seq(30))
      // a third commit keeps anchoring beside (never regresses to nesting)
      r.recommit("old_stage")(Seq(40).toDF("x"))
      val p3 = r.log.latest("old_stage").get.path
      assert(!p3.startsWith(dataDir + "/"), p3)
      assert(r.readAsOf("old_stage", 2).as[Int].collect().toSeq === Seq(30))
    } finally r.close()
  }

  test("snapshotDiff emits exactly the inserted/deleted/updated delta") {
    val wd = tmpDir("graft-cdc-spec")
    val r = new StageRunner(spark, wd)
    try {
      r.stage("t")(Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "n"))
      // v2: key 1 unchanged, key 2 updated, key 3 deleted, key 4 inserted
      r.recommit("t")(Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40)).toDF("k", "s", "n"))
      val diff = r.snapshotDiff("t", 1, 2, Seq("k"))
        .as[(Long, String)].collect().toMap
      assert(diff === Map(2L -> "updated", 3L -> "deleted", 4L -> "inserted"))
      // schema evolution between versions: an added column must not mark
      // every shared row updated — only the SHARED columns compare
      r.recommit("t")(Seq((1L, "a", 10, true), (2L, "B", 20, true))
        .toDF("k", "s", "n", "extra"))
      val d2 = r.snapshotDiff("t", 2, 3, Seq("k")).as[(Long, String)].collect().toMap
      assert(d2 === Map(4L -> "deleted"))
      // null-safe compare: null -> value and value -> null are updates
      r.recommit("t")(Seq((1L, null.asInstanceOf[java.lang.Integer]),
        (2L, Integer.valueOf(5))).toDF("k", "n"))
      r.recommit("t")(Seq((1L, Integer.valueOf(7)),
        (2L, null.asInstanceOf[java.lang.Integer])).toDF("k", "n"))
      val d3 = r.snapshotDiff("t", 4, 5, Seq("k")).as[(Long, String)].collect().toMap
      assert(d3 === Map(1L -> "updated", 2L -> "updated"))
    } finally r.close()
  }
}
