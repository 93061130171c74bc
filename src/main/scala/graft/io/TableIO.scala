package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable

/** Table format abstraction. The sandbox has no Iceberg runtime jar, so the
  * local implementation is parquet + an explicit commit log that supplies the
  * atomic "snapshot committed" semantics; the same call sites lower to
  * `format("iceberg")` + real snapshots under spark-submit in production
  * (SURVEY §7.0). Stage writes are atomic at the directory level: parquet
  * write to the final path only succeeds as a unit (Spark's commit protocol),
  * and the stage only counts as done once SnapshotLog records it.
  */
object TableIO {
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def exists(path: String): Boolean =
    Files.exists(Paths.get(path, "_SUCCESS"))
}

/** Per-stage commit log → resume-from-last-committed-snapshot, with
  * Iceberg-style snapshot VERSIONS: every commit of a stage is a new
  * immutable version directory plus one appended log line
  * {stage, path, version, rows, partitions, ts} — append is a single
  * O_APPEND write, atomic at line granularity, so "committed" is exactly
  * "has a log line" (the Iceberg snapshot-pointer-swap analogue). Old
  * versions stay readable (time travel) until explicitly expired.
  */
final class SnapshotLog(dir: String) {
  private val logPath = Paths.get(dir, "_graft_snapshots.jsonl")
  Files.createDirectories(Paths.get(dir))

  final case class Snapshot(stage: String, path: String, version: Int, ts: Long,
                            note: String = "")

  /** All committed snapshots, log order (oldest first). Lines written
    * before versioning carry no version field → version 1; `note` carries
    * an optional caller tag (e.g. the batch id a merge commit applied —
    * the idempotence key for resumable incremental merges).
    */
  def snapshots(): Seq[Snapshot] =
    if (!Files.exists(logPath)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val stageRe = """"stage":"([^"]+)"""".r
      val pathRe = """"path":"([^"]+)"""".r
      val verRe = """"version":(\d+)""".r
      val tsRe = """"ts":(\d+)""".r
      val noteRe = """"note":"([^"]*)"""".r
      Files.readAllLines(logPath).asScala.toSeq.flatMap { l =>
        for {
          st <- stageRe.findFirstMatchIn(l).map(_.group(1))
          p <- pathRe.findFirstMatchIn(l).map(_.group(1))
        } yield Snapshot(st, p,
          verRe.findFirstMatchIn(l).map(_.group(1).toInt).getOrElse(1),
          tsRe.findFirstMatchIn(l).map(_.group(1).toLong).getOrElse(0L),
          noteRe.findFirstMatchIn(l).map(_.group(1)).getOrElse(""))
      }
    }

  def committedStages(): Set[String] = snapshots().map(_.stage).toSet

  def isCommitted(stage: String): Boolean = committedStages().contains(stage)

  /** Latest committed snapshot of a stage (the current table state). */
  def latest(stage: String): Option[Snapshot] =
    snapshots().filter(_.stage == stage).sortBy(_.version).lastOption

  /** A specific committed version — time travel. */
  def asOf(stage: String, version: Int): Option[Snapshot] =
    snapshots().find(s => s.stage == stage && s.version == version)

  /** Next version number for a stage: 1 + max COMMITTED version. A crashed
    * (uncommitted) write at that version left only an orphaned directory,
    * which the retry overwrites — uncommitted data files are garbage, as
    * in any snapshot-pointer table format.
    */
  def nextVersion(stage: String): Int =
    latest(stage).map(_.version + 1).getOrElse(1)

  def commit(stage: String, path: String, rows: Long, partitions: Int,
             version: Int = 1, note: String = ""): Unit = {
    require(!note.contains("\"") && !note.contains("\n"),
      s"snapshot note must be quote/newline-free, got: $note")
    val noteField = if (note.isEmpty) "" else s""","note":"$note""""
    val line =
      s"""{"stage":"$stage","path":"$path","version":$version,"rows":$rows,"partitions":$partitions$noteField,"ts":${System.currentTimeMillis()}}\n"""
    Files.writeString(logPath, line, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def reset(): Unit = Files.deleteIfExists(logPath)
}

/** Per-partition lineage + metrics, captured from Spark's own task metrics
  * (a SparkListener on task end) — zero extra jobs, no second pass over the
  * data. Mirrors the reference's exact batch accounting
  * (test_nodeset.py:394-483) at the partition level.
  */
final case class TaskRow(stage: String, taskId: Long, partitionId: Int,
                         recordsWritten: Long, recordsRead: Long, durationMs: Long)

final class MetricsCollector(spark: SparkSession) extends SparkListener {
  private val rows = new ConcurrentHashMap[Long, TaskRow]()
  @volatile private var currentStage: String = "unknown"

  spark.sparkContext.addSparkListener(this)

  def setStage(name: String): Unit = currentStage = name

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      val written = m.outputMetrics.recordsWritten
      val read = m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
      if (written > 0 || read > 0)
        rows.put(te.taskInfo.taskId, TaskRow(currentStage, te.taskInfo.taskId,
          te.taskInfo.index, written, read, te.taskInfo.duration))
    }
  }

  /** Detach from the SparkContext — a collector left registered after its
    * pipeline finishes would keep receiving (and retaining) task rows for
    * every later job in the session.
    */
  def close(): Unit = {
    spark.sparkContext.removeSparkListener(this)
    rows.clear()
  }

  def drain(): Seq[TaskRow] = {
    import scala.jdk.CollectionConverters._
    val out = rows.values().asScala.toSeq
    rows.clear()
    out
  }

  /** Persist drained metrics rows for `stage` as parquet lineage. */
  def flush(stage: String, dir: String): Long = {
    val drained = drain().filter(_.stage == stage)
    val written = drained.map(_.recordsWritten).sum
    if (drained.nonEmpty) {
      import spark.implicits._
      spark.createDataset(drained)
        .toDF("stage", "task_id", "partition_id", "records_written", "records_read", "duration_ms")
        .coalesce(1).write.mode("append").parquet(s"$dir/_graft_lineage")
    }
    written
  }
}

/** Stage runner: compute-or-resume each named stage, with lineage + metrics
  * and snapshot commit. The unit of resumability: a killed job restarted with
  * the same workDir skips every committed stage and recomputes only the rest.
  */
final class StageRunner(spark: SparkSession, workDir: String) extends AutoCloseable {
  val log = new SnapshotLog(workDir)
  val metrics = new MetricsCollector(spark)

  /** Release the metrics listener; call when the pipeline is done. */
  override def close(): Unit = metrics.close()

  def stage(name: String)(compute: => DataFrame): DataFrame =
    log.latest(name) match {
      case Some(snap) if TableIO.exists(snap.path) => TableIO.read(spark, snap.path)
      case _ => writeVersion(name)(compute)
    }

  /** Force a NEW snapshot version of a committed stage (rebuild /
    * compaction); older versions stay readable via [[readAsOf]].
    */
  def recommit(name: String)(compute: => DataFrame): DataFrame =
    writeVersion(name)(compute)

  /** MERGE INTO a snapshot-managed table — the production shape of
    * incremental maintenance: read the latest COMMITTED snapshot of the
    * stage, apply `merge` (e.g. NodeSetOps/RelSetOps.merge of one batch),
    * and commit the result as a NEW version tagged with `batchId`.
    *
    * `batchId` is the exactly-once key: if any committed version of this
    * stage already carries it, the batch was fully merged before a crash
    * and the call SKIPS the merge, returning the current table — so a
    * killed-and-restarted incremental pipeline that replays its batches
    * converges to the same table instead of double-counting sum-merged
    * props. (This is the commit-log analogue of Iceberg's
    * write.wap/branch-dedupe on MERGE INTO, and pairs with Structured
    * Streaming's foreachBatch batchId contract.)
    */
  def mergeStage(name: String, batchId: String)
                (merge: Option[DataFrame] => DataFrame): DataFrame = {
    require(batchId.nonEmpty, "mergeStage needs a non-empty batchId")
    val prior = log.snapshots().filter(_.stage == name)
    if (prior.exists(_.note == batchId))
      TableIO.read(spark, log.latest(name).get.path)
    else {
      val prev = log.latest(name).filter(s => TableIO.exists(s.path))
        .map(s => TableIO.read(spark, s.path))
      writeVersion(name, note = batchId)(merge(prev))
    }
  }

  /** Expire old snapshots of a stage: delete the DATA directories of all
    * but the newest `keepLast` committed versions, returning the deleted
    * paths. The storage-hygiene half of the snapshot contract — version
    * dirs are immutable and accumulate forever without it.
    *
    * The LOG is deliberately left intact: log lines are bytes, data dirs
    * are the cost, and the lines carry the batch-id notes that make
    * [[mergeStage]] exactly-once — dropping an expired line would let a
    * replay of its batch RE-apply. `readAsOf` on an expired version now
    * fails with a missing path (as in any snapshot format after
    * expiry); `readLatest`/`stage` never touch expired versions. Only
    * version-suffixed dirs (`.../v<N>` or `...__v<N>`) under this
    * runner's workDir are ever deleted — legacy unversioned stage dirs
    * are skipped, conservatively.
    */
  def expireSnapshots(name: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val versions = log.snapshots().filter(_.stage == name)
      .sortBy(_.version).map(_.path).distinct
    // containment check is separator-bounded: a SIBLING dir sharing the
    // workDir prefix (".../wd-other/v1" vs workDir ".../wd") must not pass
    val workRoot =
      if (workDir.endsWith(java.io.File.separator)) workDir
      else workDir + java.io.File.separator
    val doomed = versions.dropRight(keepLast)
      .filter(p => p.startsWith(workRoot) && p.matches(""".*(/v|__v)\d+$"""))
    doomed.foreach { p =>
      val root = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .sortBy(-_.getNameCount) // children before parents
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    doomed
  }

  /** Latest committed snapshot of a stage, if any — the current table. */
  def readLatest(name: String): Option[DataFrame] =
    log.latest(name).filter(s => TableIO.exists(s.path))
      .map(s => TableIO.read(spark, s.path))

  /** CDC read between two committed snapshot versions — "what changed":
    * one row per key whose row was INSERTED, DELETED, or UPDATED from
    * `fromVersion` to `toVersion` (unchanged rows are not emitted; an
    * incremental consumer processes exactly the delta). Row identity is
    * `keyCols`; "updated" compares every column the two versions' schemas
    * SHARE (null-safe), so added/dropped columns don't spuriously mark
    * every row changed across a schema-evolution commit. This is the
    * snapshot-log analogue of an Iceberg changelog read (`
    * table_changes`), built from exactly the two immutable version dirs —
    * no commit-time bookkeeping, works retroactively on any pair.
    *
    * Shape: one full-outer hash join on the keys; both sides prune to
    * keys + shared columns at the scan. At 100 TB the join shuffles once
    * on the key — the same cost as the MERGE that produced the versions —
    * and emits only the (typically tiny) delta.
    */
  def snapshotDiff(name: String, fromVersion: Int, toVersion: Int,
                   keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    val from = readAsOf(name, fromVersion)
    val to = readAsOf(name, toVersion)
    require(keyCols.forall(from.columns.contains) && keyCols.forall(to.columns.contains),
      s"key columns ${keyCols.mkString(",")} must exist in both versions")
    val shared = (from.columns.toSet intersect to.columns.toSet)
      .toSeq.sorted.filterNot(keyCols.contains)
    val f = from.select((keyCols.map(col) :+ lit(true).as("_f")) ++
      shared.map(c => col(c).as(s"_f_$c")): _*)
    val tt = to.select((keyCols.map(col) :+ lit(true).as("_t")) ++
      shared.map(c => col(c).as(s"_t_$c")): _*)
    val changed =
      if (shared.isEmpty) lit(false)
      else shared.map(c => !(col(s"_f_$c") <=> col(s"_t_$c"))).reduce(_ || _)
    f.join(tt, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("_f").isNull, lit("inserted"))
          .when(col("_t").isNull, lit("deleted"))
          .when(changed, lit("updated")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }

  /** Time travel: read a stage as of a specific committed version. */
  def readAsOf(name: String, version: Int): DataFrame =
    log.asOf(name, version) match {
      case Some(snap) => TableIO.read(spark, snap.path)
      case None => throw new IllegalArgumentException(
        s"no committed snapshot: stage=$name version=$version")
    }

  private def writeVersion(name: String, note: String = "")(compute: => DataFrame): DataFrame = {
    val ver = log.nextVersion(name)
    // Legacy guard: a stage whose only commit predates versioning has its
    // parquet at <workDir>/<stage> ITSELF (no /v<N> suffix). Writing v2 to
    // <workDir>/<stage>/v2 would nest the new parquet INSIDE the legacy
    // data directory, and any read of the legacy path (readAsOf v1) then
    // hits Spark's mixed files-and-subdirectory discovery failure. Anchor
    // post-legacy versions BESIDE it instead: <workDir>/<stage>__v<N>.
    val legacyAnchored = log.latest(name).exists(s => !s.path.matches(""".*/v\d+$"""))
    val path = if (legacyAnchored) s"$workDir/${name}__v$ver" else s"$workDir/$name/v$ver"
    metrics.setStage(name)
    spark.sparkContext.setJobDescription(s"graft-stage:$name")
    val df = compute
    TableIO.write(df, path)
    val written = metrics.flush(name, workDir)
    val out = TableIO.read(spark, path)
    log.commit(name, path, written, out.rdd.getNumPartitions, ver, note)
    out
  }
}
