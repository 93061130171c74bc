package graft

import org.apache.spark.sql.SparkSession

/** Round benchmark: headline queries on SPARK_GRAFT_SF_DIR + the KG
  * pipeline's turns/sec. Prints ONE JSON line (driver contract).
  */
object Bench {
  // the scale-relevant headliners (shuffle/join/window heavy)
  val headline: Seq[String] = Seq(
    "q_nodeset_dedup", "q_nodeset_merge", "q_relset_resolve",
    "q_traverse_1hop", "q_minhash_pairs", "q_simhash_pairs",
    "q_ngram_jaccard", "q_ann_topk", "q_cc_events", "q_conv_stats",
    "q_token_counts", "q_quality")

  val KgTurns: Long = sys.env.getOrElse("SPARK_GRAFT_KG_TURNS", "200000").toLong

  def timed[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Transcripts input for the KG-pipeline timing, materialized ONCE as
    * parquet outside the timed region: the north rule's job is "the
    * pipeline over a transcripts table", so the measured region starts at
    * the table scan (same protocol as ScalingBench). Corpus synthesis is
    * scaffolding, not pipeline work.
    */
  def kgInput(spark: SparkSession): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-bench-kg-input-$KgTurns"
    // mode("overwrite"), not "ignore": a crashed prior write leaves the
    // directory WITHOUT _SUCCESS, and an ignore-mode write would silently
    // no-op on it — the bench would then measure a partial corpus and
    // report wrong throughput. Overwrite makes a stale partial dir
    // unreusable by construction.
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS")))
      kg.TranscriptGen.turns(spark, KgTurns, spark.sparkContext.defaultParallelism * 2)
        .toDF().write.mode("overwrite").parquet(dir)
    dir
  }

  def runAll(spark: SparkSession, sfDir: String): (Map[String, Double], Double) = {
    val qTimes = headline.map { name =>
      val fn = SparkEntry.queries(name)
      name -> timed(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    }.toMap
    // KG pipeline throughput: scan + extract + canonicalize + join, noop
    // sink, recompute layout (persistRaw=false — the measured-best shape,
    // see ScalingBench "full")
    val input = kgInput(spark)
    val kgSec = timed {
      kg.Pipeline.triplesInMemory(spark.read.parquet(input), persistRaw = false)
        .write.format("noop").mode("overwrite").save()
    }
    (qTimes, kgSec)
  }

  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing sizes partitions by BYTES; merge/window stages here
      // are CPU-dense per byte (small synthetic rows), and the default floor
      // let AQE collapse them to 1-2 partitions (3 s chain → 32 s, measured).
      // A 64k floor keeps parallelism-first sizing in charge; at production
      // byte volumes partitions sit far above any floor, so this is inert.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      // Scans here are CPU-dense per byte (regex extraction over text, small
      // synthetic rows), so size SPLITS for wave balance, not byte volume:
      // the 128m default packs this bench's inputs into <=2 waves at 32
      // cores and one straggler idles the machine. At production byte
      // volumes this knob would be tuned the other way (larger, to bound
      // task count) — split sizing follows per-byte CPU density.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = session(cpus)
    // entry smoke first (flagship path)
    val entryRows = SparkEntry.entry(spark).count()
    require(entryRows > 0, "entry produced no rows")
    // warm-up: JIT + parquet footer caches, then measured runs
    runAll(spark, sfDir)
    // drop warm-up persists: operators that pin their (small) results would
    // otherwise be cache-HIT by the measured run's identical logical plans
    spark.sharedState.cacheManager.clearCache()
    // TWO measured passes, per-query MIN: this host has documented
    // multi-second transient slow phases (BENCH/BASELINE.md §5); a single
    // pass rolls the dice on every query, min-of-2 only on the whole run
    val (q1, kg1) = runAll(spark, sfDir)
    spark.sharedState.cacheManager.clearCache()
    val (q2, kg2) = runAll(spark, sfDir)
    val qTimes = q1.map { case (k, v) => k -> math.min(v, q2(k)) }
    val kgSec = math.min(kg1, kg2)
    val total = qTimes.values.sum + kgSec
    val kgThroughput = KgTurns / kgSec
    val qs = (qTimes + ("kg_pipeline" -> kgSec))
      .toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
      s""""kg_turns_per_sec":${f"$kgThroughput%.0f"},"kg_turns":$KgTurns,"cpus":"$cpus","sf":"$sfDir"}""")
    spark.stop()
  }
}
