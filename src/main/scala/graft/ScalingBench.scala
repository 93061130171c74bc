package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule: the same KG-construction
  * job at two parallelism levels (local[8] vs local[32] — the sandbox proxy
  * for N vs 4N executors; no real cluster available here). Reports
  * turns/sec at both and efficiency = (T_low / T_high) / (high/low).
  *
  * The north rule's job is "the pipeline over an Iceberg transcripts
  * table", so the measured region starts at the TABLE SCAN: the input is
  * materialized ONCE as parquet (256 files — enough splits for full
  * parallelism at either level) outside the timed region, and both levels
  * read the SAME files ("same input" taken literally; the page cache is
  * equally warm for both). Corpus synthesis is test scaffolding, not
  * pipeline work — timing it would fold the case-class encoder's
  * allocation profile into the scaling number. The `gen` phase still
  * measures generation itself.
  *
  * Protocol per level: fresh SparkSession, warm-up run (JIT + codegen
  * caches) at 1/10 input, then the measured run; sessions are torn down
  * between levels so thread pools and shuffle state don't leak across.
  *
  * `sbt "runMain graft.ScalingBench [turns] [low,high]"`
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val turns = if (args.nonEmpty) args(0).toLong else 1000000L
    val levels = (if (args.length > 1) args(1) else "8,32").split(",").map(_.toInt)

    val phase = if (args.length > 2) args(2) else "full"

    def deleteRec(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }

    // 256 files (not 64): the scan must give the WIDE level enough waves
    // to balance its tail — 64 splits at 32 cores is 2 waves, and one
    // straggler in the last wave idles 31 cores. 256 → 8 waves at 32c,
    // 32 at 8c. (Bench.session caps maxPartitionBytes at 16m so Spark's
    // small-file packing doesn't re-merge these into 2-wave splits.)
    val InputFiles = 256
    def inputDir(n: Long): String =
      s"${System.getProperty("java.io.tmpdir")}/graft-scaling-input-$n-$InputFiles"

    /** Materialize the transcripts table once (reused across reps/levels).
      * Runs BEFORE any measured session exists — local-mode getOrCreate
      * would otherwise hand the measured job this session's thread pool.
      */
    def ensureInputs(): Unit = {
      val missing = Seq(turns / 10, turns).map(inputDir)
        .filterNot(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d, "_SUCCESS")))
      if (missing.nonEmpty) {
        val spark = Bench.session("32")
        // overwrite (see Bench.kgInput): a _SUCCESS-less dir is a crashed
        // partial write; ignore-mode would silently reuse it and the
        // scaling numbers would be measured over a truncated corpus
        try missing.foreach { d =>
          val n = if (d == inputDir(turns)) turns else turns / 10
          kg.TranscriptGen.turns(spark, n, InputFiles).toDF()
            .write.mode("overwrite").parquet(d)
        } finally spark.stop()
      }
    }
    if (phase != "gen" && phase != "cpubound") ensureInputs()

    def job(spark: org.apache.spark.sql.SparkSession, n: Long, cpus: Int): Unit = {
      lazy val turnsDf =
        if (phase == "gen") kg.TranscriptGen.turns(spark, n, cpus * 2).toDF()
        else spark.read.parquet(inputDir(n))
      var tmpPin: Option[java.nio.file.Path] = None
      val out = phase match {
        case "gen"       => turnsDf
        case "cpubound"  =>
          // pure-ALU control: xxhash chains over a range, zero memory
          // traffic — measures the HOST's parallel ceiling (all-core
          // frequency + scheduler), the upper bound any real job can hit
          import org.apache.spark.sql.functions._
          spark.range(0L, n * 400L, 1L, cpus * 8)
            .select(xxhash64(xxhash64(xxhash64(col("id")))).as("h"))
            .agg(max("h")) // max, not sum: ANSI mode faults on long overflow
        case "extract"   => kg.Extract.triplesRaw(turnsDf)
        case "nopersist" => kg.Pipeline.triplesInMemory(turnsDf, persistRaw = false)
        case "mempin"    => kg.Pipeline.triplesInMemory(turnsDf) // columnar memory cache
        case "ckpt" =>
          // variant: raw pinned via localCheckpoint (no columnar compression)
          val raw = kg.Extract.triplesRaw(turnsDf).localCheckpoint(false)
          val surfaces = kg.Extract.surfaces(raw)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val pairs = kg.Lsh.candidatePairs(surfaces.select("norm").distinct(), kg.Pipeline.JaccardThreshold)
          val clustered = kg.ConnectedComponents.runOnStrings(pairs, "a", "b")
          val cm = org.apache.spark.sql.functions.broadcast(
            surfaces.join(clustered, surfaces("norm") === clustered("key"), "left_outer")
              .select(org.apache.spark.sql.functions.col("surface"),
                org.apache.spark.sql.functions.coalesce(
                  org.apache.spark.sql.functions.col("canonical"),
                  org.apache.spark.sql.functions.col("norm")).as("canonical")))
          raw
            .join(cm.withColumnRenamed("surface", "subj_surface").withColumnRenamed("canonical", "subj"), Seq("subj_surface"))
            .join(cm.withColumnRenamed("surface", "obj_surface").withColumnRenamed("canonical", "obj"), Seq("obj_surface"))
        case "pqpin" =>
          // raw triples pinned as ONE parquet snapshot (the staged-pipeline
          // layout). Was the best strategy while extraction was expensive;
          // the native one-pass extractor made RE-extraction cheaper than
          // materializing (measured 96M/32c: 50 s vs 74 s), so this is now
          // the non-default variant.
          val dir = java.nio.file.Files.createTempDirectory("graft-scaling-pq")
          tmpPin = Some(dir)
          kg.Pipeline.triplesInMemory(turnsDf, persistRaw = false,
            parquetPin = Some(dir.toString))
        case _ =>
          // default "full" = recompute layout: extraction runs once for
          // surface mining and once fused into the final broadcast join —
          // scan -> regex -> probe -> output, no intermediate materialized
          // state. Two passes over the input is the floor (the canonical
          // map must exist before the join), and extraction scales at the
          // host's own ALU ceiling (see `cpubound`).
          kg.Pipeline.triplesInMemory(turnsDf, persistRaw = false)
      }
      try out.write.format("noop").mode("overwrite").save()
      finally tmpPin.foreach(deleteRec)
    }

    def measure(cpus: Int): Double = {
      val spark = Bench.session(cpus.toString)
      try {
        job(spark, turns / 10, cpus) // warm-up at 1/10 scale
        // drop warm-up persists: measured run must not fight evicted-cache
        // churn from lineages it will never reuse
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        job(spark, turns, cpus)
        (System.nanoTime() - t0) / 1e9
      } finally spark.stop()
    }

    if (phase == "phases") {
      // diagnostic: per-phase wall clock at each level, mirroring the
      // DEFAULT (recompute) layout so the split sums to the measured total
      for (cpus <- levels) {
        val spark = Bench.session(cpus.toString)
        import org.apache.spark.sql.functions._
        def tm(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          println(f"[phases] cpus=$cpus $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        val turnsDf = spark.read.parquet(inputDir(turns))
        val raw = kg.Extract.triplesRaw(turnsDf)
        val surfaces = kg.Extract.surfaces(raw)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        tm("surface_mine") { surfaces.write.format("noop").mode("overwrite").save() }
        val clustered = kg.Canonicalize.canonicalMap(
          surfaces.select("norm").distinct(), kg.Pipeline.JaccardThreshold)
          .withColumnRenamed("norm", "cnorm")
        val cm = surfaces.join(clustered, surfaces("norm") === clustered("cnorm"), "left_outer")
          .select(col("surface"),
            coalesce(col("canonical"), col("norm")).as("canonical"),
            coalesce(col("link_score"), lit(1.0)).as("link_score"))
        var cmB: org.apache.spark.sql.DataFrame = null
        tm("canonical_map") { cmB = broadcast(cm); cmB.count() }
        tm("extract+join") {
          kg.Pipeline.joinCanonical(raw, cmB)
            .write.format("noop").mode("overwrite").save()
        }
        spark.stop()
      }
      return
    }

    if (levels.length == 1) {
      // single-level mode: measure in THIS JVM only (caller pairs up runs
      // across separate JVMs to dodge shared-heap interference)
      import scala.jdk.CollectionConverters._
      def gcMs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
      val gc0 = gcMs
      val t = measure(levels(0))
      println(s"""{"metric":"scaling_single","turns":$turns,"cpus":${levels(0)},""" +
        s""""sec":${f"$t%.2f"},"turns_per_sec":${f"${turns / t}%.0f"},"gc_ms":${gcMs - gc0}}""")
      return
    }
    require(levels.length == 2 && levels(1) > levels(0))
    val tLow = measure(levels(0))
    val tHigh = measure(levels(1))
    val speedup = tLow / tHigh
    val efficiency = speedup / (levels(1).toDouble / levels(0))
    println(
      s"""{"metric":"scaling","turns":$turns,""" +
      s""""low_cpus":${levels(0)},"high_cpus":${levels(1)},""" +
      s""""low_sec":${f"$tLow%.2f"},"high_sec":${f"$tHigh%.2f"},""" +
      s""""low_turns_per_sec":${f"${turns / tLow}%.0f"},""" +
      s""""high_turns_per_sec":${f"${turns / tHigh}%.0f"},""" +
      s""""speedup":${f"$speedup%.3f"},"efficiency":${f"$efficiency%.3f"}}""")
  }
}
