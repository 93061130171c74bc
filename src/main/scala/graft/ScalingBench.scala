package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule: the same KG-construction
  * job at two parallelism levels (local[8] vs local[32] — the sandbox proxy
  * for N vs 4N executors; no real cluster available here). Reports
  * turns/sec at both and efficiency = (T_low / T_high) / (high/low).
  *
  * Protocol per level: fresh SparkSession, warm-up run (JIT + codegen
  * caches), then the measured run; sessions are torn down between levels so
  * thread pools and shuffle state don't leak across.
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

    def job(spark: org.apache.spark.sql.SparkSession, n: Long, cpus: Int): Unit = {
      val turnsDf = kg.TranscriptGen.turns(spark, n, cpus * 2).toDF()
      var tmpPin: Option[java.nio.file.Path] = None
      val out = phase match {
        case "gen"       => turnsDf
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
        case _ =>
          // default "full" = the staged-pipeline layout: raw triples pinned
          // as ONE parquet snapshot (dictionary-encoded strings; the
          // surface-mining scan column-prunes to the two surface columns).
          // Measured best of the four pinning strategies at 24M/48M turns —
          // see BENCH/BASELINE.md §3.
          val dir = java.nio.file.Files.createTempDirectory("graft-scaling-pq")
          tmpPin = Some(dir)
          kg.Pipeline.triplesInMemory(turnsDf, persistRaw = false,
            parquetPin = Some(dir.toString))
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
      // diagnostic: per-phase wall clock at each level
      for (cpus <- levels) {
        val spark = Bench.session(cpus.toString)
        import org.apache.spark.sql.functions._
        def tm(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          println(f"[phases] cpus=$cpus $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        val turnsDf = kg.TranscriptGen.turns(spark, turns, cpus * 2).toDF()
        val raw = kg.Extract.triplesRaw(turnsDf)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        tm("extract+persist") { raw.write.format("noop").mode("overwrite").save() }
        val surfaces = kg.Extract.surfaces(raw)
        val pairs = kg.Lsh.candidatePairs(surfaces.select("norm").distinct(), kg.Pipeline.JaccardThreshold)
        tm("lsh_pairs") { pairs.write.format("noop").mode("overwrite").save() }
        val clustered = kg.ConnectedComponents.runOnStrings(pairs, "a", "b")
        tm("cc") { clustered.write.format("noop").mode("overwrite").save() }
        val cm = surfaces.join(clustered, surfaces("norm") === clustered("key"), "left_outer")
          .select(col("surface"), coalesce(col("canonical"), col("norm")).as("canonical"))
        val cmB = broadcast(cm)
        val out = raw
          .join(cmB.withColumnRenamed("surface", "subj_surface").withColumnRenamed("canonical", "subj"), Seq("subj_surface"))
          .join(cmB.withColumnRenamed("surface", "obj_surface").withColumnRenamed("canonical", "obj"), Seq("obj_surface"))
        tm("final_join") { out.write.format("noop").mode("overwrite").save() }
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
