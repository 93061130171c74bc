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

  test("PNG/WAV header codec round-trips: parse(encode(params)) == params") {
    val png = Multimodal.parseHeader(1L, Multimodal.pngHeaderBytes(640, 480))
    assert(png.format == "png" && png.width.contains(640) && png.height.contains(480))
    assert(png.sample_rate.isEmpty && png.channels.isEmpty)
    val wav = Multimodal.parseHeader(2L, Multimodal.wavHeaderBytes(44100, 2))
    assert(wav.format == "wav" && wav.sample_rate.contains(44100) && wav.channels.contains(2))
    assert(wav.width.isEmpty && wav.height.isEmpty)
  }

  test("header parsing degrades gracefully on malformed payloads") {
    assert(Multimodal.parseHeader(1L, null).format == "unknown")
    assert(Multimodal.parseHeader(2L, Array.empty[Byte]).format == "unknown")
    assert(Multimodal.parseHeader(3L, "not a media file at all".getBytes).format == "unknown")
    // truncated PNG: signature only, no IHDR
    assert(Multimodal.parseHeader(4L,
      Multimodal.pngHeaderBytes(1, 1).take(10)).format == "unknown")
  }

  test("JPEG header codec round-trips through the marker stream") {
    val j = Multimodal.parseHeader(1L, Multimodal.jpegHeaderBytes(1920, 1080))
    assert(j.format == "jpeg" && j.width.contains(1920) && j.height.contains(1080))
    assert(j.sample_rate.isEmpty && j.channels.isEmpty)
    // SOI without any SOF segment degrades, not crashes
    assert(Multimodal.parseHeader(2L,
      Multimodal.jpegHeaderBytes(8, 8).take(6)).format == "unknown")
    // truncated mid-SOF degrades too
    assert(Multimodal.parseHeader(3L,
      Multimodal.jpegHeaderBytes(8, 8).dropRight(12)).format == "unknown")
  }

  test("PNG pixel codec round-trips grey/RGB/RGBA through all five filters") {
    for (ch <- Seq(1, 3, 4)) {
      val w = 13; val h = 11 // h > 5 → every filter type 0-4 appears
      val px = Array.tabulate(w * h * ch)(i => ((i * 37 + ch * 101) % 256).toByte)
      val img = Multimodal.PngImage(w, h, ch, px)
      val decoded = Multimodal.decodePng(Multimodal.pngBytes(img))
      assert(decoded.isDefined, s"channels=$ch failed to decode")
      val d = decoded.get
      assert(d.width == w && d.height == h && d.channels == ch)
      assert(d.pixels.sameElements(px), s"channels=$ch pixel mismatch")
    }
  }

  test("PNG decode degrades on corrupt, truncated, or unsupported bytes") {
    val good = Multimodal.pngBytes(Multimodal.PngImage(4, 4, 3,
      Array.tabulate(48)(_.toByte)))
    assert(Multimodal.decodePng(good).isDefined)
    // flipped byte inside IDAT → CRC mismatch → None, not garbage pixels
    val corrupt = good.clone(); corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5A).toByte
    assert(Multimodal.decodePng(corrupt).isEmpty)
    assert(Multimodal.decodePng(good.dropRight(8)).isEmpty)    // truncated
    assert(Multimodal.decodePng(Array[Byte](1, 2, 3)).isEmpty) // not a PNG
    assert(Multimodal.decodePng(null).isEmpty)
    // header-only PNG (CRC zeroed, no IDAT) parses as header but not pixels
    assert(Multimodal.decodePng(Multimodal.pngHeaderBytes(8, 8)).isEmpty)
  }

  test("distributed pixel decode matches the closed-form pixel formula") {
    val media = Multimodal.syntheticPngMedia(spark, 30)
    val out = Multimodal.decodePixels(media).collect()
    assert(out.length == 30)
    out.foreach { d =>
      val id = d.media_id
      assert(d.width == 8 + (id % 9).toInt && d.height == 8 + (id % 7).toInt && d.channels == 3)
      var i = 0
      while (i < d.pixels.length) {
        val c = i % 3; val x = (i / 3) % d.width; val y = i / (3 * d.width)
        assert(d.pixels(i) == ((3L * x + 5L * y + 7L * id + 11L * c) % 256).toInt,
          s"id=$id x=$x y=$y c=$c")
        i += 1
      }
    }
  }

  test("WAV sample codec round-trips mono and stereo PCM16, incl. extremes") {
    for (nch <- Seq(1, 2)) {
      val samples = Array.tabulate(40 * nch)(i =>
        ((i * 1733 - 20000) % 32768).toShort) ++
        Array[Short](Short.MinValue, Short.MaxValue)
      val aligned = samples.take(samples.length - samples.length % nch)
      val audio = Multimodal.WavAudio(16000, nch, aligned)
      val decoded = Multimodal.decodeWav(Multimodal.wavBytes(audio))
      assert(decoded.isDefined, s"channels=$nch failed to decode")
      val d = decoded.get
      assert(d.sampleRate == 16000 && d.channels == nch)
      assert(d.samples.sameElements(aligned), s"channels=$nch sample mismatch")
    }
    // odd-length ancillary chunk: the word-alignment pad must be skipped
    val withExtra = Multimodal.wavBytes(
      Multimodal.WavAudio(8000, 1, Array[Short](1, -2, 3)),
      Seq(("cue ", Array[Byte](9, 9, 9)), ("LIST", Array[Byte](1, 2, 3, 4))))
    assert(Multimodal.decodeWav(withExtra).exists(_.samples.sameElements(
      Array[Short](1, -2, 3))))
  }

  test("WAV decode degrades on corrupt, truncated, or unsupported bytes") {
    val good = Multimodal.wavBytes(Multimodal.WavAudio(8000, 1,
      Array.tabulate(10)(_.toShort)))
    assert(Multimodal.decodeWav(good).isDefined)
    assert(Multimodal.decodeWav(good.dropRight(3)).isEmpty)     // truncated data
    assert(Multimodal.decodeWav(Array[Byte](1, 2, 3)).isEmpty)  // not RIFF
    assert(Multimodal.decodeWav(null).isEmpty)
    // non-PCM format code (e.g. 3 = IEEE float) degrades
    val floatFmt = good.clone(); floatFmt(20) = 3
    assert(Multimodal.decodeWav(floatFmt).isEmpty)
    // 8-bit depth degrades (only PCM16 supported)
    val bits8 = good.clone(); bits8(34) = 8
    assert(Multimodal.decodeWav(bits8).isEmpty)
    // the legacy header-only builder still decodes as valid empty audio
    assert(Multimodal.decodeWav(Multimodal.wavHeaderBytes(8000, 1))
      .exists(_.samples.isEmpty))
  }

  test("distributed sample decode matches the closed-form sample formula") {
    val media = Multimodal.syntheticWavMedia(spark, 30)
    val out = Multimodal.decodeSamples(media).collect()
    assert(out.length == 30)
    out.foreach { d =>
      val id = d.media_id
      val nch = 1 + (id % 2).toInt
      assert(d.sample_rate == 8000 + (id % 3).toInt * 4000 && d.channels == nch)
      assert(d.samples.length == (50 + (id % 50).toInt) * nch)
      var i = 0
      while (i < d.samples.length) {
        val f = i / nch; val c = i % nch
        assert(d.samples(i) == ((13L * f + 7L * id + 17L * c) % 4001).toInt - 2000,
          s"id=$id f=$f c=$c")
        i += 1
      }
    }
  }

  test("distributed header parse recovers every generated parameter") {
    val media = Multimodal.syntheticEncodedMedia(spark, 100)
    val parsed = Multimodal.parseHeaders(media).collect()
    assert(parsed.length == 100)
    parsed.foreach { p =>
      (p.media_id % 3) match {
        case 0 =>
          assert(p.format == "png")
          assert(p.width.contains(16 + (p.media_id % 64).toInt), p.toString)
          assert(p.height.contains(16 + (p.media_id % 48).toInt), p.toString)
        case 1 =>
          assert(p.format == "wav")
          assert(p.sample_rate.contains(8000 + (p.media_id % 4).toInt * 8000), p.toString)
          assert(p.channels.contains(1 + ((p.media_id / 2) % 2).toInt), p.toString)
        case _ =>
          assert(p.format == "jpeg")
          assert(p.width.contains(16 + (p.media_id % 96).toInt), p.toString)
          assert(p.height.contains(16 + (p.media_id % 80).toInt), p.toString)
      }
    }
  }

  test("resizeNearest: floor index mapping up and down, channels preserved") {
    // 2x2 RGB: pixel value encodes (x, y, c) as 100x + 10y + c
    val px = (for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3)
      yield 100 * x + 10 * y + c).toArray
    val src = Multimodal.DecodedPixels(1L, 2, 2, 3, px)
    val up = Multimodal.resizeNearest(src, 4, 4)
    assert(up.width === 4 && up.height === 4 && up.pixels.length === 48)
    // each source pixel replicates into a 2x2 block: (3,3) ← src (1,1)
    assert(up.pixels((3 * 4 + 3) * 3 + 2) === 100 + 10 + 2)
    assert(up.pixels(0) === 0 && up.pixels((1 * 4 + 1) * 3) === 0) // block of (0,0)
    val down = Multimodal.resizeNearest(up, 2, 2)
    assert(down.pixels.toSeq === src.pixels.toSeq) // exact round-trip at 2x
  }

  test("decimateFrames keeps every n-th frame intact and divides the rate") {
    // stereo, 5 frames: sample (f, c) = 10f + c
    val smp = (for (f <- 0 until 5; c <- 0 until 2) yield 10 * f + c).toArray
    val s = Multimodal.DecodedSamples(1L, 8000, 2, smp)
    val d = Multimodal.decimateFrames(s, 2)
    assert(d.sample_rate === 4000 && d.channels === 2)
    assert(d.samples.toSeq === Seq(0, 1, 20, 21, 40, 41)) // frames 0, 2, 4
    val identity = Multimodal.decimateFrames(s, 1)
    assert(identity.samples.toSeq === smp.toSeq && identity.sample_rate === 8000)
  }
}
