package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode/feature steps are
  * per-partition batch transforms.
  *
  * The actual codec work (JPEG decode, resampling, frame sampling) requires
  * native libraries that are NOT in this container — those kernels are
  * STUBBED with a deterministic fake (clearly marked below). Everything
  * Spark-side is real and tested: the schema contract, the partitioning
  * (payloads are large → size-based repartition before the decode stage so
  * one task doesn't get 10 GB of video), the batched per-partition execution
  * shape (the Scala twin of `mapInPandas`: `mapPartitions` over an iterator,
  * amortizing per-batch model/codec setup), and the output feature schema.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),        // image | audio | video
    StructField("payload", BinaryType, nullable = true),      // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true)
    )), nullable = true)
  ))

  final case class MediaFeature(media_id: Long, kind: String, n_bytes: Int,
                                checksum: Long, feature: Array[Float])

  /** Deterministic synthetic media table (payload = seeded bytes) — stands
    * in for a real binary-file source (`spark.read.format("binaryFile")` in
    * production).
    */
  def syntheticMedia(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("kind"),
      // payload: deterministic pseudo-bytes, length 64 + id%192
      expr("cast(concat_ws('', transform(sequence(0, cast(64 + id % 192 as int)), " +
        "j -> chr(32 + pmod(xxhash64(id, j), 90)))) as binary)").as("payload"),
      struct(
        lit(640).as("width"), lit(480).as("height"),
        lit(16000).as("sample_rate"), (col("id") % 10000).as("duration_ms"),
        lit("synthetic").as("codec")).as("meta"))
  }

  /** Size-aware repartition before the decode stage: ASSIGN rows to
    * partitions by cumulative payload bytes, so a partition holds
    * ~targetBytes of media regardless of row-size skew — the thing that
    * matters when one video is 10,000× one image.
    *
    * Shape: (1) per-input-partition byte subtotals — one tiny row per
    * partition, collected to the driver for the prefix offsets (the same
    * O(numPartitions) driver state every range partitioner keeps);
    * (2) per-row running byte sum via a window partitioned by the INPUT
    * partition id (never a global window) plus the prefix offset;
    * (3) bucket = floor(start_offset / targetBytes), range-partitioned so
    * each output partition is one contiguous byte bucket. Max partition
    * bytes <= targetBytes + the largest single payload.
    */
  def repartitionBySize(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(targetBytesPerPartition > 0, "targetBytesPerPartition must be positive")
    val withPid = media
      .withColumn("_pid", spark_partition_id())
      .withColumn("_ord", monotonically_increasing_id())
      .withColumn("_bytes", coalesce(length(col("payload")).cast("long"), lit(0L)))
    val subtotals = withPid.groupBy("_pid").agg(sum(col("_bytes")).as("_psum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = subtotals.scanLeft((0, 0L)) { case ((_, acc), (pid, b)) => (pid, acc + b) }
    val offsetDf = subtotals.map(_._1).zip(offsets.map(_._2)).toSeq
      .toDF("_pid", "_offset")
    val totalBytes = subtotals.map(_._2).sum
    val nBuckets = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerPartition).toInt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy("_ord")
    withPid.join(broadcast(offsetDf), Seq("_pid"))
      // cumulative bytes BEFORE this row = running sum minus own bytes
      .withColumn("_cum", sum(col("_bytes")).over(w) + col("_offset") - col("_bytes"))
      .withColumn("_bucket", floor(col("_cum") / targetBytesPerPartition))
      .repartitionByRange(nBuckets, col("_bucket"), col("_ord"))
      .drop("_pid", "_ord", "_bytes", "_offset", "_cum", "_bucket")
  }

  /** ===== STUBBED KERNEL =====
    * Real implementation decodes payload with an image/audio codec and runs
    * a feature extractor. This container has no codec libs, so the kernel
    * is a deterministic fake: checksum + an 8-dim feature derived from the
    * bytes. The mapPartitions shape (batch iterator, per-partition setup
    * happening ONCE before the loop) is the real contract.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup: in production, load codec + model HERE (once)
        val codecHandle = new Object // stub
        it.map { case (id, kind, bytes) =>
          val payload = if (bytes == null) Array.empty[Byte] else bytes
          var cs = 1125899906842597L
          var i = 0
          while (i < payload.length) { cs = cs * 31 + payload(i); i += 1 }
          val feat = Array.tabulate(8)(j =>
            ((cs >>> (j * 8)) & 0xFF).toFloat / 255f)
          MediaFeature(id, kind, payload.length, cs, feat)
        }
      }
  }

  /** Frame-sampling plan for video rows: which frame offsets a decoder would
    * pull, as real Spark columns (the decode itself is the stub above).
    */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))).as("frame_ms"))

  // ===== REAL HEADER CODEC (pure JVM, no codec libraries) =====
  // Container-format headers are plain bytes; constructing and parsing them
  // needs no native libs, so THIS kernel is not a stub: it builds valid PNG
  // signatures + IHDR chunks and WAV RIFF/fmt chunks, and parses either
  // back by magic-byte sniffing. Pixel/sample DECODING stays stubbed above.

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
      ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] = be32(v).reverse
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte)

  private val PngSig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n').map(_.toByte)

  /** A valid PNG signature + IHDR chunk (CRC zeroed — parsers that verify
    * CRCs would reject it; header READING does not need the CRC).
    */
  def pngHeaderBytes(width: Int, height: Int): Array[Byte] =
    PngSig ++ be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(width) ++ be32(height) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0)

  /** A valid WAV RIFF header + fmt chunk (PCM16) + empty data chunk. */
  def wavHeaderBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    val byteRate = sampleRate * channels * 2
    "RIFF".getBytes("US-ASCII") ++ le32(36) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(byteRate) ++ le16(channels * 2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(0)
  }

  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** A valid JPEG prefix: SOI, a JFIF APP0 segment, and a baseline SOF0
    * frame header carrying the dimensions (3 components, 8-bit) — the
    * segment a real dimension sniffer walks the marker stream to find.
    * No scan data: header READING does not need entropy-coded content.
    */
  def jpegHeaderBytes(width: Int, height: Int): Array[Byte] = {
    val app0 = Array[Byte](0xFF.toByte, 0xE0.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
      be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val sof0 = Array[Byte](0xFF.toByte, 0xC0.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(height) ++ be16(width) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    Array[Byte](0xFF.toByte, 0xD8.toByte) ++ app0 ++ sof0
  }

  final case class ParsedMedia(media_id: Long, format: String,
                               width: Option[Int], height: Option[Int],
                               sample_rate: Option[Int], channels: Option[Int])

  private def readBe32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def readBe16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def readLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def readLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  /** Sniff + parse one payload. Unknown/truncated bytes → format "unknown",
    * all fields None — malformed media must degrade, not kill the job.
    */
  def parseHeader(id: Long, payload: Array[Byte]): ParsedMedia = {
    val b = if (payload == null) Array.empty[Byte] else payload
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        new String(b.slice(12, 16), "US-ASCII") == "IHDR")
      ParsedMedia(id, "png", Some(readBe32(b, 16)), Some(readBe32(b, 20)), None, None)
    else if (b.length >= 36 && new String(b.take(4), "US-ASCII") == "RIFF" &&
        new String(b.slice(8, 12), "US-ASCII") == "WAVE" &&
        new String(b.slice(12, 16), "US-ASCII") == "fmt ")
      ParsedMedia(id, "wav", None, None,
        Some(readLe32(b, 24)), Some(readLe16(b, 22)))
    else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
      parseJpegSof(id, b)
    else ParsedMedia(id, "unknown", None, None, None, None)
  }

  /** Walk the JPEG marker stream from SOI to the first SOF0-SOF3 frame
    * header (baseline/extended/progressive/lossless) and read height/width.
    * Standalone markers (TEM, RSTn) have no length field; everything else
    * is skipped by its big-endian segment length. Truncated or SOF-less
    * streams degrade to "unknown".
    */
  private def parseJpegSof(id: Long, b: Array[Byte]): ParsedMedia = {
    var i = 2
    while (i + 3 < b.length && (b(i) & 0xFF) == 0xFF) {
      val m = b(i + 1) & 0xFF
      if (m >= 0xC0 && m <= 0xC3) {
        if (i + 8 < b.length)
          return ParsedMedia(id, "jpeg",
            Some(readBe16(b, i + 7)), Some(readBe16(b, i + 5)), None, None)
        else return ParsedMedia(id, "unknown", None, None, None, None)
      }
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) i += 2
      else i += 2 + readBe16(b, i + 2)
    }
    ParsedMedia(id, "unknown", None, None, None, None)
  }

  /** Deterministic synthetic media with REAL encoded headers: ids cycle
    * PNG / WAV / JPEG (params derived from the id). Stands in for
    * `spark.read.format("binaryFile")` in production.
    */
  def syntheticEncodedMedia(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val payload = (id % 3) match {
        case 0 => pngHeaderBytes(16 + (id % 64).toInt, 16 + (id % 48).toInt)
        case 1 => wavHeaderBytes(8000 + (id % 4).toInt * 8000, 1 + ((id / 2) % 2).toInt)
        case _ => jpegHeaderBytes(16 + (id % 96).toInt, 16 + (id % 80).toInt)
      }
      (id, payload)
    }.toDF("media_id", "payload")
  }

  /** Parse the header of every payload — the same mapPartitions batch shape
    * as [[extractFeatures]], but with the real codec above.
    */
  def parseHeaders(media: DataFrame): Dataset[ParsedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseHeader(id, bytes) })
  }
}
