package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import graft.functions.expressions.{BlobStats, ByteHistogram, FrameFingerprints}

/** Decoded-blob record produced by the batch decode path — the typed
  * schema a real image/audio codec would emit. */
final case class DecodedBlob(
    id: Long,
    format: String,
    width: Int,
    height: Int,
    channels: Int,
    byte_len: Long)

/** Decoded-IMAGE record from the real codec path ([[Multimodal.decodeImages]]):
  * pixel-level truth, not just header fields — `px_sum` is the exact
  * integer sum of every sample in every band, so an oracle that knows
  * the image contents can verify the decode bit-for-bit. */
final case class DecodedImage(
    id: Long,
    format: String,
    width: Int,
    height: Int,
    channels: Int,
    px_sum: Long)

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (builder brief — beyond the reference's scope; acowley/Frames
  * has no binary cells).
  *
  * Scale design:
  *  - Metadata / fingerprint / feature kernels are native expressions
  *    ([[graft.functions.expressions.BinaryUtil]]) evaluated INSIDE the
  *    scan's whole-stage codegen — the blob bytes never move: every
  *    output is a small scalar/array, and all downstream ops (dedup,
  *    joins, sampling decisions) key on those outputs, not the bytes.
  *  - The only unavoidable blob movement is initial ingest; use
  *    [[repartitionBySize]] so partitions are balanced by BYTES (blob
  *    sizes are heavy-tailed — count-balanced partitions stall on the
  *    task holding the big blobs).
  *  - CODEC STUB: this container has no image/audio libraries, so
  *    [[stubCodec]] fabricates deterministic dimensions from the blob's
  *    own bytes. The Spark-side contract around it — expression slot,
  *    typed output schema, iterator-to-iterator batching, per-partition
  *    codec initialization — is the real, tested plumbing; swap
  *    `stubCodec` for a JNI/JavaCV codec without touching the plan.
  */
object Multimodal {

  /** Magic-number format sniff over the blob's leading bytes — a codegen'd
    * `CASE` chain, no UDF. Unknown prefixes classify as `"raw"`. */
  def sniffFormat(blob: Column): Column = {
    def magic(bytes: Int*): Column =
      lit(bytes.map(_.toByte).toArray)
    when(substring(blob, 1, 8) === magic(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), "png")
      .when(substring(blob, 1, 3) === magic(0xff, 0xd8, 0xff), "jpeg")
      .when(substring(blob, 1, 4) === magic(0x47, 0x49, 0x46, 0x38), "gif")
      .when(substring(blob, 1, 2) === magic(0x42, 0x4d), "bmp")
      .when(substring(blob, 1, 4) === magic(0x52, 0x49, 0x46, 0x46), "riff") // wav/avi container
      .when(substring(blob, 1, 3) === magic(0x49, 0x44, 0x33), "mp3")
      .when(substring(blob, 5, 4) === magic(0x66, 0x74, 0x79, 0x70), "mp4")
      .when(substring(blob, 1, 4) === magic(0x25, 0x50, 0x44, 0x46), "pdf")
      .otherwise("raw")
  }

  /** Ingest: attach the typed metadata struct every multimodal pipeline
    * keys on — format, exact size, content digests. One scan, zero
    * shuffle; `md5`/`xxhash64` are Spark built-ins (codegen'd). */
  def ingest(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn(
      "meta",
      struct(
        sniffFormat(col(blobCol)).as("format"),
        length(col(blobCol)).cast("long").as("byte_len"),
        md5(col(blobCol)).as("digest_md5"),
        xxhash64(col(blobCol)).as("fingerprint")))

  /** Per-blob statistics + fixed-width byte histogram — the cheap,
    * always-on feature pass (quality filtering, corruption triage,
    * compression-ratio proxies via entropy). */
  def features(df: DataFrame, idCol: String, blobCol: String, histogramBins: Int = 16): DataFrame =
    df.select(
      col(idCol),
      BlobStats(col(blobCol)).as("stats"),
      ByteHistogram(col(blobCol), histogramBins).as("histogram"))

  /** DECODE STUB — deterministic fake image decode, expression-composed.
    * Dimensions are fabricated from the blob's own fingerprint (stable
    * across runs/partitions); mean intensity is the true byte mean. A real
    * deployment replaces this `struct` with a codec expression or the
    * [[decodeBatch]] path below; every downstream consumer sees the same
    * schema either way. */
  def decodeImageStub(blob: Column): Column = {
    val h = abs(xxhash64(blob))
    struct(
      (lit(16) + pmod(h, lit(113)) * 16).cast("int").as("width"),
      (lit(16) + pmod(shiftright(h, 7), lit(113)) * 16).cast("int").as("height"),
      lit(3).as("channels"),
      BlobStats(blob).getField("mean_byte").as("mean_intensity"))
  }

  /** Resize STUB — metadata transform on a decoded struct: scales the
    * fabricated dimensions, preserving the decode contract (a real
    * implementation would also re-encode pixels). */
  def resizeStub(decoded: Column, factor: Double): Column =
    struct(
      greatest(lit(1), (decoded.getField("width") * factor).cast("int")).as("width"),
      greatest(lit(1), (decoded.getField("height") * factor).cast("int")).as("height"),
      decoded.getField("channels").as("channels"),
      decoded.getField("mean_intensity").as("mean_intensity"))

  /** Frame sampling: `n` evenly spaced `frameBytes`-wide window
    * fingerprints per blob, exploded to one row per frame — the shape a
    * video near-dup or scene-dedup pass consumes. The generate happens in
    * the scan stage; only (id, idx, hash) rows ever shuffle. */
  def frameSample(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      n: Int,
      frameBytes: Int): DataFrame =
    df.select(
      col(idCol),
      posexplode(FrameFingerprints(col(blobCol), frameBytes, n))
        .as(Seq("frame_idx", "frame_hash")))

  /** Blob near-duplicate pairs via shared frame fingerprints: blobs whose
    * sampled windows collide on >= `minShared` hashes — exact copies
    * share all `n`, same-length variants share every window the edit
    * missed (offsets are length-derived, so only equal-length blobs can
    * partially collide; that IS the semantics: copy / re-container / small
    * in-place-edit detection, the video-dedup shape).
    *
    * Plan: fingerprints stay scan-local; only (id, hash) rows shuffle
    * into the equi-join on `frame_hash` — the same bucketed LSH shape as
    * Dedup.minhashPairs, never all-pairs. Pair aggregation counts
    * distinct shared hashes ((id, hash) deduped before the join). */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      n: Int = 8,
      frameBytes: Int = 64,
      minShared: Int = 2): DataFrame = {
    val fr = frameSample(df, idCol, blobCol, n, frameBytes)
      .select(col(idCol), col("frame_hash")).distinct()
    val a = fr.select(col(idCol).as("id_a"), col("frame_hash"))
    val b = fr.select(col(idCol).as("id_b"), col("frame_hash"))
    a.join(b, "frame_hash")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  /** PERSIST the blob frame-fingerprint index — the multimodal member
    * of the persisted-index portfolio (text dedup, IVF/PQ, span, LM):
    * one `(frame_hash, owner id)` row per distinct sampled window,
    * bucketed by the hash, so each daily blob drop probes the index
    * instead of re-fingerprinting the corpus. The blob scan is paid
    * HERE, once; index rows are 16 bytes regardless of blob size. */
  def writeBlobIndex(
      corpus: DataFrame,
      idCol: String,
      blobCol: String,
      table: String,
      n: Int = 8,
      frameBytes: Int = 64,
      numBuckets: Int = 32): Unit =
    Bucketing.writeBucketed(
      frameSample(corpus, idCol, blobCol, n, frameBytes)
        .select(col("frame_hash"), col(idCol).as("__cid")).distinct(),
      table, bucketCols = Seq("frame_hash"), numBuckets = numBuckets)

  /** APPEND a committed blob batch to a persisted [[writeBlobIndex]] —
    * fingerprints are per-blob-local, so append ≡ rebuild
    * unconditionally; only the new rows shuffle (one keyed write),
    * existing index files untouched. Single-writer batch step. */
  def appendBlobIndex(
      table: String,
      newCorpus: DataFrame,
      idCol: String,
      blobCol: String,
      n: Int = 8,
      frameBytes: Int = 64,
      numBuckets: Int = 32): Unit =
    Bucketing.appendBucketed(
      frameSample(newCorpus, idCol, blobCol, n, frameBytes)
        .select(col("frame_hash"), col(idCol).as("__cid")).distinct(),
      table, bucketCols = Seq("frame_hash"), numBuckets = numBuckets)

  /** PROBE a persisted [[writeBlobIndex]] with a batch of new blobs —
    * the shard-vs-corpus incremental face of [[nearDupPairs]] (the m05
    * semantics, asymmetric): each batch blob is `dup` when it shares
    * >= `minShared` sampled windows with some indexed blob (`dup_of` =
    * the corpus id sharing MOST windows, ties to the smaller id) and
    * `novel` otherwise. Per probe, only the batch is fingerprinted;
    * the (hash)-keyed join meets the index in its bucket layout (no
    * index-side exchange), the per-pair tally is batch-bounded, and
    * the argmax is a per-batch-blob WindowGroupLimit. */
  def probeBlobIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      batch: DataFrame,
      idCol: String,
      blobCol: String,
      n: Int = 8,
      frameBytes: Int = 64,
      minShared: Int = 2): DataFrame = {
    val bf = frameSample(batch, idCol, blobCol, n, frameBytes)
      .select(col(idCol).as("__bid"), col("frame_hash")).distinct()
    val shared = bf.join(spark.table(table), Seq("frame_hash"))
      .groupBy(col("__bid"), col("__cid"))
      .agg(count(lit(1)).as("__sh"))
      .filter(col("__sh") >= minShared)
    val best = shared
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__bid"))
          .orderBy(col("__sh").desc, col("__cid").asc)))
      .filter(col("__rn") === 1)
      .select(col("__bid").as(idCol), col("__cid").as("dup_of"),
        col("__sh").as("shared_frames"))
    batch.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol),
        when(col("dup_of").isNotNull, lit("dup"))
          .otherwise(lit("novel")).as("status"),
        col("dup_of"),
        coalesce(col("shared_frames"), lit(0L)).as("shared_frames"))
  }

  /** Batched decode through `mapPartitions` — the Scala analog of the
    * brief's `mapInPandas` plumbing, for codecs that cannot be expressed
    * as Catalyst expressions (native libraries holding per-thread state).
    * Iterator-to-iterator: the codec is initialized once per partition
    * (task), rows stream through without materializing the partition, and
    * Spark's pipelined execution keeps memory flat regardless of blob
    * count. `codec` maps raw bytes to (width, height, channels) —
    * [[stubCodec]] by default in this container. Null blobs (outer joins,
    * permissive ingest) are skipped, matching the null-safe expression
    * kernels. */
  def decodeBatch(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      codec: Array[Byte] => (Int, Int, Int) = stubCodec): Dataset[DecodedBlob] = {
    implicit val enc: Encoder[DecodedBlob] = Encoders.product[DecodedBlob]
    val withFormat = df
      .filter(col(blobCol).isNotNull)
      .select(
        col(idCol).cast("long").as("id"),
        sniffFormat(col(blobCol)).as("format"),
        col(blobCol).as("blob"))
    withFormat.mapPartitions { rows =>
      // per-partition codec init would go here (native lib handle)
      rows.map { r =>
        val blob = r.getAs[Array[Byte]]("blob")
        val (w, h, c) = codec(blob)
        DecodedBlob(r.getLong(0), r.getString(1), w, h, c, blob.length.toLong)
      }
    }
  }

  /** REAL image codec (round 10 — replaces the stub as m04's decode):
    * `javax.imageio` is JDK-built-in (public, zero new dependencies), so
    * PNG/GIF/JPEG/BMP decode needs no native library even in this
    * container. Returns (width, height, bands, exact integer sum of all
    * raster samples); `None` when the bytes are not a decodable image —
    * callers choose drop/fallback ([[stubCodec]] remains the
    * format-agnostic fallback for blobs that are not images at all). */
  def imageCodec(blob: Array[Byte]): Option[(Int, Int, Int, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      if (img == null) None // unrecognized format: ImageIO's null contract
      else {
        val raster = img.getRaster
        val bands = raster.getNumBands
        val w = img.getWidth
        val h = img.getHeight
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        Some((w, h, bands, s))
      }
    } catch {
      // a TRUNCATED file with a valid magic throws (IIOException from the
      // PNG/JPEG readers; some decoders escalate runtime exceptions on
      // malformed chunk tables) — every decode failure is the same
      // curation fact, so the contract is None, never an exception
      case scala.util.control.NonFatal(_) => None
    }

  /** Batched REAL image decode through the same iterator-to-iterator
    * `mapPartitions` slot as [[decodeBatch]] — per-partition init turns
    * off ImageIO's disk cache (the decode must never touch local disk on
    * an executor), then rows stream through the codec without
    * materializing the partition. Undecodable / null blobs are dropped —
    * the curation semantics: a corrupt image exits the pipeline here,
    * with [[features]]'s stats pass the place to triage it. */
  def decodeImages(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      codec: Array[Byte] => Option[(Int, Int, Int, Long)] = imageCodec)
      : Dataset[DecodedImage] = {
    implicit val enc: Encoder[DecodedImage] = Encoders.product[DecodedImage]
    df.filter(col(blobCol).isNotNull)
      .select(
        col(idCol).cast("long").as("id"),
        sniffFormat(col(blobCol)).as("format"),
        col(blobCol).as("blob"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        rows.flatMap { r =>
          codec(r.getAs[Array[Byte]]("blob")).map { case (w, h, c, s) =>
            DecodedImage(r.getLong(0), r.getString(1), w, h, c, s)
          }
        }
      }
  }

  /** Deterministic synthetic PNG — REAL image bytes for fixtures and the
    * m04 oracle gate: a w×h truecolor gradient with w = 1 + (id mod 13),
    * h = 1 + ((id div 13) mod 11) and gray level (id + 7x + 13y) mod 256
    * at pixel (x, y), encoded by the JDK's PNG writer. Every field a
    * decode recovers (dimensions, 3 bands, exact sample sum) is pure
    * arithmetic in `id`, so DuckDB can verify a genuine ImageIO decode
    * without being able to parse PNG itself. */
  def syntheticPng(id: Long): Array[Byte] = syntheticImage(id, "png")

  /** [[syntheticPng]]'s gradient encoded by any JDK `ImageIO` writer —
    * the multi-codec fixture (m08): `png`/`bmp` round-trip every sample
    * exactly (both lossless truecolor, so dims AND the raster sum stay
    * arithmetic in `id`); `jpg` is lossy, so only the METADATA
    * (dimensions, 3 bands) survives as oracle-checkable; `gif`
    * palette-quantizes and decodes to an indexed raster, so only the
    * dimensions survive. */
  def syntheticImage(id: Long, format: String): Array[Byte] = {
    require(id >= 0, s"synthetic image id must be >= 0, got $id")
    val w = (1L + id % 13).toInt
    val h = (1L + (id / 13) % 11).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((id + 7L * x + 13L * y) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format $format")
    bos.toByteArray
  }

  /** Canonical 44-byte-header PCM WAV, deterministic in `id` — the audio
    * counterpart of [[syntheticPng]] (round 12): sample rate, channel
    * count, frame count, and every payload byte are arithmetic in `id`,
    * so DuckDB can verify a genuine header PARSE ([[wavMeta]]) without
    * being able to read RIFF itself. 16-bit PCM; payload byte i is
    * (id + 3·i) mod 256. */
  def syntheticWav(id: Long): Array[Byte] = {
    require(id >= 0, s"synthetic wav id must be >= 0, got $id")
    val sr = 8000 + (id % 5).toInt * 8000
    val ch = 1 + (id % 2).toInt
    val bits = 16
    val nFrames = 100 + (id % 900).toInt
    val blockAlign = ch * bits / 8
    val dataSize = nFrames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1.toShort); bb.putShort(ch.toShort)
    bb.putInt(sr); bb.putInt(sr * blockAlign)
    bb.putShort(blockAlign.toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataSize)
    var i = 0
    while (i < dataSize) {
      bb.put(((id + 3L * i) % 256).toByte); i += 1
    }
    bb.array()
  }

  /** Deterministic raw PCM16 payload (little-endian, mono), arithmetic
    * in `id` — the m11 fixture: every 4th 64-sample block is QUIET
    * (|s| <= 6, inside any sane silence threshold), the rest loud
    * (|s| <= 2000, far outside it), and the sample count varies per id
    * so trailing windows are partial. Both engines can therefore derive
    * every window's exact energy/peak from (id, j) alone — DuckDB
    * replays the kernel without reading bytes. */
  def syntheticPcm(id: Long): Array[Byte] = {
    require(id >= 0, s"synthetic pcm id must be >= 0, got $id")
    val n = (200 + id % 300).toInt
    val bb = java.nio.ByteBuffer.allocate(2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var j = 0
    while (j < n) {
      val s =
        if ((j / 64) % 4 == 0) (id + 5L * j) % 13L - 6L
        else (id * 31L + 7L * j) % 4001L - 2000L
      bb.putShort(s.toShort)
      j += 1
    }
    bb.array()
  }

  /** Little-endian unsigned integer over `width` bytes at 1-based `pos`
    * — pure built-ins (substring → hex → conv), codegen'd, no UDF. The
    * byte-order reversal is why a plain conv(hex(substring(…))) over the
    * whole field would be wrong: RIFF scalars are little-endian. */
  def leUInt(blob: Column, pos: Int, width: Int): Column =
    (0 until width).map { i =>
      conv(hex(substring(blob, pos + i, 1)), 16, 10).cast("long") *
        lit(1L << (8 * i))
    }.reduce(_ + _)

  /** Header parse for CANONICAL PCM WAV blobs (the 44-byte layout
    * [[syntheticWav]] writes: `fmt ` at offset 12, `data` at 36, PCM
    * format tag, data chunk running to EOF) — one codegen'd expression
    * over the leading bytes plus an exact payload checksum, no UDF and
    * no decode library. Anything non-canonical — truncated header,
    * extra chunks, non-PCM, alien bytes — yields a NULL struct: the
    * same documented null contract as the image decode path (m08). A
    * production variant walking arbitrary chunk lists belongs in a
    * [[decodeBatch]]-style codec slot; header-level triage of a crawl
    * deliberately stays expression-only so it fuses into the scan. */
  def wavMeta(blob: Column): Column = {
    def tag(pos: Int, s: String): Column =
      substring(blob, pos, 4) === lit(s.getBytes("US-ASCII"))
    val dataSize = leUInt(blob, 41, 4)
    val blockAlign = leUInt(blob, 33, 2)
    val byteRate = leUInt(blob, 29, 4)
    val canonical = tag(1, "RIFF") && tag(9, "WAVE") && tag(13, "fmt ") &&
      tag(37, "data") && length(blob) >= 44 &&
      leUInt(blob, 21, 2) === 1 && // PCM
      length(blob).cast("long") === lit(44L) + dataSize &&
      blockAlign > 0 && byteRate > 0
    // magnitudes stay far under 2^53, so the floor-divisions are exact
    val payload = blob.substr(lit(45), length(blob) - 44)
    when(canonical, struct(
      leUInt(blob, 23, 2).as("channels"),
      leUInt(blob, 25, 4).as("sample_rate"),
      leUInt(blob, 35, 2).as("bits_per_sample"),
      blockAlign.as("block_align"),
      byteRate.as("byte_rate"),
      floor(dataSize / blockAlign).cast("long").as("n_frames"),
      floor(dataSize * lit(1000000L) / byteRate).cast("long")
        .as("duration_us"),
      graft.functions.expressions.BlobStats(payload)
        .getField("byte_sum").as("payload_byte_sum")))
  }

  /** Canonical two-box MP4 (`ftyp` + `moov`/`mvhd` version 0),
    * deterministic in `id` — the ISO-BMFF counterpart of
    * [[syntheticWav]]: brand list, timescale, and duration are
    * arithmetic in `id`, so DuckDB can verify a genuine box-structure
    * parse ([[mp4Meta]]) without reading ISO BMFF itself. Big-endian
    * scalars throughout (the byte-order mirror of WAV's little-endian —
    * the pair exercises both ends of [[leUInt]]/[[beUIntAt]]). */
  def syntheticMp4(id: Long): Array[Byte] = {
    require(id >= 0, s"synthetic mp4 id must be >= 0, got $id")
    val brands = Seq("isom", "mp42", "avc1")
    val nCompat = 1 + (id % 3).toInt
    val ftypSize = 16 + 4 * nCompat
    val timescale = 600 + (id % 4).toInt * 300
    val durUnits = timescale * (1 + (id % 60).toInt) + (id % 37).toInt
    val bb = java.nio.ByteBuffer.allocate(ftypSize + 116) // BE default
    bb.putInt(ftypSize); bb.put("ftyp".getBytes("US-ASCII"))
    bb.put(brands((id % 3).toInt).getBytes("US-ASCII"))
    bb.putInt((id % 512).toInt) // minor_version
    (0 until nCompat).foreach(i =>
      bb.put(brands(((id + i) % 3).toInt).getBytes("US-ASCII")))
    bb.putInt(116); bb.put("moov".getBytes("US-ASCII"))
    bb.putInt(108); bb.put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0) // version 0 + flags
    bb.putInt((id % 100000).toInt); bb.putInt((id % 99991).toInt)
    bb.putInt(timescale); bb.putInt(durUnits)
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort) // rate, volume
    bb.put(new Array[Byte](10)) // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(bb.putInt) // unity matrix
    (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putInt((id % 7 + 2).toInt) // next_track_id
    bb.array()
  }

  /** [[leUInt]] with a dynamic (Column) position and BIG-endian byte
    * order — ISO-BMFF box sizes/scalars. Same pure-built-ins contract:
    * substring → hex → conv, codegen'd, no UDF. */
  def beUIntAt(blob: Column, pos: Column, width: Int): Column =
    (0 until width).map { i =>
      conv(hex(blob.substr(pos + i, lit(1))), 16, 10).cast("long") *
        lit(1L << (8 * (width - 1 - i)))
    }.reduce(_ + _)

  /** Box-structure parse for CANONICAL two-box MP4 blobs (the layout
    * [[syntheticMp4]] writes: `ftyp`, then a `moov` holding exactly a
    * version-0 `mvhd`) — expression-only, like [[wavMeta]]: the `ftyp`
    * size field steers where the `moov`/`mvhd` reads land, so the
    * parse follows the container's own indirection, not fixed offsets.
    * Anything non-canonical (truncated, version-1 mvhd, extra boxes,
    * alien bytes) yields a NULL struct — the m08/m09 null contract. */
  def mp4Meta(blob: Column): Column = {
    def tagAt(pos: Column, s: String): Column =
      blob.substr(pos, lit(4)) === lit(s.getBytes("US-ASCII"))
    val s1 = beUIntAt(blob, lit(1), 4)
    // Clamp before the int cast: under ANSI mode an adversarial size
    // field >= 2^31 (with 'ftyp' in place and (s1-16)%4 == 0) would
    // otherwise throw CAST_OVERFLOW while the canonical condition is
    // still being evaluated, failing the whole scan on one bad blob.
    // The clamp keeps p + 8 inside int range too; any blob large
    // enough for the clamp to matter fails the moov/length checks and
    // nulls out, which is the documented non-canonical contract.
    val p = least(s1 + 1, lit(Int.MaxValue.toLong - 16L)).cast("int") // moov box start, 1-based
    val q = p + 8 // mvhd box start
    val s2 = beUIntAt(blob, p, 4)
    val mvhdSize = beUIntAt(blob, q, 4)
    val version = conv(hex(blob.substr(q + 8, lit(1))), 16, 10).cast("long")
    val timescale = beUIntAt(blob, q + 20, 4)
    val duration = beUIntAt(blob, q + 24, 4)
    val canonical = tagAt(lit(5), "ftyp") && s1 >= 16 &&
      pmod(s1 - 16, lit(4L)) === 0 &&
      tagAt(p + 4, "moov") && tagAt(q + 4, "mvhd") &&
      version === 0 && mvhdSize === 108 && s2 === 116 &&
      length(blob).cast("long") === s1 + s2 && timescale > 0
    // magnitudes stay far under 2^53, so the floor-division is exact
    when(canonical, struct(
      blob.substr(lit(9), lit(4)).cast("string").as("major_brand"),
      floor((s1 - 16) / lit(4L)).cast("long").as("n_brands"),
      timescale.as("timescale"),
      duration.as("duration_units"),
      floor(duration * lit(1000L) / timescale).cast("long")
        .as("duration_ms")))
  }

  /** Deterministic stand-in codec: dimensions derived from blob length and
    * a simple content checksum — stable, partition-order-independent. */
  def stubCodec(blob: Array[Byte]): (Int, Int, Int) = {
    var checksum = 0L
    var i = 0
    while (i < blob.length) { checksum = checksum * 31 + (blob(i) & 0xff); i += 1 }
    val w = 16 + (((checksum % 113) + 113) % 113).toInt * 16
    val h = 16 + ((((checksum >> 7) % 113) + 113) % 113).toInt * 16
    (w, h, 3)
  }

  /** Byte-balanced repartitioning for heavy-tailed blob tables: chooses
    * the partition count from the TOTAL byte volume (one cheap aggregate —
    * the same statistics pass AQE does) and round-robins rows so no task
    * is stuck with a run of large blobs. Use before an expensive decode
    * stage; metadata-only passes don't need it (they never move blobs). */
  def repartitionBySize(
      df: DataFrame,
      blobCol: String,
      targetPartitionBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val total = df
      .select(coalesce(sum(length(col(blobCol)).cast("long")), lit(0L)))
      .head.getLong(0)
    val n = math.max(1, math.ceil(total.toDouble / targetPartitionBytes).toInt)
    df.repartition(n)
  }

  /** Per-blob PCM16 window energies
    * ([[graft.functions.expressions.PcmWindows]], exploded):
    * (id, win, n_samples, sum_sq, peak_abs, silent) — sample-level
    * audio curation (silence-run trimming, clipping triage, energy
    * profiles) as one scan-fused kernel pass; see the expression's
    * scaladoc for the exact integer contract. */
  def pcmWindows(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      windowSamples: Int = 1024,
      silenceThreshold: Int = 512): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.expressions.PcmWindows(
        col(blobCol), windowSamples, silenceThreshold)).as("__w"))
      .select(col(idCol), col("__w.win").as("win"),
        col("__w.n_samples").as("n_samples"),
        col("__w.sum_sq").as("sum_sq"),
        col("__w.peak_abs").as("peak_abs"),
        col("__w.silent").as("silent"))

  /** Per-blob content-defined chunks
    * ([[graft.functions.expressions.CdcChunks]], exploded):
    * (id, start, len, hash) — the storage-dedup building block. */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      window: Int = 8,
      maskBits: Int = 5): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.expressions.CdcChunks(
        col(blobCol), window, maskBits)).as("__ch"))
      .select(col(idCol), col("__ch.start").as("start"),
        col("__ch.len").as("len"), col("__ch.hash").as("hash"))

  /** Corpus chunk-dedup readout over content-defined chunks: how much
    * of the blob corpus is byte-identical at chunk granularity —
    * (n_blobs, n_chunks, distinct_chunks, total_bytes, unique_bytes,
    * dedup_ratio), where dedup_ratio is the byte fraction a
    * hash-addressed store would NOT have to keep. The CDC boundaries
    * (not fixed strides) make the measure insertion-robust: a shifted
    * copy re-chunks identically past the edit.
    *
    * Scale shape: the chunk kernel is one codegen'd pass inside the
    * blob scan; the ONLY shuffled relation is the (hash, count,
    * min len) tally — 24 bytes per distinct chunk, never blob bytes —
    * and every global number folds out of that tally plus one id-only
    * corpus count. The result materializes eagerly as its single row
    * (two bounded collects), so callers can't re-trigger the scan. */
  def cdcDedupStats(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      window: Int = 8,
      maskBits: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val byHash = cdcChunks(df, idCol, blobCol, window, maskBits)
      .groupBy(col("hash"))
      .agg(count(lit(1)).as("__cnt"), sum(col("len")).as("__sl"),
        min(col("len")).as("__ml"))
      .agg(
        coalesce(sum(col("__cnt")), lit(0L)).as("n_chunks"),
        count(lit(1)).as("distinct_chunks"),
        coalesce(sum(col("__sl")), lit(0L)).as("total_bytes"),
        coalesce(sum(col("__ml")), lit(0L)).as("unique_bytes"))
      .collect()(0)
    val nBlobs = df.select(col(idCol)).count()
    Seq((nBlobs, byHash.getLong(0), byHash.getLong(1), byHash.getLong(2),
      byHash.getLong(3)))
      .toDF("n_blobs", "n_chunks", "distinct_chunks", "total_bytes",
        "unique_bytes")
      .select(col("*"),
        round(lit(1.0) - col("unique_bytes").cast("double") /
          nullif(col("total_bytes").cast("double"), lit(0.0)), 6)
          .as("dedup_ratio"))
  }
}
