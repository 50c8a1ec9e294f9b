package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.{BlobStats, ByteHistogram, FrameFingerprints}
import graft.operators.Multimodal

/** Ground truth for the multimodal binary kernels: stats vs a JVM-side
  * reference computation, histogram/frame invariants, format sniffing,
  * and the batched-decode plumbing. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    .select(col("doc_id"), col("text").cast("binary").as("blob"), col("text"))

  test("blob_stats matches an independent JVM computation on real docs") {
    val got = docs.limit(50)
      .select(col("doc_id"), col("text"), BlobStats(col("blob")).as("s"))
      .select(col("doc_id"), col("text"),
        col("s.byte_len"), col("s.byte_sum"), col("s.mean_byte"),
        col("s.distinct_bytes"), col("s.entropy"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val bytes = r.getAs[String]("text").getBytes("UTF-8")
      val expLen = bytes.length.toLong
      val expSum = bytes.map(b => (b & 0xff).toLong).sum
      val expDistinct = bytes.map(_ & 0xff).distinct.length
      val counts = bytes.groupBy(_ & 0xff).view.mapValues(_.length).toMap
      val expEntropy = -counts.values.map { c =>
        val p = c.toDouble / expLen
        p * (math.log(p) / math.log(2.0))
      }.sum
      assert(r.getAs[Long]("byte_len") == expLen)
      assert(r.getAs[Long]("byte_sum") == expSum)
      assert(r.getAs[Int]("distinct_bytes") == expDistinct)
      assert(math.abs(r.getAs[Double]("mean_byte") - expSum.toDouble / expLen) < 1e-12)
      assert(math.abs(r.getAs[Double]("entropy") - expEntropy) < 1e-9)
    }
  }

  test("byte_histogram buckets correctly and sums to byte_len") {
    val one = Seq(Tuple1(Array[Byte](0, 1, 15, 16, 0xff.toByte)))
      .toDF("blob")
    val h = one.select(ByteHistogram(col("blob"), 16)).head.getSeq[Long](0)
    assert(h.length == 16)
    assert(h.head == 3L) // bytes 0,1,15 -> bin 0; 16 -> bin 1; 255 -> bin 15
    assert(h(1) == 1L)
    assert(h(15) == 1L)
    val sums = docs.limit(20)
      .select(length(col("blob")).cast("long").as("len"),
        aggregate(ByteHistogram(col("blob"), 16), lit(0L), _ + _).as("histSum"))
      .collect()
    sums.foreach(r => assert(r.getAs[Long]("len") == r.getAs[Long]("histSum")))
  }

  test("frame fingerprints: deterministic, n-bounded, edit-local") {
    val base = ("A" * 640).getBytes("UTF-8")
    val edited = base.clone(); edited(600) = 'B'.toByte
    val df = Seq((1L, base), (2L, base), (3L, edited)).toDF("id", "blob")
    val rows = df.select(col("id"), FrameFingerprints(col("blob"), 64, 8).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1).length == 8)
    assert(rows(1) == rows(2)) // identical blobs -> identical frames
    assert(rows(1) != rows(3)) // edit detected
    // the edit at offset 600 must not disturb the earliest frames
    assert(rows(1).take(4) == rows(3).take(4))
    // shorter than one frame -> single whole-blob fingerprint
    val tiny = Seq(Tuple1("xy".getBytes("UTF-8"))).toDF("blob")
      .select(FrameFingerprints(col("blob"), 64, 8)).head.getSeq[Long](0)
    assert(tiny.length == 1)
    val empty = Seq(Tuple1(Array.empty[Byte])).toDF("blob")
      .select(FrameFingerprints(col("blob"), 64, 8)).head.getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("sniffFormat recognizes magic numbers, falls back to raw") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 1, 2)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 9)
    val mp4 = Array[Byte](0, 0, 0, 0x18, 0x66, 0x74, 0x79, 0x70, 0x6d)
    val text = "hello world".getBytes("UTF-8")
    val got = Seq((1L, png), (2L, jpeg), (3L, mp4), (4L, text)).toDF("id", "blob")
      .select(col("id"), Multimodal.sniffFormat(col("blob")).as("fmt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "mp4", 4L -> "raw"))
  }

  test("wavMeta parses canonical PCM headers byte-exactly; non-canonical -> null struct") {
    // JVM-side reference: re-read syntheticWav's own header fields with
    // an independent little-endian decode, then demand the expression
    // parse agrees on every field (round 12 — the m09 kernel)
    def ref(id: Long): (Long, Long, Long, Long, Long, Long, Long) = {
      val b = Multimodal.syntheticWav(id)
      val bb = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ch = bb.getShort(22).toLong
      val sr = bb.getInt(24).toLong
      val br = bb.getInt(28).toLong
      val ba = bb.getShort(32).toLong
      val bits = bb.getShort(34).toLong
      val ds = bb.getInt(40).toLong
      val psum = b.drop(44).map(x => (x & 0xff).toLong).sum
      (ch, sr, bits, ba, ds / ba, ds * 1000000L / br, psum)
    }
    val ids = Seq(0L, 1L, 7L, 123L, 899L, 4502L)
    val got = ids.map(id => (id, Multimodal.syntheticWav(id)))
      .toDF("id", "blob")
      .select(col("id"), Multimodal.wavMeta(col("blob")).as("m"))
      .select(col("id"), col("m.channels"), col("m.sample_rate"),
        col("m.bits_per_sample"), col("m.block_align"), col("m.n_frames"),
        col("m.duration_us"), col("m.payload_byte_sum"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    ids.foreach(id => assert(got(id) == ref(id), s"id=$id"))
    // a flipped header byte must CHANGE the parse, not be absorbed:
    // bump the low sample-rate byte and the canonical length check
    // still holds, so sample_rate reads exactly +1
    val bumped = Multimodal.syntheticWav(10L)
    bumped(24) = (bumped(24) + 1).toByte
    val sr = Seq((1L, bumped)).toDF("id", "blob")
      .select(Multimodal.wavMeta(col("blob")).getField("sample_rate"))
      .head.getLong(0)
    assert(sr == 8000 + 1)
    // non-canonical inputs -> NULL struct, never a throw: truncated
    // header, alien bytes, non-PCM format tag, trailing junk byte
    val nonPcm = Multimodal.syntheticWav(3L)
    nonPcm(20) = 2 // format tag 2 = ADPCM
    val trailing = Multimodal.syntheticWav(4L) :+ 0x00.toByte
    val nulls = Seq(
      (1L, Multimodal.syntheticWav(2L).take(20)),
      (2L, "definitely not audio".getBytes("UTF-8")),
      (3L, nonPcm),
      (4L, trailing))
      .toDF("id", "blob")
      .select(Multimodal.wavMeta(col("blob")).as("m"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)), "non-canonical blob parsed non-null")
  }

  test("mp4Meta parses canonical two-box MP4 byte-exactly; box indirection steers reads; non-canonical -> null") {
    // JVM-side reference via an independent big-endian decode of the
    // fixture's own bytes (round 12 — the m10 kernel)
    def ref(id: Long): (String, Long, Long, Long, Long) = {
      val b = Multimodal.syntheticMp4(id)
      val bb = java.nio.ByteBuffer.wrap(b)
      val s1 = bb.getInt(0).toLong
      val brand = new String(b, 8, 4, "US-ASCII")
      val q0 = s1.toInt + 8 // mvhd start, 0-based
      val tsc = bb.getInt(q0 + 20).toLong
      val du = bb.getInt(q0 + 24).toLong
      (brand, (s1 - 16) / 4, tsc, du, du * 1000L / tsc)
    }
    val ids = Seq(0L, 1L, 2L, 59L, 123L, 4502L)
    val got = ids.map(id => (id, Multimodal.syntheticMp4(id)))
      .toDF("id", "blob")
      .select(col("id"), Multimodal.mp4Meta(col("blob")).as("m"))
      .select(col("id"), col("m.major_brand"), col("m.n_brands"),
        col("m.timescale"), col("m.duration_units"), col("m.duration_ms"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))
      .toMap
    ids.foreach(id => assert(got(id) == ref(id), s"id=$id"))
    // indirection probe: the ftyp SIZE field steers the moov/mvhd
    // reads — growing it by 4 without moving the boxes must land the
    // moov tag check off-target and null the whole parse, never
    // produce shifted garbage values
    val steered = Multimodal.syntheticMp4(5L)
    steered(3) = (steered(3) + 4).toByte
    // a flipped timescale byte must CHANGE the parse (+1), not be absorbed
    val bumped = Multimodal.syntheticMp4(6L)
    val q0 = java.nio.ByteBuffer.wrap(bumped).getInt(0) + 8
    bumped(q0 + 23) = (bumped(q0 + 23) + 1).toByte
    // adversarial oversized size field: 'ftyp' in place, s1 >= 2^31,
    // (s1-16)%4 == 0 — under ANSI mode an unclamped (s1+1).cast("int")
    // would throw CAST_OVERFLOW mid-condition and fail the whole scan;
    // the contract is a NULL struct (round 13)
    val oversized = Multimodal.syntheticMp4(8L)
    java.nio.ByteBuffer.wrap(oversized).putInt(0, 0x80000010)
    val rows = Seq(
      (1L, steered),
      (2L, bumped),
      (3L, Multimodal.syntheticMp4(7L).take(12)),
      (4L, "container? never heard of it".getBytes("UTF-8")),
      (5L, oversized))
      .toDF("id", "blob")
      .select(col("id"), Multimodal.mp4Meta(col("blob")).as("m"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(1), "steered size must null the parse")
    assert(rows(2L).getStruct(1).getLong(2) ==
      ref(6L)._3 + 1, "timescale byte flip must read +1")
    assert(rows(3L).isNullAt(1) && rows(4L).isNullAt(1))
    assert(rows(5L).isNullAt(1),
      "size field >= 2^31 must null the parse, not CAST_OVERFLOW")
  }

  test("pcmWindows: exact integer energies from LE PCM16; silent/loud both occur; odd byte ignored; empty -> none") {
    import graft.functions.expressions.PcmWindows
    // independent JVM reference decode of the fixture's own bytes
    def ref(id: Long, win: Int, thr: Int): Seq[(Int, Int, Long, Int, Boolean)] = {
      val b = Multimodal.syntheticPcm(id)
      val bb = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until b.length / 2).map(j => bb.getShort(2 * j).toInt)
        .grouped(win).zipWithIndex.map { case (ss, w) =>
          val sq = ss.map(s => s.toLong * s).sum
          val pk = ss.map(math.abs).max
          (w, ss.size, sq, pk, pk < thr)
        }.toSeq
    }
    def run(rows: Seq[(Long, Array[Byte])]): Map[Long, Seq[(Int, Int, Long, Int, Boolean)]] =
      rows.toDF("id", "blob")
        .select(col("id"), explode(PcmWindows(col("blob"), 64, 32)).as("w"))
        .select(col("id"), col("w.win"), col("w.n_samples"), col("w.sum_sq"),
          col("w.peak_abs"), col("w.silent"))
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(r => (r.getInt(1), r.getInt(2), r.getLong(3),
          r.getInt(4), r.getBoolean(5))).sortBy(_._1).toSeq).toMap
    val ids = Seq(0L, 1L, 63L, 299L, 4502L)
    val got = run(ids.map(id => (id, Multimodal.syntheticPcm(id))))
    ids.foreach(id => assert(got(id) == ref(id, 64, 32), s"id=$id"))
    // the fixture plants both flag polarities in every doc
    assert(got(1L).exists(_._5) && got(1L).exists(!_._5))
    // a trailing odd byte (torn frame) is ignored, not mis-decoded
    val withOdd = run(Seq((7L, Multimodal.syntheticPcm(7L) :+ 0x7f.toByte)))
    assert(withOdd(7L) == ref(7L, 64, 32))
    // empty payload -> no windows; int16 min decodes exactly
    val edge = run(Seq(
      (8L, Array.empty[Byte]),
      (9L, Array[Byte](0x00, 0x80.toByte)))) // one sample: -32768
    assert(!edge.contains(8L))
    assert(edge(9L) == Seq((0, 1, 1073741824L, 32768, false)))
  }

  test("decodeBatch streams through mapPartitions with the stub codec") {
    val decoded = Multimodal.decodeBatch(docs.limit(30), "doc_id", "blob")
    val rows = decoded.collect()
    assert(rows.length == 30)
    rows.foreach { d =>
      assert(d.width >= 16 && d.height >= 16 && d.channels == 3 && d.byte_len > 0)
    }
    // determinism across independent runs
    val rows2 = Multimodal.decodeBatch(docs.limit(30), "doc_id", "blob").collect()
    assert(rows.sortBy(_.id).toSeq == rows2.sortBy(_.id).toSeq)
  }

  test("imageCodec decodes genuine PNG bytes: dims, bands, exact pixel sum; garbage is dropped, not fabricated") {
    // hand-built 3x2 truecolor PNG through the JDK writer, decoded back
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val px = Seq((0, 0, 5), (1, 0, 10), (2, 0, 15), (0, 1, 20), (1, 1, 25), (2, 1, 255))
    px.foreach { case (x, y, g) => img.setRGB(x, y, (g << 16) | (g << 8) | g) }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val decoded = Multimodal.imageCodec(bos.toByteArray)
    assert(decoded.contains((3, 2, 3, 3L * px.map(_._3).sum)))
    // not an image -> None (never stub-fabricated dims)
    assert(Multimodal.imageCodec("not a png at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageCodec(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3)).isEmpty)
  }

  test("decodeImages runs the REAL ImageIO codec through mapPartitions: synthetic PNGs round-trip, corrupt rows drop") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 12L, 13L, 144L, 9999L)
    val pngs = ids.map(id => (id, Multimodal.syntheticPng(id)))
      .toDF("doc_id", "blob")
    val junk = Seq((777L, "corrupt bytes".getBytes("UTF-8"))).toDF("doc_id", "blob")
    val got = Multimodal.decodeImages(pngs.union(junk), "doc_id", "blob")
      .collect().sortBy(_.id)
    assert(got.map(_.id).toSeq == ids.sorted)
    got.foreach { d =>
      val w = (1L + d.id % 13).toInt
      val h = (1L + (d.id / 13) % 11).toInt
      val expectSum = 3L * (for { y <- 0 until h; x <- 0 until w }
        yield (d.id + 7L * x + 13L * y) % 256).sum
      assert(d.format == "png" && d.width == w && d.height == h)
      assert(d.channels == 3 && d.px_sum == expectSum)
    }
  }

  test("multi-codec decode: BMP exact, JPEG/GIF dims, both corrupt paths -> None") {
    import spark.implicits._
    val id = 29L // w = 1 + 29%13 = 4, h = 1 + (29/13)%11 = 3
    val (w, h) = (4, 3)
    val expectSum = 3L * (for { y <- 0 until h; x <- 0 until w }
      yield (id + 7L * x + 13L * y) % 256).sum
    // BMP: lossless truecolor — dims, bands AND the exact sample sum
    assert(Multimodal.imageCodec(Multimodal.syntheticImage(id, "bmp"))
      .contains((w, h, 3, expectSum)))
    // JPEG: lossy — metadata (dims, 3 bands) survives; sum is decoder's
    val jpg = Multimodal.imageCodec(Multimodal.syntheticImage(id, "jpg"))
    assert(jpg.exists { case (jw, jh, jc, _) => jw == w && jh == h && jc == 3 })
    // GIF: indexed raster — dims survive
    val gif = Multimodal.imageCodec(Multimodal.syntheticImage(id, "gif"))
    assert(gif.exists { case (gw, gh, _, _) => gw == w && gh == h })
    // corrupt path 1: valid PNG magic, truncated body — decoder throws,
    // contract is None (never an exception)
    assert(Multimodal.imageCodec(
      Multimodal.syntheticImage(id, "png").take(16)).isEmpty)
    // corrupt path 2: no reader claims the bytes — ImageIO returns null
    assert(Multimodal.imageCodec("NOT_AN_IMAGE:29".getBytes("UTF-8")).isEmpty)
    // sniffFormat classifies the new magics
    val fm = Seq(
      (1L, Multimodal.syntheticImage(id, "bmp")),
      (2L, Multimodal.syntheticImage(id, "jpg")),
      (3L, Multimodal.syntheticImage(id, "gif")))
      .toDF("i", "blob")
      .select(col("i"), Multimodal.sniffFormat(col("blob")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fm == Map(1L -> "bmp", 2L -> "jpeg", 3L -> "gif"))
    // end-to-end: corrupt rows EXIT decodeImages silently
    val mixed = Seq(
      (0L, Multimodal.syntheticImage(0L, "png")),
      (4L, Multimodal.syntheticImage(4L, "png").take(16)),
      (9L, "NOT_AN_IMAGE:9".getBytes("UTF-8")))
      .toDF("doc_id", "blob")
    assert(Multimodal.decodeImages(mixed, "doc_id", "blob")
      .collect().map(_.id).toSeq == Seq(0L))
  }

  test("resizeStub scales decode dims, clamps at 1") {
    val d = docs.limit(5)
      .withColumn("decoded", Multimodal.decodeImageStub(col("blob")))
      .withColumn("thumb", Multimodal.resizeStub(col("decoded"), 0.25))
      .select(col("decoded.width"), col("thumb.width")).collect()
    d.foreach { r =>
      assert(r.getInt(1) == math.max(1, (r.getInt(0) * 0.25).toInt))
    }
  }

  test("repartitionBySize sizes partition count from byte volume") {
    val small = Multimodal.repartitionBySize(docs, "blob", targetPartitionBytes = 10000L)
    assert(small.rdd.getNumPartitions >= 2) // ~500 docs x ~300B >> 10KB
    val big = Multimodal.repartitionBySize(docs, "blob", targetPartitionBytes = Long.MaxValue)
    assert(big.rdd.getNumPartitions == 1)
  }

  test("blob index: append equals rebuild; probe classifies copies dup and fresh bytes novel") {
    val corpus = docs
    val a = corpus.filter(col("doc_id") % 2 === 0)
    val b = corpus.filter(col("doc_id") % 2 === 1)
    Multimodal.writeBlobIndex(a, "doc_id", "blob", "blob_app", numBuckets = 8)
    Multimodal.appendBlobIndex("blob_app", b, "doc_id", "blob", numBuckets = 8)
    Multimodal.writeBlobIndex(corpus, "doc_id", "blob", "blob_reb", numBuckets = 8)
    try {
      // batch: exact copies of three corpus blobs + one genuinely new blob
      val batch = corpus.filter(col("doc_id").isin(2L, 3L, 5L))
        .select((col("doc_id") + 1000).as("doc_id"), col("blob"))
        .unionByName(spark.sql(
          "SELECT 9999L AS doc_id, cast(repeat('zq!', 100) AS binary) AS blob"))
      def probe(table: String) = Multimodal
        .probeBlobIndex(spark, table, batch, "doc_id", "blob", minShared = 2)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val viaAppend = probe("blob_app")
      assert(viaAppend == probe("blob_reb"),
        "appended blob index diverged from rebuild")
      val byId = viaAppend.map(r => r.head -> r).toMap
      // every copy classifies dup, resolving to a corpus blob with the
      // SAME bytes (the corpus may contain exact-duplicate texts, in
      // which case the smaller owner id legitimately wins the tie)
      val blobOf = corpus.collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      Seq(2L, 3L, 5L).foreach { id =>
        val row = byId(id + 1000)
        assert(row(1) == "dup", row.toString)
        assert(blobOf(row(2).asInstanceOf[Long]) == blobOf(id), row.toString)
      }
      assert(byId(9999L)(1) == "novel" && byId(9999L)(3) == 0L)
    } finally Seq("blob_app", "blob_reb").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("cdcChunks: tiling exact, JVM replica, SHIFT resistance (fixed stride lacks it), dedup stats") {
    import graft.operators.Multimodal
    // non-repeating content: chunk hashes stay distinct, so the shift
    // test below compares real alignment, not periodic collisions
    val base = (1 to 90).map(i => s"tok${i * 7919}").mkString(" ")
    def chunksOf(s: String): Seq[(Int, Int, Long)] =
      Multimodal
        .cdcChunks(Seq((1L, s.getBytes("UTF-8"))).toDF("id", "blob"),
          "id", "blob")
        .orderBy(col("start"))
        .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    val a = chunksOf(base)
    // chunks tile the blob exactly: starts chain, lengths sum to n
    assert(a.head._1 == 0 && a.map(_._2).sum == base.length)
    assert(a.sliding(2).forall {
      case Seq((s1, l1, _), (s2, _, _)) => s2 == s1 + l1
      case _ => true
    })
    // JVM replica of the boundary rule: cut after p when the 8-byte
    // 31-polynomial has its low 5 bits zero
    val bs = base.getBytes("UTF-8")
    val cuts = (7 until bs.length).filter { p =>
      val h = (p - 7 to p).foldLeft(0L)((acc, j) => acc * 31L + (bs(j) & 0xffL))
      (h & 31L) == 0L
    }
    val expectStarts = 0 +: cuts.map(_ + 1).filter(_ < bs.length)
    assert(a.map(_._1) == expectStarts)
    assert(a.size >= 4, s"fixture too smooth: ${a.size} chunks")
    // SHIFT RESISTANCE: prefixing 3 bytes re-chunks identically past
    // the first post-seam boundary — all but the seam chunk's hashes
    // reappear (a fixed 32-byte stride would lose every alignment)
    val b = chunksOf("xy." + base)
    val aSet = a.map(_._3).toSet
    val shared = aSet.intersect(b.map(_._3).toSet)
    assert(shared.size >= aSet.size - 1,
      s"CDC lost alignment: ${shared.size} of ${aSet.size} distinct chunks survive a 3-byte shift")
    // dedup stats: two identical blobs halve the unique bytes
    val two = Seq((1L, base.getBytes("UTF-8")), (2L, base.getBytes("UTF-8")))
      .toDF("id", "blob")
    val st = Multimodal.cdcDedupStats(two, "id", "blob").collect()(0)
    assert(st.getLong(0) == 2L && st.getLong(3) == 2L * base.length &&
      st.getLong(4) == base.length && st.getDouble(5) == 0.5)
    // empty corpus and empty blob degenerate cleanly
    val emptyBlob = Seq((1L, Array.empty[Byte])).toDF("id", "blob")
    val st2 = Multimodal.cdcDedupStats(emptyBlob, "id", "blob").collect()(0)
    assert(st2.getLong(0) == 1L && st2.getLong(1) == 0L && st2.isNullAt(5))
    intercept[IllegalArgumentException](
      graft.functions.expressions.CdcChunks(col("blob"), 9, 5))
  }
}
