package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Native Catalyst expressions over opaque `binary` columns — the
  * multimodal (image/audio/video blob) analysis kernels of the builder
  * brief. The reference has no binary surface at all (acowley/Frames cells
  * are text-parsed scalars, `src/Frames/ColumnTypeable.hs:24-59`); this is
  * training-pipeline extension territory.
  *
  * Each kernel is one pass over the blob's bytes, inlined into whole-stage
  * codegen via `doGenCode` — at 100 TB the metadata/fingerprint pass
  * touches every blob, so it must stream through the scan with zero
  * per-row allocation beyond its fixed-size accumulators, and must never
  * require the blob to be shuffled (all outputs are tiny scalars/arrays;
  * downstream ops join on those, not on the bytes).
  */
object BinaryUtil {
  /** Single-pass blob statistics: length, exact byte sum (integers — safe
    * to oracle-compare), mean, distinct byte values, Shannon entropy in
    * bits/byte (fixed 0..255 accumulation order ⇒ deterministic across
    * partitionings). */
  def blobStats(bytes: Array[Byte]): InternalRow = {
    val counts = new Array[Long](256)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      counts(b) += 1
      sum += b
      i += 1
    }
    val n = bytes.length.toLong
    var distinct = 0
    var entropy = 0.0
    var v = 0
    while (v < 256) {
      if (counts(v) > 0) {
        distinct += 1
        val p = counts(v).toDouble / n
        entropy -= p * (math.log(p) / math.log(2.0))
      }
      v += 1
    }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    new GenericInternalRow(Array[Any](n, sum, mean, distinct, entropy))
  }

  /** Fixed-width byte-value histogram: bucket `b * bins / 256` (bins must
    * divide 256 for equal widths; any 1..256 accepted). */
  def byteHistogram(bytes: Array[Byte], bins: Int): GenericArrayData = {
    val counts = new Array[Long](bins)
    var i = 0
    while (i < bytes.length) {
      counts(((bytes(i) & 0xff) * bins) >>> 8) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** `n` XXH64 fingerprints of evenly spaced `frameBytes`-wide windows —
    * the frame-sampling analog for opaque video/audio blobs: identical
    * blobs give identical frame sets; a local edit disturbs only the
    * frames covering it. Windows are clamped to the blob; blobs shorter
    * than one frame yield a single whole-blob fingerprint; empty blobs
    * yield an empty array. */
  def frameFingerprints(bytes: Array[Byte], frameBytes: Int, n: Int): GenericArrayData = {
    val len = bytes.length
    if (len == 0) return new GenericArrayData(new Array[Any](0))
    val frames = math.min(n, math.max(len / math.max(frameBytes, 1), 1))
    val out = new Array[Any](frames)
    val span = math.max(len - frameBytes, 0)
    var f = 0
    while (f < frames) {
      val off = if (frames == 1) 0 else (span.toLong * f / (frames - 1)).toInt
      val w = math.min(frameBytes, len - off)
      out(f) = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + off, w, SketchUtil.SparkSeed)
      f += 1
    }
    new GenericArrayData(out)
  }
}

/** `blob_stats(binary) -> struct<byte_len,byte_sum,mean_byte,distinct_bytes,entropy>`. */
case class BlobStats(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BlobStats.schema

  override def nullSafeEval(input: Any): Any =
    BinaryUtil.blobStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BinaryUtil.blobStats($c);")

  override protected def withNewChildInternal(newChild: Expression): BlobStats =
    copy(child = newChild)

  override def prettyName: String = "blob_stats"
}

object BlobStats {
  val schema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("distinct_bytes", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  def apply(c: Column): Column =
    ColumnBridge.column(BlobStats(ColumnBridge.expression(c)))
}

/** `byte_histogram(binary, bins) -> array<long>` (length `bins`). */
case class ByteHistogram(child: Expression, bins: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  require(bins >= 1 && bins <= 256, "bins in [1, 256]")
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BinaryUtil.byteHistogram(input.asInstanceOf[Array[Byte]], bins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BinaryUtil.byteHistogram($c, $bins);")

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)

  override def prettyName: String = "byte_histogram"
}

object ByteHistogram {
  def apply(c: Column, bins: Int): Column =
    ColumnBridge.column(ByteHistogram(ColumnBridge.expression(c), bins))
}

/** `frame_fingerprints(binary, frameBytes, n) -> array<long>`. */
case class FrameFingerprints(child: Expression, frameBytes: Int, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(frameBytes >= 1 && n >= 1, "frameBytes >= 1, n >= 1")
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BinaryUtil.frameFingerprints(input.asInstanceOf[Array[Byte]], frameBytes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BinaryUtil.frameFingerprints($c, $frameBytes, $n);")

  override protected def withNewChildInternal(newChild: Expression): FrameFingerprints =
    copy(child = newChild)

  override def prettyName: String = "frame_fingerprints"
}

object FrameFingerprints {
  def apply(c: Column, frameBytes: Int, n: Int): Column =
    ColumnBridge.column(FrameFingerprints(ColumnBridge.expression(c), frameBytes, n))
}

/** `cdc_chunks(binary, window, maskBits) ->
  * array<struct<start:int, len:int, hash:long>>` — content-defined
  * chunking (the Rabin/FastCDC family, LBFS Muthitacharoen et al. 2001):
  * a chunk boundary falls after every position whose `window`-byte
  * polynomial rolling fingerprint has its low `maskBits` bits zero, so
  * identical byte runs chunk identically REGARDLESS of their offset —
  * an insertion early in a blob disturbs only the chunk containing it,
  * where fixed-stride chunking would shift (and miss) every later
  * duplicate. Expected chunk length ≈ 2^maskBits bytes.
  *
  * Each chunk carries its XXH64 (Spark seed), so downstream dedup joins
  * move 8-byte hashes, never blob bytes. The window fingerprint is the
  * exact integer Σ b_j·31^(window−1−j) (window ≤ 8 keeps it inside a
  * long with no wraparound — the DuckDB oracle replays it as the same
  * 8-term sum), making the whole kernel bit-replayable. Empty blobs
  * yield an empty array; a trailing remainder always closes the last
  * chunk. */
object CdcUtil {
  def cdcChunks(bytes: Array[Byte], window: Int, maskBits: Int): GenericArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val mask = (1L << maskBits) - 1L
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var start = 0
    var p = window - 1
    // positions before the first full window can't host a boundary.
    // The boundary SET is purely positional ({p : H(p) & mask == 0},
    // windows may straddle a previous cut) — no sequential suppression,
    // so the oracle can replay boundaries independently per position.
    while (p < n) {
      var h = 0L
      var j = p - window + 1
      while (j <= p) { h = h * 31L + (bytes(j) & 0xffL); j += 1 }
      if ((h & mask) == 0L) {
        out += new GenericInternalRow(Array[Any](
          start, p - start + 1,
          XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start,
            p - start + 1, SketchUtil.SparkSeed)))
        start = p + 1
      }
      p += 1
    }
    if (start < n)
      out += new GenericInternalRow(Array[Any](
        start, n - start,
        XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start,
          n - start, SketchUtil.SparkSeed)))
    new GenericArrayData(out.toArray)
  }
}

case class CdcChunks(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(window >= 1 && window <= 8, "window in [1, 8] (exact long fingerprint)")
  require(maskBits >= 1 && maskBits <= 30, "maskBits in [1, 30]")
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcUtil.cdcChunks(input.asInstanceOf[Array[Byte]], window, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.CdcUtil.cdcChunks($c, $window, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  def apply(c: Column, window: Int, maskBits: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(c), window, maskBits))
}

/** `pcm_windows(binary, windowSamples, silenceThreshold) ->
  * array<struct<win,n_samples,sum_sq,peak_abs,silent>>` — sample-LEVEL
  * audio curation over raw little-endian PCM16: fixed windows of
  * `windowSamples` samples, each reduced to its exact integer energy
  * (Σ s², the un-rooted RMS — integer so the DuckDB oracle replays it
  * bit-for-bit; callers take sqrt(sum_sq/n) when they want dB), its
  * peak magnitude, and a silence flag (`peak_abs < silenceThreshold`) —
  * the audio analogue of d16's substring span windows: silence-run
  * trimming, clipping triage, and energy profiling all read this one
  * relation instead of the waveform. One codegen'd pass inside the blob
  * scan; windows never allocate sample arrays (two running integers per
  * window) and blob bytes never shuffle — downstream consumers join on
  * (id, win) scalars. A trailing window is PARTIAL (`n_samples <
  * windowSamples`); a trailing odd byte (torn 16-bit frame) is ignored;
  * empty payloads yield an empty array. */
object PcmUtil {
  def pcmWindows(
      bytes: Array[Byte], windowSamples: Int, silenceThreshold: Int)
      : GenericArrayData = {
    val nSamples = bytes.length / 2
    if (nSamples == 0) return new GenericArrayData(new Array[Any](0))
    val nWin = (nSamples + windowSamples - 1) / windowSamples
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val start = w * windowSamples
      val end = math.min(start + windowSamples, nSamples)
      var sumSq = 0L
      var peak = 0
      var j = start
      while (j < end) {
        // little-endian int16: unsigned low byte, sign-extended high
        val s = (bytes(2 * j + 1).toInt << 8) | (bytes(2 * j) & 0xff)
        sumSq += s.toLong * s
        val a = if (s < 0) -s else s // -32768 negates exactly within Int
        if (a > peak) peak = a
        j += 1
      }
      out(w) = new GenericInternalRow(Array[Any](
        w, end - start, sumSq, peak, peak < silenceThreshold))
      w += 1
    }
    new GenericArrayData(out)
  }
}

case class PcmWindows(
    child: Expression, windowSamples: Int, silenceThreshold: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(windowSamples >= 1, "windowSamples must be >= 1")
  require(silenceThreshold >= 0, "silenceThreshold must be >= 0")
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("win", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak_abs", IntegerType, nullable = false),
    StructField("silent", BooleanType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PcmUtil.pcmWindows(
      input.asInstanceOf[Array[Byte]], windowSamples, silenceThreshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.PcmUtil.pcmWindows($c, $windowSamples, $silenceThreshold);")

  override protected def withNewChildInternal(newChild: Expression): PcmWindows =
    copy(child = newChild)

  override def prettyName: String = "pcm_windows"
}

object PcmWindows {
  def apply(c: Column, windowSamples: Int, silenceThreshold: Int): Column =
    ColumnBridge.column(PcmWindows(
      ColumnBridge.expression(c), windowSamples, silenceThreshold))
}
