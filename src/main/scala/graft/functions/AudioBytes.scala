package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static byte-level audio helpers callable from generated code — the
  * audio analog of [[ImageBytesUtil]]: WAV PCM is uncompressed, so the
  * REAL decode is the RIFF chunk walk plus little-endian sample reads,
  * all pure byte math in whole-stage codegen.
  *
  * The fingerprint is a time-domain perceptual hash shaped like the image
  * dHash: slice the clip into 65 equal segments, measure each segment's
  * mean absolute amplitude (channel 0), set bit i when segment i is
  * louder than segment i+1. Comparisons use exact integer
  * cross-multiplication (sum_i * len_j vs sum_j * len_i) so unequal
  * segment lengths never introduce rounding. Amplitude scaling, small
  * noise, and resampling that preserves the loudness envelope leave the
  * hash unchanged — the near-duplicate-audio fingerprint the banded
  * hamming join consumes.
  */
object AudioBytesUtil {

  private final val Segments = 65 // 64 bits = 64 adjacent comparisons

  /** 64-bit loudness-envelope fingerprint of a PCM WAV payload (format
    * code 1, 8- or 16-bit, any channel count — channel 0 is read). Null
    * when the container is unrecognized, compressed, or shorter than two
    * samples per segment. Truncated payloads are clamped to the bytes
    * present, never read past the buffer. */
  def audioFingerprint(data: Array[Byte]): java.lang.Long = {
    def le4(i: Int): Long =
      (data(i) & 0xffL) | ((data(i + 1) & 0xffL) << 8) |
        ((data(i + 2) & 0xffL) << 16) | ((data(i + 3) & 0xffL) << 24)
    def le2(i: Int): Int = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8)
    def tag(i: Int, s: String): Boolean =
      data(i) == s.charAt(0) && data(i + 1) == s.charAt(1) &&
        data(i + 2) == s.charAt(2) && data(i + 3) == s.charAt(3)
    if (data.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return null
    var i = 12
    var fmtCode = -1
    var bits = -1
    var blockAlign = -1
    var dataOff = -1
    var dataLen = 0L
    while (i + 8 <= data.length) {
      val size = le4(i + 4)
      if (tag(i, "fmt ")) {
        // PCM fmt chunks declare >= 16 payload bytes; a smaller declared
        // size means the fields below would read the NEXT chunk's bytes as
        // format data and yield a garbage-but-accepted fingerprint
        if (size < 16 || i + 24 > data.length) return null
        fmtCode = le2(i + 8)
        blockAlign = le2(i + 20)
        bits = le2(i + 22)
      } else if (tag(i, "data") && dataOff < 0) {
        dataOff = i + 8
        dataLen = math.min(size, data.length.toLong - dataOff)
      }
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > data.length) data.length else next.toInt
    }
    if (fmtCode != 1 || (bits != 8 && bits != 16) || blockAlign <= 0 ||
      dataOff < 0) return null
    // envelope over at most 2^22 samples (~8.7 min at 8 kHz): keeps every
    // cross-multiply below 2^47 (no Long overflow on hostile sizes) and
    // bounds per-row work; longer clips fingerprint their head, which is
    // deterministic and documented
    val n = math.min(dataLen / blockAlign, 1L << 22).toInt
    if (n < 2 * Segments) return null
    val sums = new Array[Long](Segments)
    val lens = new Array[Long](Segments)
    var s = 0
    while (s < Segments) {
      val from = (s.toLong * n / Segments).toInt
      val until = ((s + 1).toLong * n / Segments).toInt
      var j = from
      var acc = 0L
      while (j < until) {
        val o = dataOff + j * blockAlign
        val v =
          if (bits == 8) math.abs((data(o) & 0xff) - 128)
          else math.abs((data(o) & 0xff) | (data(o + 1) << 8)) // LE signed
        acc += v
        j += 1
      }
      sums(s) = acc
      lens(s) = (until - from).toLong
      s += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) * lens(b + 1) > sums(b + 1) * lens(b)) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Deterministic 16-bit mono 8 kHz PCM WAV whose [[audioFingerprint]]
    * is exactly `seed`, at any `nPerSeg` >= 2 samples per segment: the 65
    * segment amplitudes walk +/-250 from 16000 following seed's bits
    * (every adjacent pair differs by a full step), samples alternate
    * +A/-A so each segment's mean absolute amplitude IS its planted A,
    * and `perturb` raises ~perturb/997 of the samples by one unit — far
    * below the step, the planted near-duplicate. The audio twin of
    * [[ImageBytesUtil.synthImage]]. Null for unusable sizes. */
  def synthAudio(seed: Long, nPerSeg: Int, perturb: Int): Array[Byte] = {
    if (nPerSeg < 2 || nPerSeg.toLong * Segments * 2 > (1L << 24)) return null
    val amp = new Array[Int](Segments)
    amp(0) = 16000
    var s = 0
    while (s < 64) {
      amp(s + 1) = if (((seed >>> s) & 1L) == 1L) amp(s) - 250 else amp(s) + 250
      s += 1
    }
    val n = Segments * nPerSeg
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def w4(i: Int, v: Long): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    def w2(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def tag(i: Int, t: String): Unit = {
      var k = 0
      while (k < 4) { out(i + k) = t.charAt(k).toByte; k += 1 }
    }
    tag(0, "RIFF"); w4(4, 36L + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); w4(16, 16); w2(20, 1); w2(22, 1) // PCM, mono
    w4(24, 8000); w4(28, 16000); w2(32, 2); w2(34, 16) // rate, bps, align, bits
    tag(36, "data"); w4(40, dataLen)
    var j = 0
    while (j < n) {
      var a = amp(j / nPerSeg)
      if (perturb > 0 &&
        java.lang.Math.floorMod(j * 31L + seed, 997L) < perturb) a += 1
      val v = if ((j & 1) == 0) a else -a
      w2(44 + j * 2, v)
      j += 1
    }
    out
  }
}

/** Codegen'd perceptual audio fingerprint: `audio_fingerprint(binary)` ->
  * BIGINT (null for non-PCM or too-short payloads). */
case class AudioFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_fingerprint expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    AudioBytesUtil.audioFingerprint(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("afp")
      s"""
      java.lang.Long $tmp = graft.functions.AudioBytesUtil.audioFingerprint($c);
      ${ev.isNull} = $tmp == null;
      ${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();"""
    })

  override protected def withNewChildInternal(newChild: Expression): AudioFingerprint =
    copy(child = newChild)
}

/** Codegen'd deterministic fixture clip: `synth_audio(seed, nPerSeg,
  * perturb)` -> BINARY 16-bit mono PCM WAV with audio_fingerprint == seed. */
case class SynthAudio(seed: Expression, nPerSeg: Expression, perturb: Expression)
    extends TernaryExpression {
  override def first: Expression = seed
  override def second: Expression = nPerSeg
  override def third: Expression = perturb
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (seed.dataType == LongType && nPerSeg.dataType == IntegerType &&
      perturb.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_audio expects (BIGINT, INT, INT), got " +
        s"(${seed.dataType}, ${nPerSeg.dataType}, ${perturb.dataType})")

  override def nullSafeEval(sv: Any, nv: Any, pv: Any): Any =
    AudioBytesUtil.synthAudio(sv.asInstanceOf[Long], nv.asInstanceOf[Int],
      pv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, nv, pv) => s"""
      ${ev.value} = graft.functions.AudioBytesUtil.synthAudio($sv, $nv, $pv);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SynthAudio =
    copy(seed = newFirst, nPerSeg = newSecond, perturb = newThird)
}
