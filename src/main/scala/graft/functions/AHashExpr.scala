package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Perceptual AUDIO fingerprint (SURVEY.md §2.11 multimodal family — the
  * audio analog of [[PHash]]): a 64-bit ENERGY-ENVELOPE difference hash
  * over a PCM-u8 WAV payload. The sample stream splits into 65 equal
  * frames; each frame's energy is the integer sum of absolute deviations
  * from the u8 midpoint (128); bit f is set iff frame f's MEAN energy
  * exceeds frame f+1's — the temporal loudness contour, which survives
  * sparse additive noise and small clipping (a speckle's energy delta is
  * tiny against a frame sum) where the exact content hash
  * (multimodal_dedup) flips on the first perturbed sample.
  *
  * Layout (fixed; the DuckDB oracle recomputes it closed-form from the
  * fixture's deterministic WAV encoding):
  *   - frame f ∈ [0, 65) covers samples i ∈ [f·n/65, (f+1)·n/65)
  *     (integer division — exact in both engines);
  *   - e(f) = Σ |s_i − 128| over the frame (u8 samples, BIGINT-exact);
  *   - bit f (f = 0..63) set iff e(f)·len(f+1) > e(f+1)·len(f) — means
  *     compared CROSS-MULTIPLIED on integer sums, never a float.
  *
  * 100 TB notes: one fingerprint per clip, one pass over the samples,
  * computed where the payload row lives (no shuffle); downstream blocking
  * reuses dedup_phash's 16-bit band equi-join tail verbatim. */
object AHash {

  /** Energy-envelope hash of a PCM-u8 mono WAV payload. */
  def ehash64(payload: Array[Byte]): Long = {
    val (_, channels, bits, off, n) =
      graft.multimodal.MediaCodec.wavHeader(payload)
    require(bits == 8 && channels == 1, s"ahash64 needs PCM u8 mono")
    val e = new Array[Long](65)
    val len = new Array[Long](65)
    var f = 0
    while (f < 65) {
      val a = (f.toLong * n / 65).toInt
      val b = ((f + 1).toLong * n / 65).toInt
      var s = 0L
      var i = a
      while (i < b) {
        val v = (payload(off + i) & 0xff) - 128
        s += (if (v < 0) -v else v)
        i += 1
      }
      e(f) = s
      len(f) = (b - a).toLong
      f += 1
    }
    var fp = 0L
    f = 0
    while (f < 64) {
      if (e(f) * len(f + 1) > e(f + 1) * len(f)) fp |= 1L << f
      f += 1
    }
    fp
  }

  /** Deterministic sparse-noise perturbation of a WAV payload: sample i
    * with i mod `every` < `hits` gains `delta`, clamped at 255 — the
    * "same clip re-captured with crackle" twin the perceptual gate must
    * still pair with its source. Header untouched; mirrored closed-form
    * by the DuckDB oracle. */
  def perturb(payload: Array[Byte], delta: Int = 25, every: Int = 101,
      hits: Int = 7): Array[Byte] = {
    val (_, _, _, off, n) = graft.multimodal.MediaCodec.wavHeader(payload)
    val out = java.util.Arrays.copyOf(payload, payload.length)
    var i = 0
    while (i < n) {
      if (i % every < hits) {
        val v = (out(off + i) & 0xff) + delta
        out(off + i) = (if (v > 255) 255 else v).toByte
      }
      i += 1
    }
    out
  }
}

/** Codegen'd `ahash64(payload BINARY) -> BIGINT` — see [[AHash]]. Same
  * one-static-call-in-codegen pattern as [[PHash64]]. */
case class AHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ahash64 needs BINARY, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    AHash.ehash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AHash.ehash64($c);")

  override def prettyName: String = "ahash64"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
