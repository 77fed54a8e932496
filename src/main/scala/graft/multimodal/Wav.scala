package graft.multimodal

import java.nio.charset.StandardCharsets

/** A parsed PCM WAV asset: the fmt-chunk fields plus the raw sample
  * bytes of the data chunk (8-bit unsigned mono — the only variant
  * emitted and accepted here). */
case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
    samples: Array[Byte])

/** A REAL pure-JVM codec for the RIFF/WAVE container with 8-bit PCM —
  * the audio analog of [[Ppm]]: an actual container format that needs
  * no native library, so the parse is a genuine RIFF chunk walk
  * (magic + size header, WAVE form type, chunk iteration with the
  * spec's odd-size pad byte, fmt validation, data extraction), not a
  * byte-statistics stand-in.
  *
  * Strictness mirrors [[Ppm.parse]]: malformed input — wrong magic, a
  * RIFF size that disagrees with the payload, a truncated chunk, a
  * non-PCM or non-8-bit fmt, or a missing fmt/data chunk — returns
  * None. Unknown chunks (LIST, fact, ...) are SKIPPED like every real
  * WAV reader does, because encoders in the wild insert them freely.
  */
object Wav {

  val FormatPcm = 1

  /** Serialize 8-bit unsigned mono PCM as a canonical 44-byte-header
    * WAV. */
  def encode(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val n = samples.length
    val out = new Array[Byte](44 + n)
    def ascii(off: Int, s: String): Unit =
      System.arraycopy(s.getBytes(StandardCharsets.US_ASCII), 0, out, off,
        s.length)
    def le32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    ascii(0, "RIFF"); le32(4, 36L + n); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16L)
    le16(20, FormatPcm); le16(22, 1) // mono
    le32(24, sampleRate.toLong)
    le32(28, sampleRate.toLong) // byte rate = rate * channels * bits/8
    le16(32, 1) // block align
    le16(34, 8) // bits per sample
    ascii(36, "data"); le32(40, n.toLong)
    System.arraycopy(samples, 0, out, 44, n)
    out
  }

  /** Parse a RIFF/WAVE byte stream carrying 8-bit mono PCM. */
  def parse(bytes: Array[Byte]): Option[WavAudio] = {
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def tag(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, StandardCharsets.US_ASCII)

    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None

    var fmt: Option[(Int, Int, Int, Int)] = None // format, ch, rate, bits
    var data: Option[Array[Byte]] = None
    var tailPadConsumed = false // stream's final byte was an odd-chunk pad
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      val size = u32(i + 4)
      val body = i + 8
      if (size < 0 || body + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          fmt = Some((u16(body), u16(body + 2), u32(body + 4).toInt,
            u16(body + 14)))
        case "data" =>
          data = Some(java.util.Arrays.copyOfRange(
            bytes, body, body + size.toInt))
        case _ => () // unknown chunk (LIST, fact, ...): skip, per spec
      }
      // chunks are word-aligned: odd sizes carry one pad byte — except
      // that writers in the wild (ours included) omit the pad on the
      // FINAL chunk, so only require it when more bytes follow
      var next = body + size.toInt
      if ((size & 1L) == 1L && next < bytes.length) {
        next += 1
        if (next == bytes.length) tailPadConsumed = true
      }
      i = next
    }
    if (i != bytes.length) return None // trailing bytes outside any chunk
    // the RIFF size field covers everything after itself — except that
    // writers split on whether a FINAL odd chunk's pad byte counts, so
    // when the walk consumed such a pad, accept both conventions
    val riffSize = u32(4)
    if (riffSize != bytes.length - 8L &&
        !(tailPadConsumed && riffSize == bytes.length - 9L)) return None
    for {
      (format, ch, rate, bits) <- fmt
      d <- data
      if format == FormatPcm && ch == 1 && bits == 8 && rate > 0
    } yield WavAudio(rate, ch, bits, d)
  }
}
