package graft.multimodal

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** The WAV codec's contract: round-trips, foreign-encoder containers
  * (extra chunks, odd-size padding), and strict rejection of malformed
  * or out-of-scope input. */
class WavSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes(StandardCharsets.US_ASCII)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def fmtChunk(format: Int = Wav.FormatPcm, ch: Int = 1,
      rate: Int = 8000, bits: Int = 8): Array[Byte] =
    ascii("fmt ") ++ le32(16) ++ le16(format) ++ le16(ch) ++ le32(rate) ++
      le32(rate.toLong * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits)

  private def riff(body: Array[Byte]): Array[Byte] =
    ascii("RIFF") ++ le32(4L + body.length) ++ ascii("WAVE") ++ body

  test("encode -> parse round-trips fmt fields and samples exactly") {
    val samples = Array.tabulate(301)(i => ((i * 7 + 3) % 256).toByte)
    val a = Wav.parse(Wav.encode(8000, samples))
    assert(a.isDefined)
    assert(a.get.sampleRate == 8000 && a.get.channels == 1 &&
      a.get.bitsPerSample == 8)
    assert(a.get.samples.sameElements(samples))
  }

  test("foreign container: unknown chunks are skipped, odd sizes padded") {
    // LIST metadata before fmt, a 3-byte junk chunk (odd → 1 pad byte)
    // between fmt and data — the layout real encoders produce
    val samples = Array.tabulate(10)(i => (0x80 + i).toByte)
    val body = ascii("LIST") ++ le32(4) ++ ascii("INFO") ++
      fmtChunk() ++
      ascii("junk") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) ++ // 3 + pad
      ascii("data") ++ le32(samples.length.toLong) ++ samples
    val a = Wav.parse(riff(body))
    assert(a.isDefined, "unknown chunks must be skipped")
    assert(a.get.samples.sameElements(samples))
  }

  test("odd-size FINAL data chunk may omit the pad byte") {
    val samples = Array.tabulate(7)(_.toByte)
    val body = fmtChunk() ++
      ascii("data") ++ le32(samples.length.toLong) ++ samples
    assert(Wav.parse(riff(body)).isDefined)
  }

  test("odd-size FINAL data chunk may carry the spec's pad byte, " +
      "under either RIFF-size convention") {
    val samples = Array.tabulate(7)(_.toByte)
    val padded = fmtChunk() ++
      ascii("data") ++ le32(samples.length.toLong) ++ samples ++
      Array[Byte](0) // the word-alignment pad
    // writer counts the pad in the RIFF size (riff() does: 4 + body.len)
    val counted = riff(padded)
    val a = Wav.parse(counted)
    assert(a.isDefined, "pad counted in RIFF size must parse")
    assert(a.get.samples.sameElements(samples),
      "the pad byte must not leak into the samples")
    // writer excludes the final pad from the RIFF size (also in the wild)
    val excluded = counted.clone()
    excluded(4) = (excluded(4) - 1).toByte
    val b = Wav.parse(excluded)
    assert(b.isDefined, "pad excluded from RIFF size must parse")
    assert(b.get.samples.sameElements(samples))
    // but a one-short RIFF size with NO pad present stays rejected
    val noPad = riff(fmtChunk() ++
      ascii("data") ++ le32(samples.length.toLong) ++ samples)
    val short = noPad.clone()
    short(4) = (short(4) - 1).toByte
    assert(Wav.parse(short).isEmpty,
      "len-9 without a consumed tail pad is a size mismatch")
  }

  test("malformed and out-of-scope containers are rejected") {
    val samples = Array.fill(8)(1.toByte)
    def wav(body: Array[Byte]) = riff(body)
    val goodBody = fmtChunk() ++ ascii("data") ++ le32(8) ++ samples
    assert(Wav.parse(wav(goodBody)).isDefined)
    // wrong magics
    assert(Wav.parse(ascii("RIFX") ++ wav(goodBody).drop(4)).isEmpty)
    assert(Wav.parse(Array[Byte]()).isEmpty)
    // RIFF size disagreeing with the payload
    val badSize = wav(goodBody)
    badSize(4) = (badSize(4) + 1).toByte
    assert(Wav.parse(badSize).isEmpty)
    // truncated data chunk
    assert(Wav.parse(wav(fmtChunk() ++ ascii("data") ++ le32(9) ++ samples)).isEmpty)
    // missing fmt / missing data
    assert(Wav.parse(wav(ascii("data") ++ le32(8) ++ samples)).isEmpty)
    assert(Wav.parse(wav(fmtChunk())).isEmpty)
    // out of scope: 16-bit, stereo, non-PCM
    assert(Wav.parse(wav(fmtChunk(bits = 16) ++ ascii("data") ++ le32(8) ++ samples)).isEmpty)
    assert(Wav.parse(wav(fmtChunk(ch = 2) ++ ascii("data") ++ le32(8) ++ samples)).isEmpty)
    assert(Wav.parse(wav(fmtChunk(format = 3) ++ ascii("data") ++ le32(8) ++ samples)).isEmpty)
  }

  test("the asset encoder emits genuinely parseable containers") {
    val text = "pack my box with five dozen jugs"
      .getBytes(StandardCharsets.UTF_8)
    val a = Wav.parse(Multimodal.encodeWavAsset(17L, text)).get
    assert(a.sampleRate == Multimodal.WavRate)
    assert(a.samples.length == Multimodal.wavN(17L))
    // sample rule: text bytes cycled + position ramp, mod 256
    a.samples.zipWithIndex.foreach { case (s, i) =>
      assert((s & 0xff) == ((text(i % text.length) & 0xff) + i) % 256)
    }
    // empty text: pure ramp from 0
    val e = Wav.parse(Multimodal.encodeWavAsset(3L, Array[Byte]())).get
    e.samples.zipWithIndex.foreach { case (s, i) =>
      assert((s & 0xff) == i % 256)
    }
  }
}
