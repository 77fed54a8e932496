package graft.multimodal

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** The Y4M codec's contract: round-trips, foreign-encoder headers
  * (reordered tags, X metadata, per-frame parameters), and strict
  * rejection of malformed or out-of-scope streams. */
class Y4mSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes(StandardCharsets.US_ASCII)
  private def frame(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(3 * w * h)(i => ((i * 31 + seed) % 256).toByte)

  test("encode -> parse round-trips dims and every frame exactly") {
    val frames = (0 until 5).map(frame(4, 3, _))
    val v = Y4m.parse(Y4m.encode(4, 3, frames))
    assert(v.isDefined)
    assert(v.get.width == 4 && v.get.height == 3 && v.get.frames.length == 5)
    v.get.frames.zip(frames).foreach { case (got, exp) =>
      assert(got.sameElements(exp))
    }
  }

  test("foreign stream: reordered tags, X metadata, frame params") {
    val f0 = frame(2, 2, 7)
    val f1 = frame(2, 2, 9)
    val bytes = ascii("YUV4MPEG2 C444 H2 W2 F30000:1001 XYSCSS=444 Ib\n") ++
      ascii("FRAME Xtimecode=00:00\n") ++ f0 ++
      ascii("FRAME\n") ++ f1
    val v = Y4m.parse(bytes)
    assert(v.isDefined, "tag order and metadata must not matter")
    assert(v.get.width == 2 && v.get.height == 2)
    assert(v.get.frames(0).sameElements(f0) && v.get.frames(1).sameElements(f1))
  }

  test("malformed and out-of-scope streams are rejected") {
    val good = Y4m.encode(2, 2, Seq(frame(2, 2, 1)))
    assert(Y4m.parse(good).isDefined)
    // wrong magic / empty / no newline
    assert(Y4m.parse(ascii("YUV4MPEG W2 H2 C444\n") ++ frame(2, 2, 1)).isEmpty)
    assert(Y4m.parse(Array[Byte]()).isEmpty)
    assert(Y4m.parse(ascii("YUV4MPEG2 W2 H2 C444")).isEmpty)
    // C420 (implied or explicit) is out of scope, not mis-sized
    assert(Y4m.parse(ascii("YUV4MPEG2 W2 H2\nFRAME\n") ++ frame(2, 2, 1)).isEmpty)
    assert(Y4m.parse(ascii("YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n") ++ frame(2, 2, 1)).isEmpty)
    // zero frames / truncated plane / trailing garbage / bad marker
    assert(Y4m.parse(ascii("YUV4MPEG2 W2 H2 C444\n")).isEmpty)
    assert(Y4m.parse(good.dropRight(1)).isEmpty)
    assert(Y4m.parse(good :+ 0.toByte).isEmpty)
    assert(Y4m.parse(ascii("YUV4MPEG2 W2 H2 C444\nFRAMX\n") ++ frame(2, 2, 1)).isEmpty)
    // bad dims
    assert(Y4m.parse(ascii("YUV4MPEG2 W0 H2 C444\nFRAME\n")).isEmpty)
    assert(Y4m.parse(ascii(s"YUV4MPEG2 W${Y4m.MaxDim + 1} H2 C444\nFRAME\n")).isEmpty)
  }

  test("the asset encoder emits genuinely parseable streams") {
    val text = "sphinx of black quartz judge my vow"
      .getBytes(StandardCharsets.UTF_8)
    val v = Y4m.parse(Multimodal.encodeY4mAsset(11L, text)).get
    assert(v.width == Multimodal.y4mW(11L))
    assert(v.height == Multimodal.y4mH(11L))
    assert(v.frames.length == Multimodal.y4mFrames(11L))
    // plane rule: text bytes cycled + frame shift, mod 256
    v.frames.zipWithIndex.foreach { case (fr, f) =>
      fr.zipWithIndex.foreach { case (b, p) =>
        assert((b & 0xff) == Multimodal.y4mPlaneByte(text, f, p))
      }
    }
    // empty text: frame index alone
    val e = Y4m.parse(Multimodal.encodeY4mAsset(2L, Array[Byte]())).get
    e.frames.zipWithIndex.foreach { case (fr, f) =>
      assert(fr.forall(b => (b & 0xff) == f % 256))
    }
  }
}
