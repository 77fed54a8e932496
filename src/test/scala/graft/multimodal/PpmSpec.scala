package graft.multimodal

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** The real codec's contract: round-trips, foreign-encoder headers
  * (comments, exotic whitespace), and strict rejection of everything
  * malformed. These cases are exactly what distinguishes a parser from
  * a byte-statistics stub. */
class PpmSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes(StandardCharsets.US_ASCII)

  test("encode -> parse round-trips header and raster exactly") {
    val pixels = Array.tabulate(3 * 4 * 3)(i => ((i * 37 + 5) % 256).toByte)
    val img = Ppm.parse(Ppm.encode(4, 3, pixels))
    assert(img.isDefined)
    assert(img.get.width == 4 && img.get.height == 3 && img.get.maxVal == 255)
    assert(img.get.pixels.sameElements(pixels))
  }

  test("foreign header: comments and mixed whitespace parse per spec") {
    // a header no encoder of ours emits: comment after magic, a full
    // comment line, tabs/CR as separators, maxval < 255
    val raster = Array.tabulate(3 * 2 * 2)(i => (0x80 + i).toByte) // bytes >= 0x80
    val header = "P6 # made elsewhere\n# full comment line\n 2\t2\r127\n"
    val bytes = ascii(header) ++ raster
    val img = Ppm.parse(bytes)
    assert(img.isDefined)
    assert(img.get.width == 2 && img.get.height == 2 && img.get.maxVal == 127)
    assert(img.get.pixels.sameElements(raster))
  }

  test("raster byte 0x20 after the single separator is data, not whitespace") {
    val raster = Array.fill(3)(' '.toByte) // 1x1 image of space bytes
    val img = Ppm.parse(ascii("P6\n1 1\n255\n") ++ raster)
    assert(img.isDefined)
    assert(img.get.pixels.sameElements(raster))
  }

  test("malformed inputs are rejected, never mis-parsed") {
    val good = Ppm.encode(2, 2, Array.fill(12)(1.toByte))
    assert(Ppm.parse(good).isDefined)
    // wrong magic (incl. the ASCII P3 variant)
    assert(Ppm.parse(ascii("P3\n2 2\n255\n") ++ Array.fill(12)(1.toByte)).isEmpty)
    assert(Ppm.parse(Array[Byte]()).isEmpty)
    assert(Ppm.parse(ascii("P")).isEmpty)
    // truncated raster / trailing garbage: exact-fill is required
    assert(Ppm.parse(good.dropRight(1)).isEmpty)
    assert(Ppm.parse(good :+ 0.toByte).isEmpty)
    // zero / oversized dims
    assert(Ppm.parse(ascii("P6\n0 2\n255\n")).isEmpty)
    assert(Ppm.parse(ascii(s"P6\n${Ppm.MaxDim + 1} 1\n255\n")).isEmpty)
    // 16-bit maxval (two bytes per sample) is out of scope: reject
    assert(Ppm.parse(ascii("P6\n1 1\n65535\n") ++ Array.fill(6)(1.toByte)).isEmpty)
    assert(Ppm.parse(ascii("P6\n1 1\n0\n") ++ Array.fill(3)(1.toByte)).isEmpty)
    // missing separator after maxval
    assert(Ppm.parse(ascii("P6\n1 1\n255") ++ Array.fill(3)(1.toByte)).isEmpty)
    // non-numeric dims
    assert(Ppm.parse(ascii("P6\nx 1\n255\n") ++ Array.fill(3)(1.toByte)).isEmpty)
  }

  test("the asset encoder emits genuinely parseable containers") {
    val text = "the quick brown fox".getBytes(StandardCharsets.UTF_8)
    val bytes = Multimodal.encodePpm(docId = 42L, text = text)
    val img = Ppm.parse(bytes).get
    assert(img.width == Multimodal.ppmW(42L))
    assert(img.height == Multimodal.ppmH(42L))
    // pixel rule: R cycles text bytes, G = 255 - R, B = doc_id % 256
    val n = img.width * img.height
    (0 until n).foreach { p =>
      val r = img.pixels(3 * p) & 0xff
      assert(r == (text(p % text.length) & 0xff))
      assert((img.pixels(3 * p + 1) & 0xff) == 255 - r)
      assert((img.pixels(3 * p + 2) & 0xff) == 42)
    }
    // empty text: all-black R channel, still a valid container
    val empty = Ppm.parse(Multimodal.encodePpm(7L, Array[Byte]())).get
    assert(empty.pixels.grouped(3).forall(px =>
      (px(0) & 0xff) == 0 && (px(1) & 0xff) == 255 && (px(2) & 0xff) == 7))
  }
}
