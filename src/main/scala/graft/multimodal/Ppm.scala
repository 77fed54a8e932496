package graft.multimodal

import java.nio.charset.StandardCharsets

/** A parsed P6 image: header fields plus the raw RGB raster
  * (3 bytes per pixel, row-major). */
case class PpmImage(width: Int, height: Int, maxVal: Int,
    pixels: Array[Byte])

/** A REAL pure-JVM codec for the binary Netpbm PPM format (`P6`) — the
  * one mainstream raster format that needs no native library, which
  * makes it the honest end of the multimodal seam: the bytes on the
  * wire are an actual image container, and [[parse]] is an actual
  * parser (magic, comments, ASCII header, raster extraction), not a
  * byte-statistics stand-in.
  *
  * Format (netpbm.sourceforge.net/doc/ppm.html): the magic `P6`, then
  * whitespace-separated ASCII `width height maxval` — with `#`-to-EOL
  * comments allowed anywhere in the header — then EXACTLY ONE
  * whitespace byte, then `3*width*height` raw bytes of RGB samples
  * (one byte per sample when maxval < 256, the only variant emitted
  * and accepted here).
  *
  * [[parse]] is strict where strictness catches corruption: dims must
  * be positive and bounded, maxval in [1, 255], the raster EXACTLY
  * fills the remaining bytes (a truncated or padded payload is a
  * malformed asset, not a smaller image). Malformed input returns
  * None — the pipeline decides whether that poisons the row or routes
  * to a quarantine, it never crashes the stage.
  */
object Ppm {

  /** Dimension bound: rejects absurd headers before the 3*w*h raster
    * check can overflow or allocate. 2^14 per side caps a decoded
    * raster at 768 MiB — far above any thumbnail this pipeline makes,
    * far below an Int overflow. */
  val MaxDim: Int = 1 << 14

  /** Serialize a raster as P6 with maxval 255. `pixels` is the raw
    * RGB raster, 3 bytes per pixel. */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim,
      s"bad dims ${width}x$height")
    require(pixels.length == 3 * width * height,
      s"raster ${pixels.length} != 3*$width*$height")
    val header = s"P6\n$width $height\n255\n"
      .getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Parse a P6 byte stream. None on anything malformed: wrong magic
    * (including the ASCII `P3` variant), non-positive or oversized
    * dims, maxval outside [1, 255], a missing raster separator, or a
    * raster that does not exactly fill the remaining bytes. */
  def parse(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2

    def isWs(b: Int): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

    // whitespace and #-comments may interleave freely in the header
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val b = bytes(i) & 0xff
        if (b == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (isWs(b)) i += 1
        else go = false
      }
    }

    // a nonempty ASCII decimal run; -1 on anything else (incl. overflow)
    def readInt(): Int = {
      skipWsAndComments()
      var v = 0L
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' &&
             v <= Int.MaxValue) {
        v = v * 10 + (bytes(i) - '0')
        any = true
        i += 1
      }
      if (!any || v > Int.MaxValue) -1 else v.toInt
    }

    val w = readInt()
    val h = readInt()
    val mv = readInt()
    if (w <= 0 || w > MaxDim || h <= 0 || h > MaxDim) return None
    if (mv <= 0 || mv > 255) return None
    // exactly ONE whitespace byte separates maxval from the raster —
    // a raster whose first sample is e.g. 0x20 must not be eaten
    if (i >= bytes.length || !isWs(bytes(i) & 0xff)) return None
    i += 1
    val raster = 3 * w * h // bounded by MaxDim^2*3 < Int.MaxValue
    if (bytes.length - i != raster) return None
    Some(PpmImage(w, h, mv,
      java.util.Arrays.copyOfRange(bytes, i, i + raster)))
  }
}
