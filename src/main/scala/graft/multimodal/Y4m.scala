package graft.multimodal

import java.nio.charset.StandardCharsets

/** A parsed YUV4MPEG2 stream: header dims plus the raw frames, each
  * `3*width*height` bytes of planar Y, U, V (C444 — one byte per
  * sample per plane, no chroma subsampling). */
case class Y4mVideo(width: Int, height: Int, frames: Array[Array[Byte]])

/** A REAL pure-JVM codec for the YUV4MPEG2 (`.y4m`) container — the
  * video analog of [[Ppm]]/[[Wav]] and the format every video toolchain
  * (ffmpeg, mjpegtools, codec test vectors) uses for UNCOMPRESSED
  * interchange, which is exactly why it needs no native library: the
  * stream is an ASCII header line, then per frame an ASCII `FRAME`
  * marker line followed by the raw planes.
  *
  * Format (mjpegtools y4m spec): `YUV4MPEG2` then space-separated
  * tagged parameters (`W<int> H<int> F<rate> I<mode> A<aspect>
  * C<space> X<meta>`) terminated by `\n`; each frame is `FRAME`,
  * optional tagged parameters, `\n`, then the plane bytes. Only C444
  * is accepted here (3 full planes — the variant whose geometry needs
  * no subsampling arithmetic); anything else, including the implied
  * C420 default when no C tag is present, is rejected as out of scope
  * rather than mis-sized.
  *
  * Strictness mirrors the other codecs: unknown TAGS are skipped (X
  * metadata is legal anywhere), but a malformed header, a frame marker
  * that is not exactly `FRAME`, a truncated plane, or trailing bytes
  * after the last frame return None.
  */
object Y4m {

  val MaxDim: Int = 1 << 10
  val MaxFrames: Int = 1 << 16

  def encode(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim,
      s"bad dims ${width}x$height")
    val frameLen = 3 * width * height
    require(frames.forall(_.length == frameLen), "bad frame size")
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n"
      .getBytes(StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](
      header.length + frames.size * (marker.length + frameLen))
    var o = 0
    System.arraycopy(header, 0, out, o, header.length); o += header.length
    frames.foreach { f =>
      System.arraycopy(marker, 0, out, o, marker.length); o += marker.length
      System.arraycopy(f, 0, out, o, frameLen); o += frameLen
    }
    out
  }

  def parse(bytes: Array[Byte]): Option[Y4mVideo] = {
    // locate the header line
    var nl = 0
    while (nl < bytes.length && bytes(nl) != '\n') nl += 1
    if (nl >= bytes.length) return None
    val header = new String(bytes, 0, nl, StandardCharsets.US_ASCII)
    val toks = header.split(" ").filter(_.nonEmpty)
    if (toks.isEmpty || toks(0) != "YUV4MPEG2") return None
    var w = -1
    var h = -1
    var cspace: Option[String] = None
    toks.drop(1).foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = t.drop(1).toIntOption.getOrElse(-1)
        case 'C' => cspace = Some(t.drop(1))
        case _ => () // F/I/A rates and X metadata: legal, irrelevant here
      }
    }
    if (w <= 0 || w > MaxDim || h <= 0 || h > MaxDim) return None
    // absent C tag implies C420jpeg per spec — subsampled, out of scope
    if (!cspace.contains("444")) return None
    val frameLen = 3 * w * h

    val frames = Vector.newBuilder[Array[Byte]]
    var i = nl + 1
    var n = 0
    while (i < bytes.length) {
      // frame marker line: FRAME[ tagged-params]\n
      var e = i
      while (e < bytes.length && bytes(e) != '\n') e += 1
      if (e >= bytes.length) return None
      val line = new String(bytes, i, e - i, StandardCharsets.US_ASCII)
      if (line != "FRAME" && !line.startsWith("FRAME ")) return None
      val body = e + 1
      if (body + frameLen > bytes.length) return None // truncated plane
      frames += java.util.Arrays.copyOfRange(bytes, body, body + frameLen)
      n += 1
      if (n > MaxFrames) return None
      i = body + frameLen
    }
    if (n == 0) return None
    Some(Y4mVideo(w, h, frames.result().toArray))
  }
}
