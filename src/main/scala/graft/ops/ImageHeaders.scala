package graft.ops

import java.util.zip.CRC32

/** Pure-JVM image *header* decode — media type and pixel dimensions from
  * the first bytes of a payload, per the public container specs (PNG
  * RFC 2083 §3.1/§4.1.1, GIF89a spec §17-18, JPEG/JFIF ITU-T T.81 §B.2).
  * No codec library needed: this never touches compressed pixel data, so
  * it is the right shape for a 100 TB profiling pass — a few dozen bytes
  * read per record regardless of payload size.
  *
  * Also provides deterministic builders for minimal valid byte streams
  * (used by fixtures/specs): `parse(pngBytes(w, h)) == ("image/png", w, h)`
  * round-trips by construction.
  */
object ImageHeaders {

  /** Detect container type and dimensions from payload bytes.
    * Returns `Some((mediaType, width, height))` or None if the payload is
    * not a recognizable PNG/GIF/JPEG stream (malformed/truncated headers
    * return None rather than throwing — bad records fall to the caller's
    * fallback path, they don't fail the task).
    */
  def parse(payload: Array[Byte]): Option[(String, Int, Int)] =
    if (payload == null) None
    else if (isPng(payload)) parsePng(payload)
    else if (isGif(payload)) parseGif(payload)
    else if (isJpeg(payload)) parseJpeg(payload)
    else None

  private def u8(b: Byte): Int = b & 0xff
  private def be32(p: Array[Byte], i: Int): Long =
    (u8(p(i)).toLong << 24) | (u8(p(i + 1)) << 16) | (u8(p(i + 2)) << 8) | u8(p(i + 3))
  private def be16(p: Array[Byte], i: Int): Int = (u8(p(i)) << 8) | u8(p(i + 1))
  private def le16(p: Array[Byte], i: Int): Int = u8(p(i)) | (u8(p(i + 1)) << 8)

  // ------------------------------------------------------------------ PNG

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && PngSig.indices.forall(i => p(i) == PngSig(i))

  /** The IHDR chunk MUST be first (spec §4.1.1): bytes 8-11 chunk length,
    * 12-15 type "IHDR", 16-19 width, 20-23 height (both big-endian).
    */
  private def parsePng(p: Array[Byte]): Option[(String, Int, Int)] =
    if (p.length >= 24 &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R') {
      val w = be32(p, 16); val h = be32(p, 20)
      // spec: dimensions are 4-byte unsigned, zero is invalid
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some(("image/png", w.toInt, h.toInt))
      else None
    } else None

  // ------------------------------------------------------------------ GIF

  private def isGif(p: Array[Byte]): Boolean =
    p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
      (p(4) == '7' || p(4) == '9') && p(5) == 'a'

  /** Logical Screen Descriptor follows the 6-byte signature: width at
    * offset 6, height at 8, both little-endian u16.
    */
  private def parseGif(p: Array[Byte]): Option[(String, Int, Int)] =
    if (p.length >= 10) {
      val w = le16(p, 6); val h = le16(p, 8)
      if (w > 0 && h > 0) Some(("image/gif", w, h)) else None
    } else None

  // ----------------------------------------------------------------- JPEG

  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && u8(p(0)) == 0xff && u8(p(1)) == 0xd8 && u8(p(2)) == 0xff

  /** Walk the marker segments after SOI until a frame header (SOFn): each
    * segment is FF <marker> <u16 length incl. itself>. Dimensions live in
    * the SOF payload: precision(1) height(u16) width(u16). SOF markers are
    * 0xC0-0xCF except 0xC4 (DHT), 0xC8 (JPG) and 0xCC (DAC); 0x01 and
    * 0xD0-0xD7 are standalone (no length), 0xFF is fill.
    */
  private def parseJpeg(p: Array[Byte]): Option[(String, Int, Int)] = {
    var i = 2
    while (i + 3 < p.length) {
      if (u8(p(i)) != 0xff) return None // lost sync — malformed stream
      var m = u8(p(i + 1))
      var j = i + 1
      while (m == 0xff && j + 1 < p.length) { j += 1; m = u8(p(j)) } // fill bytes
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i = j + 1 } // standalone
      else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
      else {
        if (j + 2 >= p.length) return None
        val len = be16(p, j + 1)
        if (len < 2) return None
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (j + 7 >= p.length) return None
          val h = be16(p, j + 4); val w = be16(p, j + 6)
          return if (w > 0 && h > 0) Some(("image/jpeg", w, h)) else None
        }
        i = j + 1 + len
      }
    }
    None
  }

  // ------------------------------------------------- fixture byte builders

  /** Minimal valid PNG: signature + IHDR (8-bit truecolor, real CRC) +
    * empty IDAT-free body + IEND. Enough for any header-level reader.
    */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      def be(v: Long): Array[Byte] =
        Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      out.write(be(data.length.toLong))
      val body = tag.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new CRC32(); crc.update(body)
      out.write(be(crc.getValue))
    }
    val ihdr = Array[Byte](
      (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
      (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
      8, 2, 0, 0, 0) // bit depth 8, color type 2 (truecolor), no interlace
    chunk("IHDR", ihdr)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Minimal GIF89a: signature + Logical Screen Descriptor + trailer. */
  def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ Array[Byte](
      (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
      0, 0, 0, // no global color table, bg 0, aspect 0
      0x3b.toByte) // trailer

  /** Minimal JPEG: SOI, a COM segment (exercises the marker walk), SOF0
    * with one component, EOI.
    */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val com = "graft".getBytes("US-ASCII")
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      (Array[Byte](0xff.toByte, 0xfe.toByte,
        (((com.length + 2) >> 8) & 0xff).toByte, ((com.length + 2) & 0xff).toByte) ++ com) ++
      Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8, // len=11, precision 8
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
        ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
        1, 1, 0x11.toByte, 0) ++ // 1 component: id 1, sampling 1x1, qtable 0
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }
}
