package graft.ops

/** Pure-JVM MP4 (ISO BMFF) *header* decode — brand, timescale, and
  * duration from the box structure, per the public ISO/IEC 14496-12 spec
  * (box = 32-bit big-endian size + 4-char type; `moov`→`mvhd` carries
  * timescale/duration). Completes the image ([[ImageHeaders]]) / audio
  * ([[WavHeaders]]) / video triple: a profiling pass reads a few dozen
  * bytes per record, never sample data.
  *
  * Deterministic builder included for fixtures/specs.
  */
object Mp4Headers {

  private def u8(b: Byte): Int = b & 0xff
  private def be32(p: Array[Byte], i: Int): Long =
    (u8(p(i)).toLong << 24) | (u8(p(i + 1)).toLong << 16) |
      (u8(p(i + 2)).toLong << 8) | u8(p(i + 3)).toLong
  private def typeAt(p: Array[Byte], i: Int): String =
    new String(p.slice(i, i + 4), "ISO-8859-1")

  /** Parse an ISO-BMFF stream: returns `Some((majorBrand, timescale,
    * duration))` from the first `ftyp` + `moov/mvhd` (version 0) boxes,
    * or None for malformed/truncated/unsupported payloads.
    */
  def parse(payload: Array[Byte]): Option[(String, Long, Long)] = {
    if (payload == null || payload.length < 16) return None
    var i = 0
    var brand: Option[String] = None
    var mvhd: Option[(Long, Long)] = None
    while (i + 8 <= payload.length && (brand.isEmpty || mvhd.isEmpty)) {
      val size = be32(payload, i)
      if (size < 8 || i + size > payload.length) return None
      typeAt(payload, i + 4) match {
        case "ftyp" =>
          if (size < 16) return None
          brand = Some(typeAt(payload, i + 8))
        case "moov" =>
          mvhd = parseMvhd(payload, i + 8, i + size.toInt)
        case _ => () // skip free/mdat/unknown boxes
      }
      i += size.toInt
    }
    for (b <- brand; (ts, d) <- mvhd) yield (b, ts, d)
  }

  /** Walk moov children for mvhd v0: fullbox header (version+flags, 4) +
    * ctime(4) + mtime(4) + timescale(4) + duration(4).
    */
  private def parseMvhd(p: Array[Byte], from: Int, to: Int): Option[(Long, Long)] = {
    var i = from
    while (i + 8 <= to) {
      val size = be32(p, i)
      if (size < 8 || i + size > to) return None
      if (typeAt(p, i + 4) == "mvhd") {
        if (p(i + 8) != 0 || size < 8 + 4 + 16) return None // v0 only
        val timescale = be32(p, i + 8 + 4 + 8)
        val duration = be32(p, i + 8 + 4 + 12)
        return if (timescale > 0) Some((timescale, duration)) else None
      }
      i += size.toInt
    }
    None
  }

  /** Minimal valid ISO-BMFF stream: `ftyp` (major brand, minor, one
    * compatible brand) + `moov` containing one v0 `mvhd`.
    */
  def mp4Bytes(brand: String, timescale: Long, duration: Long): Array[Byte] = {
    require(brand.length == 4, "brand must be 4 chars")
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (3 to 0 by -1).foreach(j => out.write(((v >> (8 * j)) & 0xff).toInt))
    def tag(s: String): Unit = s.foreach(c => out.write(c.toInt))
    w32(20); tag("ftyp"); tag(brand); w32(0); tag("isom")
    // mvhd v0: 8 hdr + 4 verflags + ctime/mtime/timescale/duration + rate,
    // volume+reserved, matrix(36), predefined(24), next_track_id
    val mvhdSize = 8 + 4 + 16 + 4 + 4 + 36 + 24 + 4
    w32(8L + mvhdSize); tag("moov")
    w32(mvhdSize.toLong); tag("mvhd"); w32(0)
    w32(0); w32(0); w32(timescale); w32(duration)
    w32(0x00010000L); w32(0x01000000L)
    (0 until 9).foreach(_ => w32(0))
    (0 until 6).foreach(_ => w32(0))
    w32(2)
    out.toByteArray
  }
}
