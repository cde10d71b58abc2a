package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mutation fuzz over EVERY pure-JVM media decoder: a 100 TB crawl feeds
  * these arbitrary bytes, and the strict-recognizer contract is Option,
  * never an exception (or a runaway allocation/loop). The discipline
  * earned its keep the day it landed — JpegSpec's fuzz caught a real
  * AIOOBE (SOS td/ta beyond the table slots) within 300 trials.
  * Deterministic xorshift mutations of each builder's VALID output
  * (structure-adjacent corruption finds parser bugs that pure noise
  * never reaches), plus pure-noise payloads behind each magic number.
  */
class MediaFuzzSpec extends AnyFunSuite {

  private var s = 0x9e3779b97f4a7c15L
  private def nxt(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }

  private def fuzz(name: String, valid: Array[Byte],
                   decoders: Seq[Array[Byte] => Any]): Unit = {
    for (trial <- 0 until 200) {
      val b = valid.clone()
      val nMut = 1 + (nxt() & 3).toInt
      for (_ <- 0 until nMut)
        b(math.floorMod(nxt(), b.length).toInt) = (nxt() & 0xff).toByte
      decoders.zipWithIndex.foreach { case (d, i) =>
        try d(b)
        catch { case e: Throwable =>
          fail(s"$name decoder #$i threw on trial $trial: $e")
        }
      }
    }
    // truncation at every prefix length (cheap: valid payloads are small)
    for (n <- 0 until valid.length) {
      val b = java.util.Arrays.copyOf(valid, n)
      decoders.foreach(d => try d(b) catch { case e: Throwable =>
        fail(s"$name decoder threw on $n-byte truncation: $e") })
    }
  }

  test("PNG: decode survives mutation + truncation") {
    fuzz("png", graft.ops.PngPixels.pngBytes(9, 7, (x, y) => (x, y, x + y)),
      Seq(graft.ops.PngPixels.decode, graft.ops.ImageHeaders.parse))
  }

  test("BMP: decode/dimensions/aHash survive mutation + truncation") {
    fuzz("bmp",
      graft.ops.BmpPixels.bmpBytes(9, 7, (x, y) => (x, y % 4, (x + y) % 8)),
      Seq(graft.ops.BmpPixels.decode, graft.ops.BmpPixels.dimensions,
        graft.ops.BmpPixels.aHashHex))
  }

  test("WAV: header parse + PCM window walk survive mutation + truncation") {
    val samples = Array.tabulate(120)(i => ((i * 37) % 2001 - 1000).toShort)
    fuzz("wav", graft.ops.WavPcm.wavPcm16(8000, samples),
      Seq(graft.ops.WavHeaders.parse,
        (b: Array[Byte]) => graft.ops.WavPcm.pcm16WindowStats(b, 64)))
  }

  test("FLAC: decode survives mutation + truncation") {
    val mono = Array.tabulate(150)(i => ((i * 37) % 2001 - 1000))
    fuzz("flac-mono", graft.ops.FlacPcm.flacEncode16(8000, Array(mono)),
      Seq(graft.ops.FlacPcm.decode))
    val l = Array.tabulate(200)(i => ((i * 37 + 5) % 2001 - 1000))
    val r = Array.tabulate(200)(i => ((i * 53 + 10) % 1801 - 900))
    fuzz("flac-stereo", graft.ops.FlacPcm.flacEncode16(16000, Array(l, r)),
      Seq(graft.ops.FlacPcm.decode))
  }

  test("GIF: decode survives mutation + truncation") {
    val pal = IndexedSeq.tabulate(16)(i => (i * 17, (i * 29) % 256, (i * 41) % 256))
    fuzz("gif", graft.ops.GifPixels.gifBytes(11, 8, pal, 0, Seq(
        graft.ops.GifPixels.FrameSpec(0, 0, 11, 8, (x, y) => (x + y * 3) % 16),
        graft.ops.GifPixels.FrameSpec(2, 1, 7, 5, (x, y) => (x * 5 + y) % 16,
          interlace = true, transparentIndex = 3))),
      Seq(graft.ops.GifPixels.decode, graft.ops.ImageHeaders.parse))
  }

  test("TIFF: decode survives mutation + truncation") {
    fuzz("tiff", graft.ops.TiffPixels.tiffBytes(10, 8, 3,
      (x, y) => (x * 7, y * 5, (x + y) % 256), lzw = true, predictor2 = true),
      Seq(graft.ops.TiffPixels.decode))
  }

  test("MP4: box walk survives mutation + truncation") {
    fuzz("mp4", graft.ops.Mp4Headers.mp4Bytes("isom", 1000L, 42000L),
      Seq(graft.ops.Mp4Headers.parse))
  }

  test("image header sniffer survives GIF/PNG/JPEG-shaped noise") {
    // ImageHeaders.parse multiplexes by magic — feed it each magic
    // followed by noise
    val magics = Seq[Array[Byte]](
      Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes("US-ASCII"),
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte))
    for (m <- magics; n <- Seq(0, 3, 17, 200)) {
      val b = new Array[Byte](m.length + n)
      System.arraycopy(m, 0, b, 0, m.length)
      for (i <- m.length until b.length) b(i) = (nxt() & 0xff).toByte
      try graft.ops.ImageHeaders.parse(b)
      catch { case e: Throwable => fail(s"sniffer threw (n=$n): $e") }
    }
  }
}
