package graft.model

/** Typed core of the data model (SURVEY.md §1.1-1.3). */

/** One parsed N-Triples statement (`lib/ingest.js:194-198`). */
case class Triple(subject: String, predicate: String, obj: String)

/** One denormalized FAST document (`lib/ingest.js:244,290-291`).
  * `prefLabel` nullable (the reference's `false` sentinel → null).
  */
case class FastDoc(
    _id: Int,
    fast: Int,
    `type`: String,
    prefLabel: String,
    altLabel: Seq[String],
    sameAsLc: Seq[String],
    sameAsViaf: Seq[String],
    normalized: Seq[String])

/** One VIAF lookup row (`lib/ingest.js:110-118`). */
case class ViafDoc(_id: String, viaf: String, lcId: String, fast: Seq[Int])

/** Opaque multimodal payload with typed metadata (binary column pattern). */
case class MediaRecord(
    media_id: Long,
    media_type: String,
    payload: Array[Byte],
    meta: Map[String, String])

/** Output of the (stubbed) decode/feature-extract stage. */
case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    checksum: String,
    width: Int,
    height: Int)

/** Output of the REAL pixel decode (24-bpp BMP walk — graft.ops.BmpPixels):
  * exact per-channel sums over every pixel, order-free and integer, so the
  * statistics reproduce bit-for-bit in an arithmetic oracle.
  */
case class PixelStats(
    media_id: Long,
    media_type: String,
    width: Int,
    height: Int,
    n_px: Long,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long)

/** One sampled animation frame (graft.ops.Multimodal.gifFrameSamples):
  * whole-canvas composited channel sums after the frame draws — the
  * frame-sample row a video pipeline emits per kept frame.
  */
case class FrameSample(
    media_id: Long,
    frame_id: Int,
    delay_cs: Int,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long)

/** Output of the perceptual average-hash (graft.ops.BmpPixels.aHashHex):
  * 16 hex chars, one byte per 8×8 block row, bits by integer
  * cross-multiplied block-vs-global mean luminance.
  */
case class PerceptualHash(
    media_id: Long,
    width: Int,
    height: Int,
    phash_hex: String)
