package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.images

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed per-partition in batches.
  *
  * Three decode layers are REAL and run in whole-stage codegen:
  *   - container metadata: [[imageMeta]] parses PNG/JPEG/GIF/BMP headers
  *     and [[audioMeta]] WAV/RIFF layouts from the payload's first bytes
  *     (pure byte math, no codec);
  *   - pixel/sample decompression: [[decodePng]] is a complete PNG
  *     decode (chunk CRCs, zlib inflate, all five scanline filters,
  *     every bit-depth-8 color type — [[graft.functions.PngCodecUtil]]),
  *     [[decodeJpeg]] a baseline JPEG decode (canonical Huffman,
  *     dequantization, IDCT, interleaved sampling-factor MCUs —
  *     [[graft.functions.JpegCodecUtil]]), and the audio path reads PCM
  *     WAV samples directly ([[graft.functions.AudioBytesUtil]]) — so
  *     [[pngNearDups]] and [[audioNearDups]] run perceptual dedup
  *     end-to-end from real compressed payloads;
  *   - perceptual fingerprints: [[dhash]] + [[dhashNearDups]] (images)
  *     and the loudness-envelope audio fingerprint, paired with a
  *     banded-LSH hamming join.
  *
  * `decodeStub` remains only as the generic opaque-payload seam for
  * formats that genuinely need an external codec (lossy audio, video
  * codecs); a production deployment binds one there without touching the
  * plumbing.
  *
  * At scale: media rows are large and skewed — the pipeline repartitions by
  * media_id before the decode pass so one executor doesn't absorb all the
  * big payloads, and features (small) separate from payloads (large)
  * immediately after decode so downstream joins never move the bytes. The
  * near-dup join ships 8-byte hashes, never pixels.
  */
object Multimodal {

  /** Band `b` (0..3) of a 64-bit dHash: 16 contiguous bits. Two hashes
    * within hamming distance 3 agree exactly on at least one band
    * (pigeonhole) — the LSH bucketing key of every perceptual-dup path. */
  private def band(sig: Column, b: Int): Column =
    shiftright(sig, b * 16).bitwiseAND(lit(0xffffL))

  /** Container metadata from the payload's leading bytes:
    * struct(format, width, height, channels), null when unrecognized.
    * PNG: the 8-byte signature then the IHDR chunk at fixed offsets
    * (width/height big-endian at 16/20, color type at 25 mapping to
    * channel count). JPEG: SOI then a marker-segment scan to the first
    * SOF frame header. Codegen'd byte math — metadata extraction over a
    * 100 TB media corpus reads a few hundred bytes per row and never
    * decodes a pixel. */
  def imageMeta(data: Column): Column = images.image_meta(data)

  /** Audio container metadata from the payload's leading bytes:
    * struct(format, sample_rate, channels, bits, n_samples) from the WAV
    * RIFF chunk layout (little-endian `fmt ` + `data` chunk scan), null
    * when unrecognized. Same codegen'd byte-math family as [[imageMeta]].
    */
  def audioMeta(data: Column): Column = images.audio_meta(data)

  /** Perceptual difference hash (64-bit) of a raw `w x h` grayscale
    * buffer; see [[graft.functions.ImageBytesUtil.dhash64]]. */
  def dhash(data: Column, w: Column, h: Column): Column =
    images.dhash64(data, w, h)

  /** Full PNG decode of a compressed payload to
    * struct(width, height, channels, pixels): chunk CRC verification,
    * IDAT inflate, scanline unfiltering, luma projection — pure
    * `java.util.zip` byte math in whole-stage codegen, null for anything
    * undecodable. See [[graft.functions.PngCodecUtil.pngDecodeGray]]. */
  def decodePng(data: Column): Column = images.png_decode(data)

  /** Baseline JPEG decode of a compressed payload to
    * struct(width, height, channels, pixels): canonical Huffman,
    * dequantization, IDCT, interleaved multi-component MCUs — pure byte
    * math in whole-stage codegen, null for anything undecodable. The
    * pixels are component 0 (luma). See
    * [[graft.functions.JpegCodecUtil.jpegDecodeGray]]. */
  def decodeJpeg(data: Column): Column = images.jpeg_decode(data)

  /** Perceptual near-dup join directly over COMPRESSED PNG payloads:
    * decode ([[decodePng]]) -> dHash -> the same banded hamming self-join
    * as [[dhashNearDups]]. The decode runs once per image in the
    * signature projection; only (id, 8-byte hash) rows reach the join —
    * at corpus scale the pixel buffers never leave their input partition,
    * let alone an exchange. Undecodable payloads are skipped (their
    * signature is null), matching the curation posture of every other
    * dedup path: garbage can't pair. */
  def pngNearDups(
      media: DataFrame, idCol: String, dataCol: String,
      maxHamming: Int = 0, maxPerBucket: Long = 1L << 14): DataFrame = {
    val decoded = media.select(col(idCol).as("id"),
        images.png_decode(col(dataCol)).as("m"))
      .where(col("m").isNotNull)
      .select(col("id"), col("m.pixels").as("pixels"),
        col("m.width").as("width"), col("m.height").as("height"))
    dhashNearDups(decoded, "id", "pixels", "width", "height", maxHamming,
      maxPerBucket)
  }

  /** Near-duplicate images by perceptual hash: pairs (id_a < id_b) whose
    * dHash hamming distance is <= `maxHamming`, found with banded LSH —
    * the 64-bit hash splits into four 16-bit bands; two images within
    * hamming distance 3 agree exactly on at least one band (pigeonhole),
    * so a band equi-join generates every candidate pair without an
    * all-pairs comparison. For maxHamming > 3 recall is the standard LSH
    * trade-off (a pair differing in all four bands is missed).
    *
    * Degenerate hash buckets (solid-color thumbnails, black frames) are
    * capped at `maxPerBucket` members before the join and a pair agreeing
    * on several surviving bands is deduped by a grouped aggregation over
    * 20-byte candidate rows — see [[hammingBandPairs]].
    *
    * Scale shape: one shuffle of (id, hash) pairs — 16 bytes a row
    * regardless of image size — per band (the explode multiplies rows by
    * 4, not by image bytes); the hamming filter is codegen'd
    * bit_count(xor). Returns (id_a, id_b, dhash_a, dhash_b, hamming). */
  def dhashNearDups(
      media: DataFrame, idCol: String, dataCol: String,
      wCol: String, hCol: String, maxHamming: Int = 0,
      maxPerBucket: Long = 1L << 14): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0 (got $maxHamming)")
    // materialize the 16-byte (id, sig) rows before the self-join: both
    // sides would otherwise re-decode every pixel buffer (the dominant
    // cost) once each — the same convention as Dedup.lshCandidates
    val sigs = media.select(
      col(idCol).as("id"),
      dhash(col(dataCol), col(wCol), col(hCol)).as("sig"))
      .where(col("sig").isNotNull)
      .localCheckpoint(false)
    hammingBandPairs(sigs, maxHamming, "dhash", maxPerBucket)
  }

  /** The shared banded hamming self-join over any 64-bit perceptual
    * signature frame (id, sig): every *NearDups entry point funnels here
    * after its own decode+hash projection. Returns (id_a, id_b,
    * <prefix>_a, <prefix>_b, hamming), id_a < id_b.
    *
    * Degenerate buckets are capped BEFORE the join ([[Dedup.capBucketDf]],
    * same contract as the delta/video paths): real crawls concentrate —
    * millions of solid-color thumbnails, black frames, or silent clips
    * share one hash, and one band bucket then goes quadratic in candidate
    * generation since the hamming filter only runs after the join. Rows
    * in a bucket over `maxPerBucket` lose that bucket but keep their
    * other three bands, so dHash-identical members of a degenerate
    * cluster still pair through the surviving bands; because a pair's
    * lowest shared band may be exactly the dropped one, pair dedup is a
    * grouped aggregation over candidate rows (20-byte shuffle each), not
    * a shared-band predicate — the predicate would reject the pair's
    * surviving later-band rows too. */
  private[operators] def hammingBandPairs(
      sigs: DataFrame, maxHamming: Int, prefix: String,
      maxPerBucket: Long = 1L << 14): DataFrame = {
    val sa = s"${prefix}_a"
    val sb = s"${prefix}_b"
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b => band(col("sig"), b)): _*))
        .as(Seq("band_idx", "band_val")))
    // materialized: capBucketDf reads its input twice and the self-join
    // twice more — without the checkpoint the decode lineage would rerun
    val capped = Dedup.capBucketDf(
        banded, Seq("band_idx", "band_val"), maxPerBucket)
      .localCheckpoint(false)
    val a = capped.select(col("id").as("id_a"), col("sig").as(sa),
      col("band_idx"), col("band_val"))
    val b = capped.select(col("id").as("id_b"), col("sig").as(sb),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming",
        bit_count(col(sa).bitwiseXOR(col(sb))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"), col(sa), col(sb))
      .agg(min("hamming").as("hamming"))
      .select("id_a", "id_b", sa, sb, "hamming")
  }

  /** [[pngNearDups]] for baseline JPEG payloads: decode ([[decodeJpeg]])
    * -> dHash -> banded hamming self-join. Lossy decode noise is a few
    * units per pixel, far under a step-12 fixture's gradients, so
    * perceptual equality survives the codec. */
  def jpegNearDups(
      media: DataFrame, idCol: String, dataCol: String,
      maxHamming: Int = 0, maxPerBucket: Long = 1L << 14): DataFrame = {
    val decoded = media.select(col(idCol).as("id"),
        images.jpeg_decode(col(dataCol)).as("m"))
      .where(col("m").isNotNull)
      .select(col("id"), col("m.pixels").as("pixels"),
        col("m.width").as("width"), col("m.height").as("height"))
    dhashNearDups(decoded, "id", "pixels", "width", "height", maxHamming,
      maxPerBucket)
  }

  /** Near-duplicate AUDIO clips by loudness-envelope fingerprint: the
    * same banded hamming join as [[dhashNearDups]], over
    * [[graft.functions.AudioBytesUtil.audioFingerprint]] of real PCM WAV
    * payloads — RIFF walk + sample reads in codegen, 16-byte signature
    * rows into the join, sample buffers never leave their partition.
    * Undecodable (non-PCM, truncated-below-minimum) clips are skipped.
    * Returns (id_a, id_b, fp_a, fp_b, hamming). */
  def audioNearDups(
      media: DataFrame, idCol: String, dataCol: String,
      maxHamming: Int = 0, maxPerBucket: Long = 1L << 14): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0 (got $maxHamming)")
    val sigs = media.select(col(idCol).as("id"),
        images.audio_fingerprint(col(dataCol)).as("sig"))
      .where(col("sig").isNotNull)
      .localCheckpoint(false)
    hammingBandPairs(sigs, maxHamming, "fp", maxPerBucket)
  }

  /** Banded dHash signature rows (id, sig, band_idx, band_val) — the
    * PERSISTABLE near-dup index of the incremental media path: write it
    * once per corpus and probe it with each new batch instead of
    * re-hashing the world ([[deltaDhashNearDups]]). 32 bytes a row, no
    * pixels. */
  def dhashBandSignatures(
      media: DataFrame, idCol: String, dataCol: String,
      wCol: String, hCol: String): DataFrame =
    bandSignatures(media.select(col(idCol).as("id"),
      dhash(col(dataCol), col(wCol), col(hCol)).as("sig")))

  /** Banded AUDIO signature rows (id, sig, band_idx, band_val) over the
    * loudness-envelope fingerprint of PCM WAV payloads — the audio twin
    * of [[dhashBandSignatures]], feeding the same persisted-index
    * incremental/streaming dedup machinery. */
  def audioBandSignatures(
      media: DataFrame, idCol: String, dataCol: String): DataFrame =
    bandSignatures(media.select(col(idCol).as("id"),
      images.audio_fingerprint(col(dataCol)).as("sig")))

  private def bandSignatures(sigs: DataFrame): DataFrame =
    sigs.where(col("sig").isNotNull)
      .select(col("id"), col("sig"),
        posexplode(array((0 until 4).map(b => band(col("sig"), b)): _*))
          .as(Seq("band_idx", "band_val")))

  /** Incremental perceptual near-dup: pair each NEW image against the
    * accumulated banded index ([[dhashBandSignatures]] rows) and the rest
    * of its own batch, without touching old-vs-old pairs — the media
    * mirror of [[Dedup.deltaNearDups]]. A re-ingested id replaces its old
    * signature (updated artwork re-pairs against the current hash, and a
    * pair is never built against a stale one). Buckets the delta does not
    * touch are pruned with a semi join BEFORE the hot-bucket cap and the
    * pair join, so each batch's cost scales with the delta, not the
    * corpus. Returns (id_a, id_b, hamming), id_a < id_b, each pair
    * emitted in exactly one batch — the one where its later member
    * arrives (a re-ingested id may re-emit its pairs against the
    * UPDATED hash, the desired behavior). */
  def deltaDhashNearDups(
      newMedia: DataFrame, idCol: String, dataCol: String,
      wCol: String, hCol: String,
      oldSigs: DataFrame, maxHamming: Int = 0,
      maxPerBucket: Long = 1L << 14): DataFrame =
    deltaDhashNearDupsFromSigs(
      dhashBandSignatures(newMedia, idCol, dataCol, wCol, hCol)
        .localCheckpoint(false),
      oldSigs, maxHamming, maxPerBucket)

  /** [[deltaDhashNearDups]] over PRE-COMPUTED banded signatures of the new
    * batch ([[dhashBandSignatures]] rows, materialized by the caller) — the
    * entry the streaming sink uses so each payload is decoded exactly once
    * per batch: the same signature frame feeds the pair join here and the
    * index append afterwards. */
  def deltaDhashNearDupsFromSigs(
      newSigs: DataFrame, oldSigs: DataFrame, maxHamming: Int = 0,
      maxPerBucket: Long = 1L << 14): DataFrame = {
    val newIds = newSigs.select("id").distinct()
    val oldLive = oldSigs.join(newIds, Seq("id"), "left_anti")
    val all = newSigs.withColumn("is_new", lit(true))
      .unionByName(oldLive.withColumn("is_new", lit(false)))
    val touched = all.join(
      newSigs.select("band_idx", "band_val").distinct(),
      Seq("band_idx", "band_val"), "left_semi")
    // materialized: capBucketDf reads its input twice (hot-key agg +
    // anti-join) and the self-join reads it twice more — without the
    // checkpoint the index read + union + prune lineage runs 4x
    val capped = Dedup.capBucketDf(
      touched, Seq("band_idx", "band_val"), maxPerBucket)
      .localCheckpoint(false)
    val a = capped.select(col("id").as("id_a"), col("sig").as("dhash_a"),
      col("band_idx"), col("band_val"), col("is_new").as("new_a"))
    val b = capped.select(col("id").as("id_b"), col("sig").as("dhash_b"),
      col("band_idx"), col("band_val"), col("is_new").as("new_b"))
    // pair dedup is a grouped aggregation, NOT the firstSharedBand
    // predicate: under the hot-bucket cap a pair's first shared band may
    // be exactly the dropped bucket, and the predicate would then reject
    // the pair's surviving later-band rows too — losing a pair that WAS
    // discoverable. The aggregate shuffles only 20-byte candidate rows.
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b") && (col("new_a") || col("new_b")))
      .withColumn("hamming",
        bit_count(col("dhash_a").bitwiseXOR(col("dhash_b"))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b")
      .agg(min("hamming").as("hamming"))
  }

  /** Keyframe selection by perceptual change: dHash each frame, compare
    * consecutive frames' hashes per video (lag window), and keep frames
    * whose hamming delta from the previous frame is >= `minDelta` (shot
    * boundaries / content changes) plus every video's first frame. The
    * decode+hash is map-side; the window shuffles 16-byte
    * (vid, idx, hash) rows partitioned by video — frame bytes never
    * leave their input partition. Returns
    * (media_id, frame_idx, dhash, delta) with delta null on first
    * frames. */
  def keyframes(
      frames: DataFrame, idCol: String, idxCol: String, frameCol: String,
      w: Int, h: Int, minDelta: Int): DataFrame =
    keyframesFromSigs(frames.select(col(idCol).as("media_id"),
      col(idxCol).cast("long").as("frame_idx"),
      dhash(col(frameCol), lit(w), lit(h)).as("dhash")), minDelta)

  private def keyframesFromSigs(sigs: DataFrame, minDelta: Int): DataFrame = {
    require(minDelta >= 1, s"minDelta must be >= 1 (got $minDelta)")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    sigs.where(col("dhash").isNotNull)
      .withColumn("delta",
        bit_count(col("dhash").bitwiseXOR(
          lag(col("dhash"), 1).over(win))).cast("int"))
      .where(col("delta").isNull || col("delta") >= minDelta)
  }

  /** Explode a (possibly animated) GIF payload into one row per frame:
    * (media_id, frame_idx, width, height, frame) with palette-resolved
    * luma pixels — the real-payload feeder for [[keyframes]] /
    * [[videoNearDups]]. The LZW decode runs once per payload inside
    * whole-stage codegen; undecodable payloads yield no rows. */
  def gifFrames(media: DataFrame, idCol: String, dataCol: String): DataFrame =
    media.select(col(idCol).as("media_id"),
        posexplode(images.gif_frames(col(dataCol)))
          .as(Seq("frame_idx", "f")))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("f.width").as("width"), col("f.height").as("height"),
        col("f.pixels").as("frame"))

  /** [[keyframes]] directly over ANIMATED GIF payloads: decode every
    * frame ([[gifFrames]]), dHash each at its own descriptor dimensions,
    * keep shot boundaries (hamming delta >= `minDelta`) plus each
    * animation's first frame. Payload bytes never leave their input
    * partition; the window shuffles 16-byte signature rows. */
  def gifKeyframes(media: DataFrame, idCol: String, dataCol: String,
      minDelta: Int): DataFrame =
    keyframesFromSigs(
      gifFrames(media, idCol, dataCol).select(col("media_id"),
        col("frame_idx"),
        dhash(col("frame"), col("width"), col("height")).as("dhash")),
      minDelta)

  /** Near-duplicate VIDEOS by shared frame fingerprints: `frames` rows
    * are (media_id, frame) — e.g. from [[sampleFrames]] — each frame a
    * raw `w x h` grayscale buffer. Every frame gets a dHash; videos pair
    * when they share at least `minShared` distinct frame hashes (the
    * shot-level containment test that survives re-encodes, trims, and
    * per-frame noise).
    *
    * Scale shape: the join key is the 8-byte frame hash, so candidate
    * generation never touches pixels, and `maxPerHash` drops boilerplate
    * frames (intros/outros shared by thousands of videos) before they
    * explode the pair space — the same hot-bucket cap discipline as the
    * text near-dup family ([[Dedup.capBucketDf]]); dropped hashes can
    * only LOWER n_shared, never invent pairs.
    *
    * Returns (id_a, id_b, n_shared) with id_a < id_b. */
  def videoNearDups(
      frames: DataFrame, idCol: String, frameCol: String,
      w: Int, h: Int, minShared: Int,
      maxPerHash: Long = 1L << 14): DataFrame =
    videoNearDupsFromSigs(frames.select(col(idCol).as("vid"),
      dhash(col(frameCol), lit(w), lit(h)).as("fh")), minShared, maxPerHash)

  /** [[videoNearDups]] directly over ANIMATED GIF payloads: every frame
    * decoded ([[gifFrames]]) and dHashed at its own dimensions, videos
    * paired on >= `minShared` shared frame hashes. */
  def gifVideoNearDups(media: DataFrame, idCol: String, dataCol: String,
      minShared: Int, maxPerHash: Long = 1L << 14): DataFrame =
    videoNearDupsFromSigs(
      gifFrames(media, idCol, dataCol).select(col("media_id").as("vid"),
        dhash(col("frame"), col("width"), col("height")).as("fh")),
      minShared, maxPerHash)

  private def videoNearDupsFromSigs(raw: DataFrame, minShared: Int,
      maxPerHash: Long): DataFrame = {
    val sigs = raw
      .where(col("fh").isNotNull)
      .distinct()
      // materialized: the cap + self-join below read sigs four times,
      // and each read would otherwise re-hash every frame buffer
      .localCheckpoint(false)
    val capped = Dedup.capBucketDf(sigs, Seq("fh"), maxPerHash)
    val a = capped.select(col("vid").as("id_a"), col("fh"))
    val b = capped.select(col("vid").as("id_b"), col("fh"))
    a.join(b, Seq("fh"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Fixture builder: a minimal standards-layout PNG byte stream (real
    * signature + IHDR chunk) for the given dimensions and color type,
    * assembled with column ops (int -> big-endian bytes via
    * unhex(lpad(hex(...)))). The pixel data chunk is an empty IDAT —
    * header parsing never reads it. */
  def pngBytes(w: Column, h: Column, colorType: Column): Column = {
    def be4(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
    def be1(c: Column): Column = unhex(lpad(hex(c), 2, "0"))
    concat(
      unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D")), lit("IHDR").cast("binary"),
      be4(w), be4(h),
      be1(lit(8)), be1(colorType), // bit depth 8, color type
      unhex(lit("000000")), // compression, filter, interlace
      unhex(lit("00000000")), // (unchecked) IHDR crc
      unhex(lit("0000000049444154"))) // empty IDAT
  }

  /** Fixture builder: a GIF89a logical screen descriptor — version
    * signature then width/height as little-endian u16, a global-color-
    * table flag byte, and a trailer. Header parsing reads only the first
    * 10 bytes. */
  def gifBytes(w: Column, h: Column): Column = {
    def le2(c: Column): Column =
      concat(unhex(lpad(hex(pmod(c, lit(256))), 2, "0")),
        unhex(lpad(hex(floor(c / 256).cast("long")), 2, "0")))
    concat(lit("GIF89a").cast("binary"), le2(w), le2(h),
      unhex(lit("F7000000003B"))) // GCT flags, bg, aspect, trailer
  }

  /** Fixture builder: a BMP file header + BITMAPINFOHEADER — "BM",
    * file-size/reserved/offset placeholders, the 40-byte DIB header with
    * little-endian width (i32), height (i32, negated when `topDown` to
    * exercise the abs), planes, and bit count. */
  def bmpBytes(w: Column, h: Column, bits: Column, topDown: Column): Column = {
    def leByte(c: Column, k: Int): Column =
      unhex(lpad(hex(pmod(floor(c / math.pow(256, k).toLong).cast("long"),
        lit(256L))), 2, "0"))
    def le2(c: Column): Column = concat(leByte(c, 0), leByte(c, 1))
    def le4(c: Column): Column =
      concat(leByte(c, 0), leByte(c, 1), leByte(c, 2), leByte(c, 3))
    val hField = when(topDown, lit(4294967296L) - h).otherwise(h) // two's complement i32
    concat(lit("BM").cast("binary"),
      unhex(lit("0000000000000000" + "36000000")), // size/reserved/offset
      unhex(lit("28000000")), // DIB header size 40
      le4(w), le4(hField),
      le2(lit(1)), le2(bits),
      unhex(lit("00" * 24))) // compression..colors-important
  }

  /** Fixture builder: a standards-layout ISO-BMFF (MP4) header — `ftyp`
    * (brand), then a `moov` box carrying a v0 `mvhd` (timescale,
    * duration), a video `trak` (v0 `tkhd` with 16.16 dimensions,
    * `mdia/hdlr` = 'vide', `mdia/minf/stbl/stsd` first-entry codec
    * fourcc) and, when `withAudio`, a second `trak` with handler 'soun'.
    * All box sizes are layout constants; only the field values vary, so
    * an oracle stays closed-form. No media data — header parsing never
    * reads it. */
  def mp4Bytes(brand: Column, timescale: Column, duration: Column,
      w: Column, h: Column, videoCodec: Column, withAudio: Column,
      audioCodec: Column): Column = {
    def be4(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
    def be2(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
    val matrix = "00010000000000000000000000000000" +
      "00010000000000000000000000000000" + "40000000"
    def tkhd(trackId: Int, volume: String, ww: Column, hh: Column) =
      concat(unhex(lit("0000005C746B6864" + "00000001" +
        "0000000000000000" + "%08x".format(trackId) + "00000000")),
        be4(duration),
        unhex(lit("0000000000000000" + "0000" + "0000" + volume + "0000" +
          matrix)),
        be2(ww), unhex(lit("0000")), be2(hh), unhex(lit("0000")))
    def mdia(handler: String, codec: Column) = concat(
      unhex(lit("000000516D646961" +
        // hdlr: fullbox + pre_defined then handler fourcc + reserved+name
        "0000002168646C72" + "00000000" + "00000000")),
      lit(handler).cast("binary"),
      unhex(lit("00000000000000000000000000" + // 12 reserved + name NUL
        "000000286D696E66" + "000000207374626C" +
        "0000001873747364" + "00000000" + "00000001" + "00000008")),
      codec.cast("binary"))
    val vTrak = concat(unhex(lit("000000B57472616B")),
      tkhd(1, "0000", w, h), mdia("vide", videoCodec))
    val aTrak = concat(unhex(lit("000000B57472616B")),
      tkhd(2, "0100", lit(0), lit(0)), mdia("soun", audioCodec))
    val mvhd = concat(
      unhex(lit("0000006C6D766864" + "00000000" +
        "00000000" + "00000000")),
      be4(timescale), be4(duration),
      unhex(lit("00010000" + "01000000" + "0000000000000000" + matrix +
        "0" * 48 + "00000002")))
    val ftyp = concat(unhex(lit("0000001066747970")),
      brand.cast("binary"), unhex(lit("00000000")))
    concat(ftyp,
      when(withAudio,
        concat(unhex(lit("000001DE6D6F6F76")), mvhd, vTrak, aTrak))
        .otherwise(concat(unhex(lit("000001296D6F6F76")), mvhd, vTrak)))
  }

  /** Fixture builder: a standards-layout AVI header — RIFF/`AVI ` with a
    * `hdrl` LIST carrying the `avih` main header (frame period, total
    * frames, stream count, dimensions) and one `strl`/`strh` per stream:
    * a 'vids' stream with a printable handler fourcc and, when
    * `withAudio`, an 'auds' stream whose handler is the NUMERIC code
    * real encoders write (non-printable, so audio_codec parses to null).
    */
  def aviBytes(usPerFrame: Column, totalFrames: Column, w: Column,
      h: Column, videoHandler: Column, withAudio: Column): Column = {
    def leByte(c: Column, k: Int): Column =
      unhex(lpad(hex(pmod(floor(c / math.pow(256, k).toLong).cast("long"),
        lit(256L))), 2, "0"))
    def le4(c: Column): Column =
      concat(leByte(c, 0), leByte(c, 1), leByte(c, 2), leByte(c, 3))
    val streams = when(withAudio, lit(2)).otherwise(lit(1))
    val avih = concat(unhex(lit("6176696838000000")), le4(usPerFrame),
      unhex(lit("00" * 12)), le4(totalFrames), unhex(lit("00000000")),
      le4(streams), unhex(lit("00000000")), le4(w), le4(h),
      unhex(lit("00" * 16)))
    val vStrl = concat(unhex(lit("4C49535444000000" + "7374726C" +
      "7374726838000000" + "76696473")), // LIST(68) strl, strh(56), vids
      videoHandler.cast("binary"), unhex(lit("00" * 48)))
    val aStrl = unhex(lit("4C49535444000000" + "7374726C" +
      "7374726838000000" + "61756473" + "01000000" + "00" * 48))
    concat(lit("RIFF").cast("binary"),
      when(withAudio, unhex(lit("E8000000"))).otherwise(unhex(lit("9C000000"))),
      lit("AVI ").cast("binary"), lit("LIST").cast("binary"),
      when(withAudio, unhex(lit("DC000000"))).otherwise(unhex(lit("90000000"))),
      lit("hdrl").cast("binary"), avih, vStrl,
      when(withAudio, aStrl).otherwise(unhex(lit(""))))
  }

  /** Video/audio container metadata from the payload's leading bytes:
    * struct(format, brand, duration_ms, width, height, n_tracks,
    * video_codec, audio_codec) for ISO-BMFF (MP4/MOV) and RIFF AVI —
    * same codegen'd byte-math family as [[imageMeta]]; see
    * [[graft.functions.ContainerBytesUtil]]. */
  def containerMeta(data: Column): Column = images.container_meta(data)

  /** Fixture builder: a minimal JPEG byte stream — SOI, optionally an
    * APP0/JFIF segment (so the marker scan is exercised), then an SOF0
    * frame header for the given dimensions and component count. */
  def jpegBytes(
      w: Column, h: Column, nComp: Column, withApp0: Column): Column = {
    def be2(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
    def be1(c: Column): Column = unhex(lpad(hex(c), 2, "0"))
    val app0 = when(withApp0,
      concat(unhex(lit("FFE00010")), lit("JFIF").cast("binary"),
        unhex(lit("00010100000100010000")))) // JFIF\0 + 10 bytes = 14 payload
      .otherwise(unhex(lit("")))
    concat(
      unhex(lit("FFD8")), app0,
      unhex(lit("FFC0")), be2(nComp * 3 + 8), be1(lit(8)),
      be2(h), be2(w), be1(nComp),
      // per-component (id, sampling, qtable) triples then EOI
      when(nComp === 1, unhex(lit("011100")))
        .otherwise(unhex(lit("012200021101031101"))),
      unhex(lit("FFD9")))
  }

  /** Typed features for a HETEROGENEOUS media corpus in ONE codegen'd
    * projection: detect the container from the leading bytes, decode
    * with the matching real codec, and emit
    * (id, format, width, height, channels, sample_rate, n_samples, sig,
    * n_bytes) — `sig` is the perceptual signature (image dHash or audio
    * loudness-envelope hash), null alongside the other fields when the
    * payload is unrecognized/undecodable. The when-chain keeps every
    * decode conditional, so each row pays only its own format's decode;
    * payload bytes never leave the projection. This is the REAL form of
    * the batched decode seam ([[extractFeatures]] keeps the stub shape
    * for formats that need an external codec). */
  def mediaFeatures(
      media: DataFrame, idCol: String, dataCol: String): DataFrame = {
    val d = col(dataCol)
    val im = images.image_meta(d)
    val am = images.audio_meta(d)
    val cm = images.container_meta(d)
    val png = images.png_decode(d)
    val jpg = images.jpeg_decode(d)
    val bmp = images.bmp_decode(d)
    val gif = images.gif_decode(d)
    media.select(
      col(idCol).as("id"),
      when(im.isNotNull, im.getField("format"))
        .when(am.isNotNull, am.getField("format"))
        .when(cm.isNotNull, cm.getField("format")).as("format"),
      when(im.isNotNull, im.getField("width"))
        .when(cm.isNotNull && cm.getField("width") >= 0,
          cm.getField("width")).as("width"),
      when(im.isNotNull, im.getField("height"))
        .when(cm.isNotNull && cm.getField("height") >= 0,
          cm.getField("height")).as("height"),
      when(im.isNotNull, im.getField("channels"))
        .when(am.isNotNull, am.getField("channels")).as("channels"),
      am.getField("sample_rate").as("sample_rate"),
      am.getField("n_samples").as("n_samples"),
      when(png.isNotNull,
          dhash(png.getField("pixels"), png.getField("width"),
            png.getField("height")))
        .when(jpg.isNotNull,
          dhash(jpg.getField("pixels"), jpg.getField("width"),
            jpg.getField("height")))
        .when(bmp.isNotNull,
          dhash(bmp.getField("pixels"), bmp.getField("width"),
            bmp.getField("height")))
        .when(gif.isNotNull,
          dhash(gif.getField("pixels"), gif.getField("width"),
            gif.getField("height")))
        .when(am.isNotNull, images.audio_fingerprint(d)).as("sig"),
      length(d).cast("long").as("n_bytes"))
  }

  final case class MediaRow(
      media_id: Long, kind: String, data: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, feature: Array[Float])

  /** STUB decode: a real implementation binds an image/audio codec here.
    * Deterministic: checksum = polynomial byte hash; feature = 8 bucketed
    * byte-histogram fractions. */
  private[operators] def decodeStub(row: MediaRow): MediaFeatures = {
    var acc = 0L
    val hist = new Array[Long](8)
    var i = 0
    while (i < row.data.length) {
      val b = row.data(i) & 0xff
      acc = (acc * 31 + b) % 1000000007L
      hist(b >> 5) += 1
      i += 1
    }
    val n = math.max(1, row.data.length).toFloat
    MediaFeatures(row.media_id, row.kind, row.data.length.toLong, acc,
      hist.map(_ / n))
  }

  /** Batched per-partition decode/feature-extract pass (the Scala analog of
    * a pandas-UDF mapInPandas stage): payload stays partition-local, output
    * is the small feature row. */
  def extractFeatures(media: Dataset[MediaRow], partitions: Int = 0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val repart = if (partitions > 0) media.repartition(partitions, col("media_id"))
      else media.repartition(col("media_id"))
    repart.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling for video-like payloads: every `stride`-th fixed-size
    * window of the payload becomes one frame row (media_id, frame_idx,
    * frame bytes). Pure column ops — the explode happens before any decode
    * so Catalyst prunes unneeded frames when a downstream filter selects
    * frame_idx ranges. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col("data")) / (frameBytes * stride)).cast("int")
    media
      .withColumn("frame_idx", explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .withColumn("frame",
        expr(s"substring(data, frame_idx * $frameBytes * $stride + 1, $frameBytes)"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame"))
  }

  /** Fixture builder: a standards-layout WAV byte stream — RIFF/WAVE,
    * optionally a LIST chunk with an ODD size (exercising the RIFF pad
    * byte in the scan), the 16-byte PCM `fmt ` chunk, and a `data` chunk
    * header whose declared size encodes `nSamples` (the parser reads
    * sizes, not payload). All multi-byte fields little-endian per RIFF. */
  def wavBytes(
      sampleRate: Column, channels: Column, bits: Column,
      nSamples: Column, withList: Column): Column = {
    def leByte(c: Column, k: Int): Column =
      unhex(lpad(hex(pmod(floor(c / math.pow(256, k).toLong).cast("long"),
        lit(256L))), 2, "0"))
    def le2(c: Column): Column = concat(leByte(c, 0), leByte(c, 1))
    def le4(c: Column): Column =
      concat(leByte(c, 0), leByte(c, 1), leByte(c, 2), leByte(c, 3))
    val blockAlign = (channels * bits / 8).cast("long")
    val dataSize = nSamples * blockAlign
    val list = when(withList,
      concat(lit("LIST").cast("binary"), unhex(lit("03000000")),
        unhex(lit("61626300")))) // 3 payload bytes + 1 pad byte
      .otherwise(unhex(lit("")))
    concat(
      lit("RIFF").cast("binary"), le4(dataSize + 36),
      lit("WAVE").cast("binary"),
      list,
      lit("fmt ").cast("binary"), unhex(lit("10000000")),
      le2(lit(1)), le2(channels), le4(sampleRate),
      le4(sampleRate * blockAlign), le2(blockAlign), le2(bits),
      lit("data").cast("binary"), le4(dataSize))
  }

  /** Deterministic synthetic media corpus from the documents table — the
    * bytes of each text become the opaque payload (UTF-8), so the plumbing
    * is testable at every SF without real codecs. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("data"),
      (col("doc_id") % 640).cast("int").as("width"),
      (col("doc_id") % 480).cast("int").as("height"),
      lit(16000).as("sample_rate"),
    ).as[MediaRow]
  }
}
