package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ContainerBytesUtil
import graft.operators.Multimodal

/** MP4 (ISO-BMFF) / AVI (RIFF) container-metadata kernel: planted
  * standards-layout headers parse to exact values; v1 (64-bit) movie and
  * track headers, largesize and to-end-of-file boxes; the printable-
  * fourcc filter on stream handlers; and hostile-input hardening —
  * every prefix and every single-byte corruption of a valid payload must
  * parse to null or a partial row, never throw or loop. */
class ContainerSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("container-test")

  private case class Meta(format: String, brand: String, durationMs: Long,
      w: Int, h: Int, nTracks: Int, vCodec: String, aCodec: String)

  private def metaOf(d: Array[Byte]): Option[Meta] =
    Option(ContainerBytesUtil.containerMeta(d)).map { r =>
      Meta(r.getUTF8String(0).toString,
        if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
        r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5),
        if (r.isNullAt(6)) null else r.getUTF8String(6).toString,
        if (r.isNullAt(7)) null else r.getUTF8String(7).toString)
    }

  /** Collect the column-builder fixture's bytes for direct kernel use. */
  private def built(c: org.apache.spark.sql.Column): Array[Byte] = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("d")).collect().head.getAs[Array[Byte]](0)
  }

  private def mp4(withAudio: Boolean): Array[Byte] = built(
    Multimodal.mp4Bytes(lit("isom"), lit(500), lit(7200), lit(640),
      lit(360), lit("avc1"), lit(withAudio), lit("mp4a")))

  private def avi(withAudio: Boolean): Array[Byte] = built(
    Multimodal.aviBytes(lit(40000), lit(250), lit(320), lit(240),
      lit("MJPG"), lit(withAudio)))

  test("mp4: dual- and single-track fixtures parse exactly") {
    assert(metaOf(mp4(withAudio = true)).contains(
      Meta("mp4", "isom", 14400L, 640, 360, 2, "avc1", "mp4a")))
    assert(metaOf(mp4(withAudio = false)).contains(
      Meta("mp4", "isom", 14400L, 640, 360, 1, "avc1", null)))
  }

  test("avi: fixture parses; numeric audio handler filters to null codec") {
    assert(metaOf(avi(withAudio = true)).contains(
      Meta("avi", null, 10000L, 320, 240, 2, "MJPG", null)))
    assert(metaOf(avi(withAudio = false)).contains(
      Meta("avi", null, 10000L, 320, 240, 1, "MJPG", null)))
  }

  test("container_meta expression matches the kernel through codegen") {
    import spark.implicits._
    val rows = Seq(1L -> true, 2L -> false).toDF("id", "wa")
      .select(col("id"), Multimodal.containerMeta(Multimodal.mp4Bytes(
        lit("isom"), lit(250), lit(1000), lit(1920), lit(1080),
        lit("hev1"), col("wa"), lit("mp4a"))).as("m"))
      .select(col("id"), col("m.duration_ms"), col("m.width"),
        col("m.n_tracks"), col("m.audio_codec"))
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getInt(3), Option(r.getString(4)).orNull)).toSeq ==
      Seq((1L, 4000L, 1920, 2, "mp4a"), (2L, 4000L, 1920, 1, null)))
  }

  // hand-assembled v1 (64-bit) headers plus largesize / size-0 boxes —
  // layouts the column fixture builder intentionally does not produce
  private def be(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val content = parts.flatten.toArray
    be(content.length + 8L, 4) ++ typ.getBytes("US-ASCII") ++ content
  }

  test("mp4: v1 mvhd/tkhd, largesize and to-EOF boxes") {
    val matrix = new Array[Byte](36)
    val mvhdV1 = box("mvhd", Array[Byte](1, 0, 0, 0), be(0, 8), be(0, 8),
      be(600, 4), be(3000, 8), new Array[Byte](80))
    val tkhdV1 = box("tkhd", Array[Byte](1, 0, 0, 0), be(0, 8), be(0, 8),
      be(1, 4), be(0, 4), be(3000, 8), new Array[Byte](8),
      new Array[Byte](8), matrix, be(1280L << 16, 4), be(720L << 16, 4))
    val hdlr = box("hdlr", be(0, 4), be(0, 4),
      "vide".getBytes("US-ASCII"), new Array[Byte](13))
    val stsd = box("stsd", be(0, 4), be(1, 4), be(8, 4),
      "av01".getBytes("US-ASCII"))
    val trak = box("trak", tkhdV1,
      box("mdia", hdlr, box("minf", box("stbl", stsd))))
    val moov = box("moov", mvhdV1, trak)
    // a largesize 'free' box (size field 1 + 64-bit largesize, empty)
    // between ftyp and moov, and a size-0 mdat extending to EOF after
    val free = be(1, 4) ++ "free".getBytes("US-ASCII") ++ be(16, 8)
    val ftyp = box("ftyp", "iso6".getBytes("US-ASCII"), be(0, 4))
    val mdat = be(0, 4) ++ "mdat".getBytes("US-ASCII") ++ be(0xab, 1)
    val payload = ftyp ++ free ++ moov ++ mdat
    assert(metaOf(payload).contains(
      Meta("mp4", "iso6", 5000L, 1280, 720, 1, "av01", null)))
  }

  private case class Track(id: Int, handler: String, codec: String,
      durationMs: Long, timescale: Long, nSamples: Long, w: Int, h: Int)

  private def tracksOf(d: Array[Byte]): Option[Seq[Track]] =
    Option(ContainerBytesUtil.containerTracks(d)).map { arr =>
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 8)
        Track(r.getInt(0),
          if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
          if (r.isNullAt(2)) null else r.getUTF8String(2).toString,
          r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7))
      }
    }

  test("container_tracks: synth_mp4 per-track rows are exact for all seed classes") {
    // seeds covering each codec/timescale class and the no-audio branch
    for (seed <- Seq(0L, 1L, 2L, 5L, 123456L, 86399L, 999999L)) {
      val d = ContainerBytesUtil.synthMp4(seed, seed % 5 != 0)
      val vts = Array(200L, 500L, 1000L)((seed % 3).toInt)
      val vCodec = Seq("avc1", "hev1", "av01")((seed % 3).toInt)
      val video = Track(1, "vide", vCodec, (seed % 7200) * 1000 / vts, vts,
        seed % 1000 + 1, (seed % 1904 + 16).toInt, (seed % 1064 + 16).toInt)
      val audio = Track(2, "soun", "mp4a", seed % 3600, 8000L,
        seed % 500 + 1, 0, 0)
      val expect = if (seed % 5 != 0) Seq(video, audio) else Seq(video)
      assert(tracksOf(d).contains(expect), s"seed=$seed")
      // the flat parser agrees on the movie-level view of the same bytes
      val mts = Array(250L, 500L, 1000L)((seed % 3).toInt)
      assert(metaOf(d).contains(Meta("mp4", "isom",
        (seed % 86400) * 1000 / mts, (seed % 1904 + 16).toInt,
        (seed % 1064 + 16).toInt, if (seed % 5 != 0) 2 else 1, vCodec,
        if (seed % 5 != 0) "mp4a" else null)))
    }
  }

  test("container_tracks: AVI strh streams; zero scale/rate degrades to -1") {
    // the column fixture writes zeroed scale/rate/length words
    assert(tracksOf(avi(withAudio = true)).contains(Seq(
      Track(1, "vide", "MJPG", -1L, -1L, 0L, -1, -1),
      Track(2, "soun", null, -1L, -1L, 0L, -1, -1))))
    // hand-assembled strh with real scale/rate/length: 1001/30000, 900
    // frames -> 30030 ms; rate not a multiple of scale -> timescale -1
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val strh = "strh".getBytes("US-ASCII") ++ le(56, 4) ++
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
      new Array[Byte](12) ++ le(1001, 4) ++ le(30000, 4) ++ le(0, 4) ++
      le(900, 4) ++ new Array[Byte](20)
    val strl = "LIST".getBytes("US-ASCII") ++ le(strh.length + 4L, 4) ++
      "strl".getBytes("US-ASCII") ++ strh
    val avih = "avih".getBytes("US-ASCII") ++ le(56, 4) ++ new Array[Byte](56)
    val hdrlContent = "hdrl".getBytes("US-ASCII") ++ avih ++ strl
    val hdrl = "LIST".getBytes("US-ASCII") ++
      le(hdrlContent.length.toLong, 4) ++ hdrlContent
    val payload = "RIFF".getBytes("US-ASCII") ++
      le(hdrl.length + 4L, 4) ++ "AVI ".getBytes("US-ASCII") ++ hdrl
    assert(tracksOf(payload).contains(Seq(
      Track(1, "vide", "MJPG", 900L * 1001 * 1000 / 30000, -1L, 900L,
        -1, -1))))
  }

  test("container_tracks: expression explodes through codegen; SQL registered") {
    import spark.implicits._
    val rows = Seq(7L, 10L).toDF("seed")
      .select(col("seed"), explode(graft.functions.images.container_tracks(
        graft.functions.images.synth_mp4(col("seed"),
          col("seed") % 5 =!= 0))).as("t"))
      .select(col("seed"), col("t.track_id"), col("t.handler"),
        col("t.n_samples"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == Seq((7L, 1, "vide", 8L), (7L, 2, "soun", 8L),
      (10L, 1, "vide", 11L)))
    val n = spark.sql(
      "SELECT size(container_tracks(synth_mp4(CAST(3 AS BIGINT), true))) v")
      .collect().head.getInt(0)
    assert(n == 2)
  }

  test("container_tracks: hostile prefixes and flips never throw") {
    val payloads = Seq(ContainerBytesUtil.synthMp4(12345L, true),
      avi(withAudio = true))
    for (p <- payloads) {
      for (n <- 0 to p.length) tracksOf(p.take(n))
      for (i <- p.indices) {
        val c = p.clone()
        c(i) = (c(i) ^ 0xff).toByte
        tracksOf(c)
      }
    }
    assert(tracksOf(Array.empty[Byte]).isEmpty)
    assert(tracksOf("no container".getBytes("US-ASCII")).isEmpty)
  }

  test("hostile inputs: every prefix and single-byte flip parses without throwing") {
    val payloads = Seq(mp4(withAudio = true), avi(withAudio = true))
    for (p <- payloads) {
      for (n <- 0 to p.length)
        metaOf(p.take(n)) // must not throw or loop
      for (i <- p.indices) {
        val c = p.clone()
        c(i) = (c(i) ^ 0xff).toByte
        metaOf(c)
      }
    }
    // junk, empty, wrong-signature
    assert(metaOf(Array.empty[Byte]).isEmpty)
    assert(metaOf("not a container at all".getBytes("US-ASCII")).isEmpty)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      metaOf(junk)
    }
  }
}
