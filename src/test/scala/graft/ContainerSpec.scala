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
