package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: batch shape, schema, determinism of the stubbed
  * decode, and frame sampling geometry.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("multimodal-test")
  val dir = "/root/testdata/sf0.001"

  def media = Multimodal.syntheticMedia(
    spark, Tables.table(spark, dir, "documents"))

  test("feature extraction: one row per media, 8-dim feature, fractions sum to ~1") {
    val feats = Multimodal.extractFeatures(media, partitions = 8).collect()
    assert(feats.length == media.count())
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(f => math.abs(f.feature.map(_.toDouble).sum - 1.0) < 1e-3))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, partitions = 4).collect()
    assert(feats.map(f => f.media_id -> f.checksum).toMap ==
      again.map(f => f.media_id -> f.checksum).toMap)
  }

  test("frame sampling: frame count and size follow payload length") {
    val frames = Multimodal.sampleFrames(media.toDF(), frameBytes = 16, stride = 2)
    val byMedia = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), max(length(col("frame"))).as("max_len"))
      .collect()
    assert(byMedia.forall(_.getInt(2) <= 16))
    val lens = media.select(col("media_id"), length(col("data")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byMedia.foreach { r =>
      val expect = math.max(1, lens(r.getLong(0)) / 32)
      assert(r.getLong(1) == expect, s"media ${r.getLong(0)}")
    }
  }
}
