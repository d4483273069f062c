package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout
import graft.sources.Tables

/** What the z_value gate can't see: that the layout actually BUYS file
  * skipping. Writes the same table z-ordered and single-column-sorted,
  * reads back per-file min-max envelopes (what parquet pruning uses), and
  * compares how many files a predicate would have to scan.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("layout-test")
  val dir = "/root/testdata/sf0.001"

  test("interleave places a-bits at odd, b-bits at even positions") {
    val df = spark.range(1).select(
      Layout.interleave(lit(1L), lit(0L)).as("z10"),
      Layout.interleave(lit(0L), lit(1L)).as("z01"),
      Layout.interleave(lit(3L), lit(1L)).as("z31"),
      Layout.interleave(lit(65535L), lit(65535L)).as("zmax"))
    val r = df.collect().head
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 11L) // a=0b11 -> 0b1010, b=0b1 -> 0b01
    assert(r.getLong(3) == 0xFFFFFFFFL)
  }

  test("norm maps bounds to 0 and 2^bits-1, constant columns to 0") {
    val r = spark.range(1).select(
      Layout.norm(lit(10L), lit(10L), lit(20L), 16).as("lo"),
      Layout.norm(lit(20L), lit(10L), lit(20L), 16).as("hi"),
      Layout.norm(lit(7L), lit(7L), lit(7L), 16).as("const"))
      .collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 65535L && r.getLong(2) == 0L)
  }

  // per-file envelopes on the two clustered columns — the stats pruning sees
  private def envelopes(path: String): Array[(Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min("o_custkey").as("amn"), max("o_custkey").as("amx"),
        min("ts_sec").as("bmn"), max("ts_sec").as("bmx"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private def scanned(
      env: Array[(Long, Long, Long, Long)],
      a: Option[(Long, Long)], b: Option[(Long, Long)]): Double = {
    val hit = env.count { case (amn, amx, bmn, bmx) =>
      a.forall { case (lo, hi) => amx >= lo && amn <= hi } &&
        b.forall { case (lo, hi) => bmx >= lo && bmn <= hi }
    }
    hit.toDouble / env.length
  }

  test("z-order layout prunes on both dimensions; a 1-D sort only on its own") {
    val o = Tables.table(spark, dir, "orders")
      .withColumn("ts_sec", unix_timestamp(col("o_orderdate")))
      .select("o_orderkey", "o_custkey", "ts_sec")
    val tmp = Files.createTempDirectory("graft-layout").toString
    val zPath = s"$tmp/z"
    val aPath = s"$tmp/a"
    Layout.zorderBy(o, "o_custkey", "ts_sec", partitions = 64)
      .write.parquet(zPath)
    o.repartitionByRange(64, col("o_custkey"))
      .sortWithinPartitions("o_custkey").write.parquet(aPath)

    val zEnv = envelopes(zPath)
    val aEnv = envelopes(aPath)
    assert(zEnv.length >= 32 && aEnv.length >= 32)

    val Seq(aLo, aHi) = Seq(0.4, 0.65).map(q =>
      o.stat.approxQuantile("o_custkey", Array(q), 0.0).head.toLong)
    val Seq(bLo, bHi) = Seq(0.4, 0.65).map(q =>
      o.stat.approxQuantile("ts_sec", Array(q), 0.0).head.toLong)

    // the second dimension alone: the custkey sort is useless (every file
    // spans all dates), the z layout skips real files
    val zTime = scanned(zEnv, None, Some((bLo, bHi)))
    val aTime = scanned(aEnv, None, Some((bLo, bHi)))
    assert(aTime >= 0.9, s"custkey-sorted layout should scan ~all: $aTime")
    assert(zTime <= 0.6, s"z layout should skip time-only scans: $zTime")
    assert(zTime < aTime)

    // 2-D box: z prunes to a minority of files
    val zBox = scanned(zEnv, Some((aLo, aHi)), Some((bLo, bHi)))
    assert(zBox <= 0.4, s"z layout should skip most files for a box: $zBox")
  }
  test("interleaveN generalizes the pairwise interleave; 3-D layout localizes") {
    // N=2 agrees with the pairwise operator bit for bit
    val r = spark.range(1).select(
      Layout.interleave(lit(41L), lit(27L)).as("z2"),
      Layout.interleaveN(Seq(lit(41L), lit(27L))).as("zn"),
      Layout.interleaveN(Seq(lit(1L), lit(0L), lit(0L)), 1).as("a3"),
      Layout.interleaveN(Seq(lit(0L), lit(1L), lit(0L)), 1).as("b3"),
      Layout.interleaveN(Seq(lit(0L), lit(0L), lit(1L)), 1).as("c3"))
      .collect().head
    assert(r.getLong(0) == r.getLong(1))
    // one bit per column: col 0 most significant
    assert(r.getLong(2) == 4L && r.getLong(3) == 2L && r.getLong(4) == 1L)
    // bits bound enforced
    intercept[IllegalArgumentException] {
      Layout.interleaveN(Seq(lit(0L), lit(0L), lit(0L), lit(0L)), 16)
    }
    // 3-D layout: every dimension's per-file envelope is narrower than
    // the ingest-order layout's
    val o = Tables.table(spark, dir, "orders")
      .withColumn("ts_sec", unix_timestamp(col("o_orderdate")))
      .select(col("o_custkey"), col("ts_sec"),
        (col("o_totalprice").cast("long")).as("price"))
    val tmp = Files.createTempDirectory("graft-layout3").toString
    Layout.zorderByN(o, Seq("o_custkey", "ts_sec", "price"), 64)
      .write.parquet(s"$tmp/z3")
    val spans = spark.read.parquet(s"$tmp/z3")
      .groupBy(input_file_name())
      .agg(
        (max("o_custkey") - min("o_custkey")).as("sa"),
        (max("ts_sec") - min("ts_sec")).as("sb"),
        (max("price") - min("price")).as("sc"))
      .agg(avg("sa"), avg("sb"), avg("sc")).collect().head
    val full = o.agg(
      (max("o_custkey") - min("o_custkey")).cast("double"),
      (max("ts_sec") - min("ts_sec")).cast("double"),
      (max("price") - min("price")).cast("double")).collect().head
    // each dimension localized: average file span well under the full span
    assert(spans.getDouble(0) < full.getDouble(0) * 0.8)
    assert(spans.getDouble(1) < full.getDouble(1) * 0.8)
    assert(spans.getDouble(2) < full.getDouble(2) * 0.8)
  }
}
