package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout control for scan pruning at scale: Z-order (Morton)
  * clustering.
  *
  * At 100 TB the cheapest scan is the one that never happens: parquet
  * row-group/file min-max stats prune reads, but only if the layout keeps
  * each file's value ranges NARROW on the filtered columns. A single-column
  * sort perfects pruning on that column and destroys it on every other;
  * interleaving the bits of two normalized sort keys (the Morton curve)
  * keeps files localized in BOTH dimensions, so 2-D box predicates (the
  * "customer X in January" shape) skip most files on either axis.
  *
  * Everything is engine-portable integer/bit arithmetic on codegen'd
  * built-ins: min-max scale to `bits` bits (the floor-of-double-division
  * is exact here — quotients are <= 2^bits, so one ulp is far below the
  * 1/denominator distance to the nearest integer), then an unrolled
  * bit-interleave. No UDF, no sort beyond the final range partition.
  */
object Layout {

  /** `c` min-max normalized to [0, 2^bits): floor((c - mn) / (mx - mn) *
    * (2^bits - 1)), 0 when the column is constant. Ratio-first (not
    * numerator * top, which overflows long for microsecond epochs): the
    * ratio is an IEEE double op both engines perform identically, and the
    * oracle mirrors the exact expression shape. */
  def norm(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val top = (1L << bits) - 1
    when(mx === mn, lit(0L))
      .otherwise(floor(
        (c.cast("long") - mn.cast("long")) /
          (mx.cast("long") - mn.cast("long")) * top).cast("long"))
  }

  /** Morton interleave of two `bits`-bit non-negative longs: a's bit i
    * lands at 2i+1, b's at 2i. Unrolled shift/mask/add chain (disjoint
    * bits, so + is |) — whole-stage-codegen friendly. */
  def interleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31] (got $bits)")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** N-column Morton interleave: column j's bit i lands at position
    * i*N + j (column 0 most significant within each bit group). The 2-ary
    * [[interleave]] is the N=2 case with (a, b) = (cols(0), cols(1)).
    * Total bits = N * bits must fit a long (<= 63). */
  def interleaveN(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.size >= 2, s"need >= 2 columns (got ${cols.size})")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols * $bits bits exceed a long")
    val n = cols.size
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c, i).bitwiseAND(lit(1L)),
      i * n + (n - 1 - j))).reduce(_ + _)
  }

  /** Cluster `df` on the N-dimensional Morton curve of `colNames` — the
    * multi-dim generalization of [[zorderBy]], same bounds-aggregate +
    * range-partition shape. Bits per dimension shrink as dimensions grow
    * (63 / N), which is the curve's real trade-off: more clustered
    * columns, coarser per-column locality. */
  def zorderByN(
      df: DataFrame, colNames: Seq[String], partitions: Int): DataFrame = {
    require(partitions > 0, s"partitions must be positive (got $partitions)")
    require(colNames.size >= 2, "need >= 2 columns")
    val bits = math.min(16, 63 / colNames.size)
    val aggs = colNames.zipWithIndex.flatMap { case (c, j) =>
      Seq(min(col(c).cast("long")).as(s"_mn_$j"),
        max(col(c).cast("long")).as(s"_mx_$j"))
    }
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val normed = colNames.zipWithIndex.map { case (c, j) =>
      norm(col(c), col(s"_mn_$j"), col(s"_mx_$j"), bits)
    }
    df.crossJoin(broadcast(bounds))
      .withColumn("z_value", interleaveN(normed, bits))
      .drop(colNames.indices.flatMap(j => Seq(s"_mn_$j", s"_mx_$j")): _*)
      .repartitionByRange(partitions, col("z_value"))
      .sortWithinPartitions("z_value")
  }

  /** Z-value of two numeric columns given their global bounds. */
  def zValue(
      a: Column, aMin: Column, aMax: Column,
      b: Column, bMin: Column, bMax: Column,
      bits: Int = 16): Column =
    interleave(norm(a, aMin, aMax, bits), norm(b, bMin, bMax, bits), bits)

  /** Cluster `df` on the Morton curve of (`colA`, `colB`): computes global
    * bounds (one tiny aggregate, broadcast back), range-partitions on the
    * z-value (sampled split points — a distributed sort, no single-task
    * stage), and sorts within partitions so parquet row-group stats are
    * tight too. Writing the result yields `partitions` files whose min-max
    * envelopes are narrow on BOTH columns (LayoutSpec measures the
    * pruning).
    *
    * Returns the input columns plus `z_value`. */
  def zorderBy(
      df: DataFrame, colA: String, colB: String,
      partitions: Int, bits: Int = 16): DataFrame = {
    require(partitions > 0, s"partitions must be positive (got $partitions)")
    val bounds = df.agg(
      min(col(colA).cast("long")).as("_a_min"),
      max(col(colA).cast("long")).as("_a_max"),
      min(col(colB).cast("long")).as("_b_min"),
      max(col(colB).cast("long")).as("_b_max"))
    df.crossJoin(broadcast(bounds))
      .withColumn("z_value", zValue(
        col(colA), col("_a_min"), col("_a_max"),
        col(colB), col("_b_min"), col("_b_max"), bits))
      .drop("_a_min", "_a_max", "_b_min", "_b_max")
      .repartitionByRange(partitions, col("z_value"))
      .sortWithinPartitions("z_value")
  }
}
