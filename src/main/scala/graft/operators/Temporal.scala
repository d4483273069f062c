package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in operator set lacks: backward as-of join and
  * point-in-interval range join.
  *
  * Neither is expressible as a plain equi-join, and the naive formulations
  * are scale killers (an inequality theta-join degenerates to
  * BroadcastNestedLoopJoin / a per-row scan of the other side). Both
  * operators here reduce to ONE hash shuffle plus sort — the shapes that
  * survive a 1000-executor cluster:
  *
  *   - `asofJoin` uses the union trick: tag both inputs, union them, and
  *     run a single `last(..., ignoreNulls)` window per key ordered by
  *     (ts, tag). No join node at all — one Exchange on the key, one sort.
  *   - `asofJoinBucketed` bounds the window partition size for hot keys:
  *     per-(key, time-bucket) windows seeded with a carry-in computed from
  *     bucket-level summaries (two cheap aggregations over ~#buckets rows
  *     per key). Same result, task size capped at one bucket's rows.
  *   - `rangeJoin` bins the time axis at the max interval width, explodes
  *     each interval into the (at most two) bins it overlaps, equi-joins
  *     points on the bin, and re-checks containment as a residual
  *     predicate. Candidate blowup is bounded by 2x the true matches.
  *
  * The reference engine exposes only equi-join chains (readonly views
  * joined on mk_hash / reading ids); these operators extend the engine for
  * event-shaped corpora (training-data telemetry, conversion analysis)
  * where "most recent fact at time t" and "points in window" are the
  * bread-and-butter access paths.
  */
object Temporal {

  /** Epoch micros of a timestamp-ish column. TIMESTAMP_NTZ (what parquet
    * DATE-less dumps read as) casts to TIMESTAMP first — an identity under
    * the engine's pinned UTC session. */
  private def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  private val K = "__asof_k"
  private val TS = "__asof_ts"
  private val LEFT = "__asof_is_left"
  private val TB = "__asof_tb"
  private val MATCH = "__asof_match"
  private val RTS = "asof_ts"

  /** Tagged union of left/right with a right-payload struct column.
    *
    * Right rows carry `MATCH` = struct(payload..., asof_ts); left rows
    * carry null. A single `last(MATCH, ignoreNulls)` over
    * (key ORDER BY ts, isLeft, tieBreak) then yields, on every left row,
    * the latest right row with `right.ts <= left.ts` — right rows sort
    * before left rows at equal ts, so the join is inclusive. The struct
    * (rather than per-column last_value) guarantees all payload fields
    * come from the SAME winning right row even when payload values are
    * legitimately null.
    */
  private def taggedUnion(
      left: DataFrame,
      leftKey: String,
      leftTs: String,
      right: DataFrame,
      rightKey: String,
      rightTs: String,
      payload: Seq[String],
      rightTieBreak: String): DataFrame = {
    val leftPart = left
      .withColumn(K, col(leftKey))
      .withColumn(TS, col(leftTs))
      .withColumn(LEFT, lit(1))
    val rightPart = right
      .select(
        col(rightKey).as(K),
        col(rightTs).as(TS),
        lit(0).as(LEFT),
        col(rightTieBreak).as(TB),
        struct(payload.map(col) :+ col(rightTs).as(RTS): _*).as(MATCH))
    leftPart.unionByName(rightPart, allowMissingColumns = true)
  }

  private def finish(
      afterWindow: DataFrame,
      leftCols: Seq[String],
      payload: Seq[String],
      toleranceUs: Option[Long],
      forward: Boolean = false): DataFrame = {
    val matched = toleranceUs match {
      case None => col(MATCH)
      case Some(tol) =>
        val age =
          if (forward) micros(col(MATCH)(RTS)) - micros(col(TS))
          else micros(col(TS)) - micros(col(MATCH)(RTS))
        when(age <= tol, col(MATCH))
    }
    afterWindow
      .where(col(LEFT) === 1)
      .withColumn(MATCH, matched)
      .select(
        leftCols.map(col) ++
          payload.map(p => col(MATCH)(p).as(p)) :+
          col(MATCH)(RTS).as(RTS): _*)
  }

  /** Backward as-of join: each left row gets the latest right row of the
    * same key with `right.ts <= left.ts` (ties on ts broken toward the
    * larger `rightTieBreak`), or nulls when none exists — left-outer
    * semantics. `toleranceUs` additionally nulls matches older than the
    * given age in microseconds.
    *
    * Output: every left column, then `payload` (from the matched right
    * row) and `asof_ts` (the matched right timestamp).
    *
    * Plan shape: ONE Exchange on the key + one sort; no join operator.
    * Skewed keys serialize into one task's sort — for bounded task sizes
    * under hot keys use [[asofJoinBucketed]].
    */
  def asofJoin(
      left: DataFrame,
      leftKey: String,
      leftTs: String,
      right: DataFrame,
      rightKey: String,
      rightTs: String,
      payload: Seq[String],
      rightTieBreak: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val unioned = taggedUnion(
      left, leftKey, leftTs, right, rightKey, rightTs, payload, rightTieBreak)
    val w = Window
      .partitionBy(K)
      .orderBy(col(TS).asc, col(LEFT).asc, col(TB).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    finish(
      unioned.withColumn(MATCH, last(col(MATCH), ignoreNulls = true).over(w)),
      left.columns.toSeq, payload, toleranceUs)
  }

  /** Forward as-of join — the time mirror of [[asofJoin]]: each left row
    * gets the EARLIEST right row of the same key with
    * `right.ts >= left.ts` (ties on ts broken toward the larger
    * `rightTieBreak`), or nulls when none exists. `toleranceUs` nulls
    * matches further than the given lead in microseconds. The "next
    * reading after the order" / "first response after the alert" shape;
    * identical plan (one Exchange, one sort, no join node) with the time
    * axis reversed.
    */
  def asofJoinForward(
      left: DataFrame,
      leftKey: String,
      leftTs: String,
      right: DataFrame,
      rightKey: String,
      rightTs: String,
      payload: Seq[String],
      rightTieBreak: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val unioned = taggedUnion(
      left, leftKey, leftTs, right, rightKey, rightTs, payload, rightTieBreak)
    val w = Window
      .partitionBy(K)
      .orderBy(col(TS).desc, col(LEFT).asc, col(TB).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    finish(
      unioned.withColumn(MATCH, last(col(MATCH), ignoreNulls = true).over(w)),
      left.columns.toSeq, payload, toleranceUs, forward = true)
  }

  /** Backward as-of join for a DIMENSION-SIZED right side: the right
    * table packs into per-key sorted arrays and BROADCASTS, so the fact
    * side is never shuffled at all — no Exchange, no sort, just a
    * broadcast hash join plus an array probe per row (the 100 TB
    * enrichment shape: a petabyte fact scan against a million-row
    * dimension keeps its scan partitioning end to end).
    *
    * Identical semantics to [[asofJoin]] (TemporalSpec asserts equality);
    * requires the whole packed right side to fit in a broadcast, and the
    * probe is linear in the matched key's right-row count — use the
    * shuffle variants when the right side is fact-sized.
    */
  def asofJoinBroadcast(
      left: DataFrame,
      leftKey: String,
      leftTs: String,
      right: DataFrame,
      rightKey: String,
      rightTs: String,
      payload: Seq[String],
      rightTieBreak: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    // array elements sort lexicographically by (rts, tie-break, payload):
    // the LAST element passing `rts <= ts` is the latest match, largest
    // tie-break — the same winner the window variant picks
    val packed = right
      .groupBy(col(rightKey).as(K))
      .agg(sort_array(collect_list(struct(
        col(rightTs).as(RTS),
        col(rightTieBreak).as(TB),
        struct(payload.map(col): _*).as("p")))).as("__arr"))
    val hits = filter(col("__arr"), x => x(RTS) <= col(leftTs))
    // `when` guard: ANSI element_at errors on an empty array
    val lastHit = when(size(hits) > 0, element_at(hits, -1))
    val matched = toleranceUs match {
      case None => lastHit
      case Some(tol) =>
        when(micros(col(leftTs)) - micros(lastHit(RTS)) <= tol, lastHit)
    }
    left
      .join(broadcast(packed), col(leftKey) === col(K), "left")
      .withColumn(MATCH, matched)
      .select(
        left.columns.map(col) ++
          payload.map(p => col(MATCH)("p")(p).as(p)) :+
          col(MATCH)(RTS).as(RTS): _*)
  }

  /** [[asofJoin]] with bounded window partitions: rows are windowed per
    * (key, `bucketUs`-wide time bucket) and each bucket is seeded with a
    * carry-in — the latest right row of any EARLIER bucket — computed from
    * per-bucket maxima. A key with a billion rows never sorts in one task;
    * the largest task holds one bucket of one key.
    *
    * Identical results to [[asofJoin]] (TemporalSpec asserts equality).
    */
  def asofJoinBucketed(
      left: DataFrame,
      leftKey: String,
      leftTs: String,
      right: DataFrame,
      rightKey: String,
      rightTs: String,
      payload: Seq[String],
      rightTieBreak: String,
      bucketUs: Long,
      toleranceUs: Option[Long] = None): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive (got $bucketUs)")
    val B = "__asof_bucket"
    val unioned = taggedUnion(
      left, leftKey, leftTs, right, rightKey, rightTs, payload, rightTieBreak)
      .withColumn(B, floor(micros(col(TS)) / bucketUs))

    // Latest right row per (key, bucket): an aggregation, not a window —
    // max_by over (ts, tieBreak) among right rows only.
    val perBucket = unioned
      .where(col(LEFT) === 0)
      .groupBy(col(K), col(B))
      .agg(max_by(
        col(MATCH),
        struct(col(TS), col(TB))).as("__bucket_last"))

    // Carry-in per (key, bucket), for EVERY active bucket — including
    // buckets holding only left rows, which inherit the latest right row
    // of any earlier bucket. Window over bucket-level rows — cardinality
    // is the number of active buckets per key, not the number of rows.
    val wB = Window
      .partitionBy(K)
      .orderBy(col(B).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = unioned
      .select(col(K), col(B)).distinct()
      .join(perBucket, Seq(K, B), "left")
      .withColumn(
        "__carry", last(col("__bucket_last"), ignoreNulls = true).over(wB))
      .select(col(K), col(B), col("__carry"))

    // Within-bucket window (bounded partition), seeded by the carry-in.
    val wIn = Window
      .partitionBy(K, B)
      .orderBy(col(TS).asc, col(LEFT).asc, col(TB).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seeded = unioned
      .join(carry, Seq(K, B), "left")
      .withColumn(
        MATCH,
        coalesce(
          last(col(MATCH), ignoreNulls = true).over(wIn),
          col("__carry")))
    finish(seeded, left.columns.toSeq, payload, toleranceUs)
  }

  /** Point-in-interval range join: pairs each point row with every
    * interval row whose `[startCol, endCol]` (inclusive) contains the
    * point's `pointTs`. Returns point columns + interval columns.
    *
    * `binUs` must be >= the longest interval: each interval then overlaps
    * at most two bins, so the bin equi-join produces at most
    * 2x-the-matches candidates, re-checked by the residual containment
    * predicate. The plan is a plain hash join on the bin —
    * shuffle-partitioned, AQE-skew-splittable — instead of the
    * O(|points| * |intervals|) nested-loop a raw inequality join compiles
    * to.
    *
    * `validate` (default true) checks the bin bound with a cheap
    * aggregation over the interval side BEFORE building the join — an
    * extra blocking pass that is fine for dimension-sized interval tables.
    * For fact-sized interval tables pass `validate = false`: results stay
    * exact either way (an interval explodes into ALL its bins), the bound
    * is purely the fan-out guarantee, so skipping it trades the guard rail
    * for one less pass over the data.
    */
  def rangeJoin(
      points: DataFrame,
      pointTs: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binUs: Long,
      validate: Boolean = true): DataFrame = {
    require(binUs > 0, s"binUs must be positive (got $binUs)")
    if (validate) {
      // null-safe read: an empty interval side aggregates to NULL, which
      // trivially satisfies the bound (the join is just empty)
      val row = intervals
        .agg(max(micros(col(endCol)) - micros(col(startCol))))
        .head
      val maxLen = if (row.isNullAt(0)) 0L else row.getLong(0)
      require(
        maxLen <= binUs,
        s"binUs ($binUs) must cover the longest interval ($maxLen us)")
    }

    val B = "__range_bin"
    val binnedPoints = points
      .withColumn(B, floor(micros(col(pointTs)) / binUs))
    // SHUFFLE_HASH (build = the exploded interval side): the bin key is
    // deliberately low-cardinality, so a broadcast hash join here would
    // concentrate the entire candidate fan-out (the real cost of a range
    // join) into the probe side's SCAN tasks — unsplittable by AQE and
    // single-task on small inputs. Shuffling both sides on the bin
    // spreads candidate generation over the full shuffle parallelism and
    // keeps hot bins AQE-skew-splittable; the shuffled bytes are the
    // pre-fan-out rows, the cheap side of the operator.
    val explodedIntervals = intervals
      .withColumn(
        B,
        explode(sequence(
          floor(micros(col(startCol)) / binUs),
          floor(micros(col(endCol)) / binUs))))
      .hint("shuffle_hash")
    binnedPoints
      .join(
        explodedIntervals,
        binnedPoints(B) === explodedIntervals(B) &&
          col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop(B)
  }

  /** Interval-overlap join: pairs each left interval `[lStart, lEnd]` with
    * every right interval `[rStart, rEnd]` that overlaps it (inclusive
    * endpoints). Returns left columns + right columns; the four interval
    * column names must be distinct across the two sides.
    *
    * Same binning idea as [[rangeJoin]], generalized: BOTH sides explode
    * into the bins they span and equi-join on the bin. A pair overlapping
    * across several shared bins would duplicate, so a pair is emitted ONLY
    * in the first bin both occupy — `floor(greatest(starts) / bin)`, which
    * the overlap predicate guarantees lies in both spans. Exact dedup with
    * no `distinct` shuffle. `binUs` is a perf knob, not a correctness one
    * (aim near the typical interval length: explode factor is
    * len/bin + 1 per row, candidate fan-out grows as bins widen).
    */
  def intervalJoin(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      binUs: Long): DataFrame = {
    require(binUs > 0, s"binUs must be positive (got $binUs)")
    val BL = "__iv_bin_l"
    val BR = "__iv_bin_r"
    def bins(s: String, e: String): Column =
      explode(sequence(
        floor(micros(col(s)) / binUs),
        floor(micros(col(e)) / binUs)))
    val lx = left.withColumn(BL, bins(lStart, lEnd))
    // same SHUFFLE_HASH rationale as [[rangeJoin]]: distribute the
    // candidate fan-out over shuffle partitions instead of the scan tasks
    val rx = right.withColumn(BR, bins(rStart, rEnd)).hint("shuffle_hash")
    lx.join(
        rx,
        col(BL) === col(BR) &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          col(BL) === floor(
            greatest(micros(col(lStart)), micros(col(rStart))) / binUs))
      .drop(BL, BR)
  }
}
