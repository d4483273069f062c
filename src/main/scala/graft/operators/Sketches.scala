package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Bounded-memory frequency sketches beyond the count-min family
  * ([[TextAnalysis.cmsBuild]]): the Misra–Gries / space-saving heavy-hitters
  * summary, as a typed Spark `Aggregator` (a `TypedColumn`, per the
  * engine's extension ladder — the semantics are genuinely stateful
  * per-group, so neither built-ins nor a Catalyst scalar expression can
  * express them).
  *
  * Why it earns a place next to CMS: CMS answers "how often did THIS term
  * occur" but enumerating the frequent terms requires knowing them; MG
  * IS the enumerator — k counters that provably contain every term with
  * frequency > N/(k+1), with undercount at most N/(k+1). The buffers are
  * mergeable (Agarwal et al., "Mergeable Summaries", PODS'12: combine
  * counter sums, then subtract the (k+1)-th largest and drop non-positive)
  * with the SAME error bound after arbitrary merge trees — exactly the
  * contract Spark's partial aggregation needs: map-side partials of k
  * counters shuffle instead of rows, one k-sized buffer per partition.
  *
  * Counter VALUES depend on partitioning/merge order (only the bounds are
  * deterministic), so gates check guarantees — presence above threshold,
  * est <= true, true - est <= N/(k+1) — not raw sketch state
  * (SketchesSpec asserts them under 1-, 7-, and 32-way partitionings).
  */
object Sketches {

  /** Misra–Gries aggregator over a string stream; buffer = at most k
    * (term, counter) pairs. Kryo-encoded buffer (opaque binary between
    * partial and final aggregation); per-row cost O(1) on counter hit,
    * O(k) on eviction.
    */
  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
    require(k > 0, s"k must be positive (got $k)")

    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def reduce(
        b: mutable.HashMap[String, Long], t: String): mutable.HashMap[String, Long] = {
      b.get(t) match {
        case Some(c) => b.update(t, c + 1L)
        case None if b.size < k => b.update(t, 1L)
        case None =>
          // decrement-all: the arriving element and one unit of every
          // counter cancel; drop exhausted counters
          val dead = mutable.ArrayBuffer.empty[String]
          b.keysIterator.foreach { key =>
            val c = b(key) - 1L
            if (c == 0L) dead += key else b.update(key, c)
          }
          dead.foreach(b.remove)
      }
      b
    }

    def merge(
        a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
      if (a.size > k) {
        // subtract the (k+1)-th largest counter from everything; at most
        // k counters stay positive, and every counter loses <= what a
        // sequential decrement-all run would have taken (the mergeable-
        // summaries argument)
        val cut = a.values.toArray.sortInPlaceWith(_ > _).apply(k)
        val dead = mutable.ArrayBuffer.empty[String]
        a.keysIterator.foreach { key =>
          val c = a(key) - cut
          if (c <= 0L) dead += key else a.update(key, c)
        }
        dead.foreach(a.remove)
      }
      a
    }

    def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap

    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]

    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** The Misra–Gries summary of `termCol` as rows (term, est): at most k
    * rows; every term with true frequency > N/(k+1) is present, with
    * est <= true and true - est <= N/(k+1). */
  def misraGries(df: DataFrame, termCol: String, k: Int): DataFrame = {
    val ds = df.select(col(termCol).cast("string")).na.drop()
      .as(ExpressionEncoder[String]())
    ds.select(new MisraGriesAgg(k).toColumn.name("mg"))
      .select(explode(col("mg")).as(Seq("term", "est")))
  }

  /** Merge-side aggregator: folds PERSISTED Misra–Gries sketch columns
    * (map<string,long>) into one sketch per group, with the same k-counter
    * bound — the incremental convention: per-batch/per-shard sketches
    * persist as map columns and re-aggregate without touching rows again
    * (Agarwal et al. mergeable-summaries law: error bounds hold under any
    * merge tree). */
  final class MisraGriesMergeAgg(k: Int)
      extends Aggregator[Map[String, Long], mutable.HashMap[String, Long], Map[String, Long]] {
    private val inner = new MisraGriesAgg(k)
    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty
    def reduce(
        b: mutable.HashMap[String, Long],
        m: Map[String, Long]): mutable.HashMap[String, Long] =
      if (m == null) b else inner.merge(b, mutable.HashMap.from(m))
    def merge(
        a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
      inner.merge(a, b)
    def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap
    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Per-group Misra–Gries: one k-counter sketch per `keyCol` value, as
    * (key, mg map<string,long>) — the shape a pipeline over
    * sources/languages/shards actually wants (the global [[misraGries]]
    * funnels every partial into ONE final merge; here the final merge is
    * key-partitioned, so heavy-hitter state scales with group count, and
    * only k-sized buffers ever shuffle). */
  def misraGriesByKey(
      df: DataFrame, keyCol: String, termCol: String, k: Int): DataFrame = {
    val mg = udaf(new MisraGriesAgg(k), Encoders.STRING)
    df.select(col(keyCol).as("key"), col(termCol).cast("string").as("term"))
      .na.drop()
      .groupBy("key")
      .agg(mg(col("term")).as("mg"))
  }

  /** Fold persisted per-batch sketch columns into one sketch per key (see
    * [[MisraGriesMergeAgg]]): `sketches` rows are (keyCol, sketchCol:
    * map<string,long>) from prior [[misraGriesByKey]] runs. */
  def misraGriesMergeByKey(
      sketches: DataFrame, keyCol: String, sketchCol: String,
      k: Int): DataFrame = {
    val merge = udaf(new MisraGriesMergeAgg(k),
      ExpressionEncoder[Map[String, Long]]())
    sketches.select(col(keyCol).as("key"), col(sketchCol).as("sk"))
      .where(col("sk").isNotNull) // mirror misraGriesByKey's na.drop
      .groupBy("key")
      .agg(merge(col("sk")).as("mg"))
  }

  /** Per-group guarantee audit (the [[heavyHitters]] contract, key-wise):
    * for every key and every term provably findable WITHIN that key
    * (frequency strictly above N_key/(k+1)), report presence and bound
    * compliance. Deterministic TRUE/TRUE columns despite sketch-state
    * nondeterminism — the gate's oracle predicts them in closed form. */
  def heavyHittersByKey(
      df: DataFrame, keyCol: String, termCol: String, k: Int): DataFrame = {
    val terms = df
      .select(col(keyCol).as("key"), col(termCol).cast("string").as("term"))
      .na.drop()
    val est = misraGriesByKey(terms, "key", "term", k)
      .select(col("key"), explode(col("mg")).as(Seq("term", "est")))
    val exact = terms.groupBy("key", "term").agg(count(lit(1)).as("exact"))
    val total = terms.groupBy("key").agg(count(lit(1)).as("total"))
    exact.join(total, Seq("key"))
      .where(col("exact") * (k + 1) > col("total"))
      .join(est, Seq("key", "term"), "left")
      .select(col("key"), col("term"), col("exact"),
        col("est").isNotNull.as("found"),
        (col("est").isNotNull && col("est") <= col("exact") &&
          (col("exact") - col("est")) * (k + 1) <= col("total"))
          .as("within_bound"))
  }

  /** Mergeable distinct-count sketches: per-group HLL sketches
    * (datasketches `hll_sketch_agg`) folded into a corpus-wide estimate
    * with `hll_union_agg` — the incremental/partitioned form of
    * `approx_count_distinct`, where per-shard or per-day sketch columns
    * persist and re-aggregate without touching rows again. The union is
    * register-wise max, so merging per-group sketches costs essentially
    * nothing against sketching the whole stream directly — the union
    * path re-estimates from a wider register encoding, so the two
    * estimates can differ sub-percent (SketchesSpec pins the agreement).
    *
    * Returns one row: (estimate BIGINT, n_groups BIGINT). */
  def hllMergeEstimate(
      df: DataFrame, groupCol: String, valCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCol)
      .agg(hll_sketch_agg(col(valCol), lit(lgK)).as("sk"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("estimate"),
        count(lit(1)).cast("long").as("n_groups"))

  /** Guarantee audit of [[misraGries]] against the exact counts, for the
    * provably-findable terms only (true frequency strictly above
    * N/(k+1)): each comes back with whether the sketch held it and
    * whether the estimate respected both error bounds. Integer-only
    * comparisons (scaled by k+1) keep the verdicts engine-exact. */
  def heavyHitters(df: DataFrame, termCol: String, k: Int): DataFrame = {
    val terms = df.select(col(termCol).cast("string").as("term")).na.drop()
    val est = misraGries(terms, "term", k)
    val exact = terms.groupBy("term").agg(count(lit(1)).as("exact"))
    val total = terms.agg(count(lit(1)).as("total"))
    exact
      .crossJoin(broadcast(total))
      .where(col("exact") * (k + 1) > col("total"))
      .join(broadcast(est), Seq("term"), "left")
      .select(col("term"), col("exact"),
        col("est").isNotNull.as("found"),
        (col("est").isNotNull && col("est") <= col("exact") &&
          (col("exact") - col("est")) * (k + 1) <= col("total"))
          .as("within_bound"))
  }
}
