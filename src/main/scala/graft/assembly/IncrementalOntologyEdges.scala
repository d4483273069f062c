package graft.assembly

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ontology-signature index — the delta-shaped form of
  * [[Refinement.ontologyRefinementEdges]]. The batch build joins every
  * statement's generalized signatures against every actual signature; at
  * 100 TB that is a corpus × corpus signature join per run. Here both
  * signature sides persist once, partitioned by signature hash (the probe
  * key, the [[graft.operators.Dedup]] band-index shape):
  *
  *   - o_sigs    (stype, sig, mk_hash): actual positional signatures;
  *   - o_gensigs (stype, gsig, mk_hash): each statement's generalized
  *     combinations, own-combo removed (the strictness/acyclicity rule of
  *     the batch build).
  *
  * A delta batch appends its rows behind first-wins-per-hash guards (each
  * guard reads only the shards the batch's OWN signatures map to, so a
  * replay heals without a full scan) and discovers new edges with two
  * pruned probes:
  *
  *   - batch gensigs vs stored actuals — the batch as DESC side;
  *   - batch actuals vs stored gensigs — the batch as ANC side;
  *
  * appending before probing makes batch-internal pairs fall out of either
  * probe. Probe volume is Σ over the batch's signatures of that
  * signature's corpus frequency — output-linear like the batch build
  * (every joined row IS an edge), but restricted to the delta.
  *
  * The returned edges feed [[IncrementalBelief.upsert]]'s `extraEdges`,
  * whose closure maintenance composes them with stored key-subset pairs
  * (ontology edges are where multi-hop composition genuinely arises).
  */
object IncrementalOntologyEdges {

  private val Shard = "shard"

  import ShardedStore.{exists, refreshed}

  private def sigShard(stype: Column, sig: Column, shards: Int): Column =
    pmod(xxhash64(stype, sig), lit(shards)).cast("int")

  private def shardsOf(df: DataFrame): Seq[Int] =
    df.select(Shard).distinct().collect().map(_.getInt(0)).toSeq

  private def inShards(c: Column, ss: Seq[Int]): Column =
    if (ss.isEmpty) lit(false) else c.isin(ss: _*)

  /** Append the batch's signatures and return its NEW refinement edges
    * (desc, anc). Inputs as [[Refinement.ontologyRefinementEdges]]:
    * `stmts` (mk_hash, stype), `agents` (mk_hash, ag_num, db_name,
    * db_id), `ontology` (desc, anc) direct isa/partof edges. Output is
    * recomputed deterministically on a replay — downstream closure
    * appends ([[IncrementalBelief]]) dedupe against their stored pairs.
    */
  def upsert(
      spark: SparkSession, stmts: DataFrame, agents: DataFrame,
      ontology: DataFrame, db: String, shards: Int): DataFrame = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val sigs = Refinement.signatures(stmts, agents, ontology)
      .localCheckpoint(false)
    val act = sigs.select(col("mk_hash"), col("stype"), col("sig"))
      .withColumn(Shard, sigShard(col("stype"), col("sig"), shards))
      .localCheckpoint(false)
    val gen = sigs.select(col("mk_hash"), col("stype"),
        explode(array_remove(col("gensigs"), col("sig"))).as("gsig"))
      .withColumn(Shard, sigShard(col("stype"), col("gsig"), shards))
      .localCheckpoint(false)

    // guards: a hash's rows live at the shards its own signatures map to,
    // which the batch recomputes — presence checks read just those shards
    val newAct =
      if (!exists(spark, db, "o_sigs")) act
      else act.join(
        refreshed(spark, db, "o_sigs")
          .filter(inShards(col(Shard), shardsOf(act)))
          .select("mk_hash").distinct(),
        Seq("mk_hash"), "left_anti")
    ShardedStore.append(spark, db, "o_sigs", newAct, Seq(Shard))
    val newGen =
      if (!exists(spark, db, "o_gensigs")) gen
      else gen.join(
        refreshed(spark, db, "o_gensigs")
          .filter(inShards(col(Shard), shardsOf(gen)))
          .select("mk_hash").distinct(),
        Seq("mk_hash"), "left_anti")
    ShardedStore.append(spark, db, "o_gensigs", newGen, Seq(Shard))

    // probes: batch-as-desc against stored actuals, batch-as-anc against
    // stored gensigs; both pruned to the batch's signature shards
    val descSide = refreshed(spark, db, "o_sigs")
      .filter(inShards(col(Shard), shardsOf(gen)))
      .select(col("stype"), col("sig").as("gsig"),
        col("mk_hash").as("anc"))
      .join(gen.select(col("stype"), col("gsig"),
        col("mk_hash").as("desc")), Seq("stype", "gsig"))
      .select("desc", "anc")
    val ancSide = refreshed(spark, db, "o_gensigs")
      .filter(inShards(col(Shard), shardsOf(act)))
      .select(col("stype"), col("gsig").as("sig"),
        col("mk_hash").as("desc"))
      .join(act.select(col("stype"), col("sig"),
        col("mk_hash").as("anc")), Seq("stype", "sig"))
      .select("desc", "anc")
    descSide.unionByName(ancSide)
      .filter(col("desc") =!= col("anc"))
      .distinct()
  }

  def reset(spark: SparkSession, db: String): Unit =
    ShardedStore.reset(spark, db)
}
