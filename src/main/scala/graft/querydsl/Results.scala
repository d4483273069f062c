package graft.querydsl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.TypeRegistry

/** Result envelopes over a compiled hash query — the Spark analog of the
  * reference's StatementQueryResult / QueryResult family
  * (query.py:421-628, :630-711) and the interactions/relations/agents
  * two-phase plans (`_run_meta_sql`, query.py:845-856).
  */
object Results {

  /** Sorted/paged hash list (`_apply_limits`, query.py:858-868). ORDER BY +
    * LIMIT compiles to TakeOrderedAndProject — a distributed top-k, never a
    * global sort materialization. */
  def hashes(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      sortBy: String = "ev_count",
      limit: Int = 0,
      offset: Int = 0): DataFrame = {
    val sel = QueryCompiler.compile(q, ro, types)
      .orderBy(col(sortBy).desc, col("mk_hash").asc)
    val off = if (offset > 0) sel.offset(offset) else sel
    if (limit > 0) off.limit(limit) else off
  }

  /** Evidence rows for the selected statements, capped at `evLimit` per
    * statement. The reference uses a LATERAL join (query.py:486-495); the
    * canonical Spark rewrite is a row_number window partitioned by the hash.
    * Text-ref metadata attaches via an outer join on the reading id
    * (content join, query.py:492-517).
    */
  def statements(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      evLimit: Int = 10,
      evFilter: Option[EvFilter] = None): DataFrame = {
    val sel = QueryCompiler.compile(q, ro, types).select("mk_hash")
    val w = Window.partitionBy("mk_hash").orderBy(col("sid").asc)
    val evRows = ro.fastRawPaLink.join(sel, Seq("mk_hash"), "left_semi")
    // evidence filters run BEFORE the ev_limit window (query.py:476-490)
    evFilter.map(f => EvFilter(evRows, ro, f)).getOrElse(evRows)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= evLimit)
      .join(ro.readingRefLink, Seq("rid"), "left")
      .select(col("mk_hash"), col("sid"), col("src"), col("pmid"),
        col("rn").cast("long").as("rn"))
  }

  /** Per-hash interaction rows (InteractionSQL, query.py:92-127). */
  def interactions(q: StmtQuery, ro: ReadonlyTables, types: TypeRegistry): DataFrame = {
    val sel = QueryCompiler.compile(q, ro, types).select("mk_hash")
    ro.agentInteractions.join(sel, Seq("mk_hash"), "left_semi")
  }

  /** Grouped by (agent set, type): summed evidence, max belief, hash count
    * (RelationSQL agg, query.py:130-203). */
  def relations(q: StmtQuery, ro: ReadonlyTables, types: TypeRegistry): DataFrame =
    interactions(q, ro, types)
      .groupBy("agent_str", "type_num")
      .agg(
        sum("ev_count").as("total_ev"),
        max("belief").as("max_belief"),
        count(lit(1)).as("n_hashes"))

  /** Grouped by agent set only (AgentSQL agg, query.py:224-344; the
    * complex-dedup refinement is tracked separately). */
  def agents(q: StmtQuery, ro: ReadonlyTables, types: TypeRegistry): DataFrame =
    interactions(q, ro, types)
      .groupBy("agent_str")
      .agg(
        countDistinct("type_num").as("n_types"),
        sum("ev_count").as("total_ev"),
        max("belief").as("max_belief"),
        count(lit(1)).as("n_hashes"))
}
