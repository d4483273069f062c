package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.TypeRegistry
import graft.assembly.{ReadonlyBuilder, StatementWorld}
import graft.querydsl.ReadonlyTables
import graft.sources.Tables

/** Deterministic mapping of the driver's TPC-H-ish tables onto a statement
  * world, so the full assembly + query-DSL path is exercised by the DuckDB
  * correctness gate:
  *
  *   - each order is a statement: mk_hash = o_orderkey, statement type =
  *     o_orderpriority (5 types), belief = (o_custkey % 1000)/1000.0;
  *   - each lineitem is one evidence row of its order: sid = rid =
  *     l_orderkey*10 + l_linenumber, source mapped from l_returnflag
  *     (A->reach, N->medscan, R->signor), paper id (pmid) = l_suppkey;
  *   - each lineitem is also an agent row: ag_num = l_linenumber,
  *     grounding id = 'P'<partkey>, namespace from returnflag/linestatus
  *     (N->NAME, R->TEXT, A+F->CHEBI, A+O->HGNC), role_num =
  *     l_linenumber % 3 - 1;
  *   - mesh annotations: mesh_num = l_partkey % 100, concept iff odd
  *     (parity is consistent per mesh_num since 100 is even).
  *
  * The DuckDB oracles replicate exactly this mapping as a CTE prefix
  * ([[DslQueries.PREFIX]]).
  */
object TpchWorld {

  val types: TypeRegistry = TypeRegistry(
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
  val readerSources = Seq("reach", "medscan")
  val dbSources = Seq("signor")

  /** The stand-in for the reference's Complex statement type: its agent sets
    * expand into materialized pair rows in agent_interactions. */
  val complexTypeNum: Int = 3

  def world(spark: SparkSession, dir: String): StatementWorld =
    world(spark, dir, None)

  /** As [[world]], but keeping only the lineitem rows `liFilter` accepts —
    * the incremental-maintenance harness: two complementary filters split
    * the SAME world into base + delta batches whose evidence ids (and the
    * window-derived evn they embed) are STABLE across the split, because
    * the filter applies after the row_number. Statements are restricted to
    * hashes with at least one surviving evidence row (a statement "
    * arrives" with its first evidence). */
  def world(
      spark: SparkSession, dir: String,
      liFilter: Option[org.apache.spark.sql.Column]): StatementWorld = {
    val orders = Tables.table(spark, dir, "orders")
    // l_linenumber is NOT unique within an order in this synthetic data; the
    // 5-column prefix below is (verified at all SFs), so a row_number over
    // it yields a deterministic per-order evidence index shared with the
    // DuckDB oracle prefix.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey")
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"))
    // four tables derive from this staged intermediate; persist it so the
    // scan + window run once, not once per derivation
    val li0 = Tables.table(spark, dir, "lineitem")
      .withColumn("evn", row_number().over(w))
      .withColumn("sid", col("l_orderkey") * 100 + col("evn"))
    val li = liFilter.map(li0.filter).getOrElse(li0).persist()

    val statements0 = orders.select(
      col("o_orderkey").as("mk_hash"),
      col("o_orderpriority").as("stype"),
      ((col("o_custkey") % 1000).cast("double") / lit(1000.0)).as("belief"))
    val statements =
      if (liFilter.isEmpty) statements0
      else statements0.join(
        li.select(col("l_orderkey").as("mk_hash")).distinct(),
        Seq("mk_hash"), "left_semi")

    val evidence = li.select(
      col("sid"),
      col("l_orderkey").as("mk_hash"),
      when(col("l_returnflag") === "A", "reach")
        .when(col("l_returnflag") === "N", "medscan")
        .otherwise("signor").as("src"),
      col("sid").as("rid"),
      col("l_suppkey").as("pmid"))

    val agents = li.select(
      col("l_orderkey").as("mk_hash"),
      col("l_linenumber").cast("int").as("ag_num"),
      when(col("l_returnflag") === "N", "NAME")
        .when(col("l_returnflag") === "R", "TEXT")
        .when(col("l_linestatus") === "F", "CHEBI")
        .otherwise("HGNC").as("db_name"),
      concat(lit("P"), col("l_partkey").cast("string")).as("db_id"),
      (col("l_linenumber") % 3 - 1).cast("int").as("role_num"))

    val mesh = li.select(
      col("sid"),
      (col("l_partkey") % 100).as("mesh_num"),
      (col("l_partkey") % 2).cast("int").as("is_concept"))

    // full five-id-type reading_ref_link: pmcid/doi numeric forms derived
    // the same way ingest derives them (functions/Ids decompositions)
    val refs = li.select(
      col("sid").as("rid"),
      col("l_suppkey").as("pmid"),
      col("l_orderkey").as("trid"),
      (col("sid") + 500000).as("tcid"),
      (col("l_suppkey") + 7000).as("pmcid_num"),
      (lit(1000) + col("l_partkey") % 5).as("doi_ns"),
      concat(lit("j"), col("l_partkey").cast("string")).as("doi_id"))

    StatementWorld(statements, evidence, agents, mesh, refs)
  }

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, ReadonlyTables]

  /** Assembled + cached readonly layer for a scale-factor dir. Cached per
    * (session, dir) so Verify/Bench build each layer once. */
  def readonly(spark: SparkSession, dir: String): ReadonlyTables =
    cache.getOrElseUpdate(
      System.identityHashCode(spark) + ":" + dir,
      ReadonlyBuilder
        .build(spark, world(spark, dir), types, readerSources, dbSources,
          complexTypeNum = Some(complexTypeNum))
        .persistAll())
}
