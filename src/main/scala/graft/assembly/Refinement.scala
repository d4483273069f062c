package graft.assembly

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Refinement graph operators.
  *
  * The reference enumerates candidate pairs per statement type in an O(n²)
  * process pool (export_assembly.py:759-784) and builds an nx.DiGraph with
  * a cycle check (:858-877). Spark re-expression:
  *
  *   - candidate generation is a blocked self-join: equality on the
  *     statement type plus a coarse agent-grounding block, so the quadratic
  *     work is confined to same-block groups (SURVEY §7.4.1);
  *   - transitive ancestors come from an iterative frontier join to
  *     fixpoint — the DAG is shallow, so the loop runs few rounds, each a
  *     single equi-join shuffled on the frontier key.
  */
object Refinement {

  /** Candidate refinement pairs: same `blockCols` values, different hashes.
    * The caller applies the domain refinement predicate to the paired rows.
    */
  def candidatePairs(stmts: DataFrame, blockCols: Seq[String]): DataFrame = {
    val left = stmts.columns.foldLeft(stmts)((d, c) =>
      if (blockCols.contains(c)) d else d.withColumnRenamed(c, "a_" + c))
    val right = stmts.columns.foldLeft(stmts)((d, c) =>
      if (blockCols.contains(c)) d else d.withColumnRenamed(c, "b_" + c))
    left.join(right, blockCols).filter(col("a_mk_hash") =!= col("b_mk_hash"))
  }

  /** Connected components over an undirected edge list (node, peer) — the
    * reference partitions statements into components before belief calc
    * (belief.py:171-193). Iterative min-label propagation: each round every
    * node adopts the smallest label among itself and its neighbors; rounds
    * are single equi-join shuffles, converging in O(component diameter).
    * Returns (node, component) with component = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("node"), col("peer"))
      .union(edges.select(col("peer").as("node"), col("node").as("peer")))
      .distinct()
      .localCheckpoint(true).toDF("node", "peer")
    var labels = sym.select(col("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint(true).toDF("node", "component")
    var i = 0
    while (i < maxIter) {
      val next = sym.as("e")
        .join(labels.as("l"), col("e.peer") === col("l.node"))
        .select(col("e.node").as("node"), col("l.component").as("component"))
        .union(labels)
        .groupBy("node")
        .agg(min("component").as("component"))
        .localCheckpoint(true).toDF("node", "component")
      val changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.component") =!= col("o.component"))
        .limit(1).count() > 0
      labels = next
      if (!changed) return labels
      i += 1
    }
    sys.error(s"connected components did not converge in $maxIter rounds")
  }

  /** Transitive closure of a DAG given as (desc, anc) direct edges.
    * Returns all (desc, anc) pairs with a path desc -> anc. Fails on cycles
    * (mirrors the reference's cycle check, export_assembly.py:858-877).
    *
    * Path doubling: each round self-joins the accumulated closure, so a
    * depth-D DAG converges in ceil(log2 D) rounds — each one equi-join
    * shuffle — instead of D frontier rounds.
    */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint (not cache): iterative plans must truncate lineage or
    // Catalyst re-analyzes an exponentially growing logical plan each round.
    def fresh(df: DataFrame): DataFrame =
      df.localCheckpoint(true).toDF("desc", "anc") // new attr ids for self-joins
    var acc = fresh(edges.select(col("desc"), col("anc")).distinct())
    var i = 0
    while (i < maxIter) {
      val next = fresh(acc.as("l")
        .join(acc.as("r"), col("l.anc") === col("r.desc"))
        .select(col("l.desc").as("desc"), col("r.anc").as("anc"))
        .distinct()
        .join(acc, Seq("desc", "anc"), "left_anti"))
      if (next.isEmpty) {
        if (acc.filter(col("desc") === col("anc")).limit(1).count() > 0)
          sys.error("refinement graph contains a cycle")
        return acc
      }
      acc = fresh(acc.union(next))
      i += 1
    }
    sys.error(s"transitive closure did not converge in $maxIter rounds (cycle?)")
  }
}
