package graft.assembly

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Update-bookkeeping tables — the reference's job-metadata schema
  * (`updates`, `reading_updates`, `preassembly_updates`, `xdd_updates`,
  * principal_schema.py:1008-1104) plus the rejected-row capture
  * (`rejected_statements`, `discarded_statements`). Re-expressed as
  * append-only parquet logs keyed by (kind, run_id): each pipeline run
  * appends one record with its stage statistics; readers aggregate the log
  * to answer "what ran, when, over how much" — the questions the
  * reference's supplement logic asks of its bookkeeping rows
  * (preassemble_db.py:481-543 watermarks new work by the last update).
  */
object Bookkeeping {

  /** Append one run record. `stats` carries per-stage counts (raw rows,
    * unique statements, rejected rows, ...). */
  def recordUpdate(
      spark: SparkSession,
      dir: String,
      kind: String,
      runId: Long,
      stats: Map[String, Long],
      completed: Boolean = true): Unit = {
    import spark.implicits._
    Seq((kind, runId, completed, stats))
      .toDF("kind", "run_id", "completed", "stats")
      .withColumn("recorded_at", current_timestamp())
      .write.mode("append").parquet(s"$dir/updates")
  }

  /** The full update log. */
  def updates(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/updates")

  /** Latest completed run per kind — the supplement watermark: work with a
    * run_id above this is "new" (the reference filters raw statements
    * against its last preassembly_updates row, preassemble_db.py:527-543).
    */
  def lastCompleted(spark: SparkSession, dir: String): DataFrame =
    updates(spark, dir)
      .filter(col("completed"))
      .groupBy("kind")
      .agg(max("run_id").as("last_run_id"))

  /** Persist the validation rejects of a run (the rejected_statements
    * table) with the reason each row failed — parse error, missing type,
    * or no agents (the checks of Preassembly.partitionValid). Non-suspect
    * rows skip the strict parse (Preassembly.parse), so their garbage
    * partial-fills to an empty struct and reports as `no_type`;
    * `parse_error` marks rows that failed BOTH strict parses. */
  def recordRejected(rejected: DataFrame, dir: String, runId: Long): Unit = {
    val stmt = col("stmt")
    val reason = when(stmt.isNull, "parse_error")
      .when(stmt.getField("type").isNull, "no_type")
      .otherwise("no_agents")
    rejected
      .select(col("raw_stmt_id"), reason.as("reason"), lit(runId).as("run_id"))
      .write.mode("append").parquet(s"$dir/rejected_statements")
  }

  def rejectedStatements(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/rejected_statements")
}
