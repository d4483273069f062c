package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming / incremental operators.
  *
  * The reference has no streaming engine — its incremental path is the
  * batch "supplement" (preassemble_db.py:481-615): find raw statements not
  * yet linked, run the pipeline on the delta, merge counts. Both shapes are
  * here: the batch-incremental anti-join/merge, and a Structured-Streaming
  * event rollup whose transform is shared verbatim between the batch gate
  * query and the readStream path (same plan, two execution modes).
  */
object Streams {

  /** Event-time hourly rollup: tumbling-window aggregation with a 1-hour
    * watermark. Works identically over a batch DataFrame (watermark is a
    * no-op) and a streaming one (late data beyond 1h dropped, state
    * bounded). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("sum_value"))

  /** Incremental supplement: raw statements not yet represented in the
    * links table (alls EXCEPT olds, preassemble_db.py:527-543). The delta
    * then flows through the normal Preassembly stages. */
  def newRawStatements(raw: DataFrame, links: DataFrame): DataFrame =
    raw.join(links.select("raw_stmt_id"), Seq("raw_stmt_id"), "left_anti")

  /** Pointwise merge of per-hash source-count maps from two pipeline runs
    * (Counter-add, export_assembly.py:517-535): explode both, sum, re-map.
    */
  def mergeSourceCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("mk_hash"), explode(col("src_json")).as(Seq("src", "cnt")))
      .unionByName(
        b.select(col("mk_hash"), explode(col("src_json")).as(Seq("src", "cnt"))))
      .groupBy("mk_hash", "src")
      .agg(sum("cnt").as("cnt"))
      .groupBy("mk_hash")
      .agg(
        map_from_entries(collect_list(struct(col("src"), col("cnt"))))
          .as("src_json"),
        sum("cnt").as("ev_count"))
}
