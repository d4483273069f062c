package graft.assembly

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reading distillation: among multiple reader runs over the versions of a
  * paper's content, keep the authoritative one per (paper, reader).
  *
  * The reference does this as a 1.5h single-process pandas scan sorted by
  * text_ref_id (`reader_prioritize`, export_assembly.py:174-306). The Spark
  * re-expression is two windows — embarrassingly parallel in `trid`, so it
  * scales with the cluster instead of one core:
  *
  *   1. within (trid, reader, source, text_type): keep only the newest
  *      reader version;
  *   2. within (trid, reader): keep only rows whose (text_type, source)
  *      ranks best in the fulltext-over-abstract priority list
  *      (util/distill_statements.py:129-137).
  *
  * Both windows share the `trid`-prefixed partition key, so stage 2 reuses
  * stage 1's shuffle partitioning (one exchange total).
  */
object Distill {

  /** Priority list: earlier = preferred. `(text_type, source)` pairs not
    * listed rank after all listed ones. */
  type Priority = Seq[(String, String)]

  val defaultPriority: Priority = Seq(
    ("fulltext", "pmc_oa"), ("fulltext", "manuscripts"),
    ("fulltext", "elsevier"), ("fulltext", "pubmed"),
    ("abstract", "pubmed"), ("abstract", "pmc_oa"),
    ("title", "pubmed"),
  )

  /** Input columns: rid, trid, reader, reader_version (orderable), source,
    * text_type. Output: the kept rows. */
  def distill(readings: DataFrame, priority: Priority = defaultPriority): DataFrame = {
    val spark = readings.sparkSession
    import spark.implicits._
    val prioDim = priority.zipWithIndex
      .map { case ((tt, src), i) => (tt, src, i) }
      .toDF("text_type", "source", "prio")

    val newest = Window
      .partitionBy("trid", "reader", "source", "text_type")
      .orderBy(col("reader_version").desc, col("rid").desc)
    val best = Window.partitionBy("trid", "reader")

    readings
      .withColumn("rn", row_number().over(newest))
      .filter(col("rn") === 1)
      .drop("rn")
      .join(broadcast(prioDim), Seq("text_type", "source"), "left")
      .withColumn("prio", coalesce(col("prio"), lit(Int.MaxValue)))
      .withColumn("best_prio", min("prio").over(best))
      .filter(col("prio") === col("best_prio"))
      .drop("prio", "best_prio")
  }

  /** Reading ids to drop = all minus kept (the reference's `drop_readings`
    * set, export_assembly.py:984-987). */
  def dropReadings(readings: DataFrame, priority: Priority = defaultPriority): DataFrame =
    readings.select("rid")
      .join(distill(readings, priority).select("rid"), Seq("rid"), "left_anti")
}
