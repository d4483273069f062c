package graft.assembly

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import graft.querydsl.ReadonlyTables

/** JDBC serving export — the reference's final handoff of the readonly
  * layer into its Postgres serving database
  * (`readonly_dumping/readonly_dumping.py:558-605`:
  * `load_file_to_table_spark`, a per-table `df.write.jdbc` with
  * `src_json` serialized through `to_json` and the oversized
  * fast_raw_pa_link appended rather than overwritten).
  *
  * Spark-first shape: `df.write.jdbc` IS the operator — the work here is
  * the egress discipline a 100 TB dump needs:
  *
  *   - nested columns (maps/arrays/structs) can't cross JDBC; they are
  *     serialized to JSON text automatically, which is exactly what the
  *     reference does by hand for `source_meta.src_json`;
  *   - `numPartitions` caps the writer's parallelism = the number of
  *     concurrent connections the serving database sees. Without the cap
  *     a wide table write opens one connection per shuffle partition —
  *     thousands of sessions against one Postgres;
  *   - `batchsize` amortizes statement round-trips (executeBatch);
  *   - `isolationLevel = NONE` skips transaction bookkeeping on bulk
  *     load (Spark falls back to the driver default when the target
  *     doesn't support it).
  *
  * The serving database is the bottleneck, not Spark: this export is
  * deliberately a throttled funnel, and the engine-side serving path
  * (the bucketed parquet layer + [[IncrementalReadonly]]) exists so that
  * queries do NOT need this hop.
  */
object JdbcExport {

  /** Serialize columns JDBC cannot carry (array/map/struct) to JSON
    * text, as the reference does for `src_json`
    * (readonly_dumping.py:571-573). */
  private[assembly] def jdbcSafe(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType =>
          d.withColumn(f.name, to_json(col(f.name)))
        case _ => d
      }
    }

  /** Write one table through JDBC. `connections` bounds the concurrent
    * sessions the target database sees (coalesce, not repartition — no
    * shuffle for a pure egress). */
  def writeTable(
      df: DataFrame,
      url: String,
      table: String,
      properties: java.util.Properties = new java.util.Properties(),
      mode: String = "overwrite",
      connections: Int = 8,
      batchSize: Int = 10000): Unit =
    jdbcSafe(df)
      .coalesce(connections)
      .write
      .mode(mode)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", "NONE")
      .jdbc(url, table, properties)

  /** Dump the whole readonly layer, mirroring the reference's table set
    * and modes: everything overwrites except fast_raw_pa_link, which is
    * orders of magnitude larger than the rest and appends
    * (readonly_dumping.py:603-605). `prefix` maps to the reference's
    * `readonly.` schema qualifier. */
  def writeReadonly(
      ro: ReadonlyTables,
      url: String,
      properties: java.util.Properties = new java.util.Properties(),
      prefix: String = "",
      connections: Int = 8,
      batchSize: Int = 10000): Unit = {
    val tables = Seq(
      ("name_meta", ro.nameMeta, "overwrite"),
      ("text_meta", ro.textMeta, "overwrite"),
      ("other_meta", ro.otherMeta, "overwrite"),
      ("source_meta", ro.sourceMeta, "overwrite"),
      ("mesh_term_meta", ro.meshTermMeta, "overwrite"),
      ("mesh_concept_meta", ro.meshConceptMeta, "overwrite"),
      ("fast_raw_pa_link", ro.fastRawPaLink, "append"),
      ("raw_stmt_mesh", ro.rawStmtMesh, "overwrite"),
      ("reading_ref_link", ro.readingRefLink, "overwrite"),
      ("agent_interactions", ro.agentInteractions, "overwrite"),
      ("pa_agents", ro.paAgents, "overwrite"),
    )
    tables.foreach { case (name, df, mode) =>
      writeTable(df, url, prefix + name, properties, mode,
        connections, batchSize)
    }
  }
}
