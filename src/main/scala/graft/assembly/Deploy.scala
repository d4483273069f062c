package graft.assembly

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.querydsl.ReadonlyTables

/** Deployment of the readonly layer as bucketed parquet tables — the Spark
  * analog of the reference's index build + pg_dump/restore serving step
  * (cli/dump.py:432-459, schemas/mixins.py:86-97).
  *
  * Every mk_hash-keyed table is bucketed AND sorted by mk_hash, so the DSL
  * compiler's semi/anti joins and the content join run shuffle-free at any
  * scale (both sides pre-partitioned identically — this is the cluster
  * equivalent of the reference's btree-per-table). Evidence-keyed tables
  * bucket by their own join keys (sid / rid).
  */
object Deploy {

  private def tableSpecs(ro: ReadonlyTables): Seq[(String, DataFrame, String)] = Seq(
    ("name_meta", ro.nameMeta, "mk_hash"),
    ("text_meta", ro.textMeta, "mk_hash"),
    ("other_meta", ro.otherMeta, "mk_hash"),
    ("source_meta", ro.sourceMeta, "mk_hash"),
    ("mesh_term_meta", ro.meshTermMeta, "mk_hash"),
    ("mesh_concept_meta", ro.meshConceptMeta, "mk_hash"),
    ("fast_raw_pa_link", ro.fastRawPaLink, "mk_hash"),
    ("raw_stmt_mesh", ro.rawStmtMesh, "sid"),
    ("reading_ref_link", ro.readingRefLink, "rid"),
    ("agent_interactions", ro.agentInteractions, "mk_hash"),
    ("pa_agents", ro.paAgents, "mk_hash"),
  )

  /** Write one bucketed+sorted parquet table, clearing any stale location
    * a previous process left behind (unknown to this catalog, it would
    * fail CREATE). */
  private[graft] def saveBucketed(
      spark: SparkSession,
      df: DataFrame,
      db: String,
      name: String,
      buckets: Int,
      keys: Seq[String]): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.$name")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$db.db/$name")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(s"$db.$name")
  }

  /** Write all tables into `db` with `buckets` buckets each. */
  def write(spark: SparkSession, ro: ReadonlyTables, db: String, buckets: Int): Unit =
    tableSpecs(ro).foreach { case (name, df, key) =>
      saveBucketed(spark, df, db, name, buckets, Seq(key))
    }

  /** Reload a deployed layer; joins on the bucket keys need no exchange. */
  def load(spark: SparkSession, db: String): ReadonlyTables = ReadonlyTables(
    nameMeta = spark.table(s"$db.name_meta"),
    textMeta = spark.table(s"$db.text_meta"),
    otherMeta = spark.table(s"$db.other_meta"),
    sourceMeta = spark.table(s"$db.source_meta"),
    meshTermMeta = spark.table(s"$db.mesh_term_meta"),
    meshConceptMeta = spark.table(s"$db.mesh_concept_meta"),
    fastRawPaLink = spark.table(s"$db.fast_raw_pa_link"),
    rawStmtMesh = spark.table(s"$db.raw_stmt_mesh"),
    readingRefLink = spark.table(s"$db.reading_ref_link"),
    agentInteractions = spark.table(s"$db.agent_interactions"),
    paAgents = spark.table(s"$db.pa_agents"),
  )
}
