package graft.assembly

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TypeRegistry
import graft.querydsl.ReadonlyTables

/** Dump registry — the reference's dated-prefix dump orchestration
  * (`indra_db/cli/dump.py:33-88` `list_dumps`, `:91-121`
  * `get_latest_dump_s3_path`, `:130-281` the `Dumper` prerequisite
  * machinery, `:284-374` Start, `:591-607` End) re-expressed over the
  * Hadoop FileSystem API, so one implementation serves every store Spark
  * can reach — `s3a://bucket/indra-db/dumps` on a cluster, `file:/...`
  * in tests. The reference hard-wires boto3 + an S3 bucket; the engine
  * shape is store-neutral:
  *
  *   - a dump is a `YYYY-MM-DD`-stamped prefix under the registry root;
  *   - `start.json` / `end.json` markers bound the run
  *     (`_mark_start`, dump.py:296-305; End, :591-607), and every other
  *     element is a parquet directory whose `_SUCCESS` marker is its
  *     completion flag — the manifest is the store listing itself, as in
  *     the reference (`Start.load`, :320-341);
  *   - each element declares prerequisites ([[requires]], mirroring the
  *     reference's `requires` class attributes); dumping out of order
  *     raises the `DumpOrderError` analog;
  *   - re-dumping an existing element is a no-op unless forced
  *     (`run_dump`, :264-270).
  *
  * Scale note: the registry itself never moves data through the driver —
  * markers are tiny JSON writes, elements are ordinary distributed
  * `df.write.parquet`, and listing is one `listStatus` per call.
  */
object DumpRegistry {

  /** One dated dump prefix (the reference's
    * `S3Path(bucket, indra-db/dumps/YYYY-MM-DD/)`). */
  final case class Dump(root: String, dateStamp: String) {
    def prefix: String = s"$root/$dateStamp"
    def element(name: String): String = s"$prefix/$name"
  }

  class DumpOrderError(msg: String) extends IllegalStateException(msg)

  /** Element prerequisite DAG — the `requires` attributes of the
    * reference's dumper classes (dump.py: Start :290, Belief :424,
    * Readonly :438, SourceCount :467, ResiduePosition :483, FullPaJson
    * :528, Sif :547, End :598 = everything). */
  val requires: Map[String, Seq[String]] = Map(
    "start" -> Nil,
    "principal-statistics" -> Seq("start"),
    "belief" -> Seq("start"),
    "readonly" -> Seq("belief"),
    "source_count" -> Seq("readonly"),
    "res_pos" -> Seq("readonly"),
    "full_pa_json" -> Seq("readonly"),
    "mti_mesh_ids" -> Seq("readonly"),
    "sif" -> Seq("source_count", "res_pos", "belief"),
    "end" -> Seq("start", "principal-statistics", "belief", "readonly",
      "source_count", "res_pos", "full_pa_json", "mti_mesh_ids", "sif"),
  )

  private def fileSystem(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** An element is complete when its marker file exists (start/end) or
    * its parquet directory committed (`_SUCCESS`). */
  def elementExists(spark: SparkSession, d: Dump, name: String): Boolean = {
    val fs = fileSystem(spark, d.root)
    if (name == "start" || name == "end")
      fs.exists(new Path(d.element(s"$name.json")))
    else fs.exists(new Path(d.element(name), "_SUCCESS"))
  }

  private def checkOrder(spark: SparkSession, d: Dump, name: String): Unit = {
    val missing = requires(name)
      .filterNot(r => elementExists(spark, d, r))
    if (missing.nonEmpty)
      throw new DumpOrderError(
        s"$name dump requires ${missing.mkString(", ")} to be completed " +
          "before running.")
  }

  private def writeMarker(
      spark: SparkSession, d: Dump, name: String, body: String): Unit = {
    val fs = fileSystem(spark, d.root)
    val out = fs.create(new Path(d.element(s"$name.json")), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** Begin (or resume) a dump — `Start.dump` (dump.py:306-318): a fresh
    * start writes the marker; `continuing` re-enters the latest started,
    * unended dump instead, falling back to a fresh start when none
    * exists. */
  def start(
      spark: SparkSession, root: String, dateStamp: String,
      continuing: Boolean = false): Dump = {
    val resumed =
      if (continuing)
        listDumps(spark, root, started = Some(true), ended = Some(false))
          .lastOption
      else None
    resumed.getOrElse {
      val d = Dump(root, dateStamp)
      writeMarker(spark, d, "start",
        s"""{"date_stamp":"$dateStamp"}""")
      d
    }
  }

  /** Close the dump — the End marker (dump.py:591-607) requires every
    * other element first. */
  def markEnd(spark: SparkSession, d: Dump): Unit = {
    checkOrder(spark, d, "end")
    writeMarker(spark, d, "end", s"""{"date_stamp":"${d.dateStamp}"}""")
  }

  /** All dated dump prefixes under the root, optionally filtered by
    * start/end status — `list_dumps` (dump.py:33-88). Listing is one
    * `listStatus` of the root; the date-format filter drops foreign
    * directories exactly like the reference's `strptime` probe. */
  def listDumps(
      spark: SparkSession, root: String,
      started: Option[Boolean] = None,
      ended: Option[Boolean] = None): Seq[Dump] = {
    val fs = fileSystem(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return Seq.empty
    val dateRe = "(\\d{4})-(\\d{2})-(\\d{2})".r
    val all = fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n @ dateRe(_, m, dd)
        if m.toInt >= 1 && m.toInt <= 12 && dd.toInt >= 1 && dd.toInt <= 31 =>
          Dump(root, n) }
      .sortBy(_.dateStamp)
    all
      .filter(d => started.forall(_ == elementExists(spark, d, "start")))
      .filter(d => ended.forall(_ == elementExists(spark, d, "end")))
  }

  /** Latest completed copy of one element across all started dumps —
    * `get_latest_dump_s3_path` (dump.py:91-121). */
  def latestDumpPath(
      spark: SparkSession, root: String, name: String): Option[String] =
    listDumps(spark, root, started = Some(true)).reverse
      .find(d => elementExists(spark, d, name))
      .map(d => d.element(name))

  /** Write one parquet element under the dump prefix, enforcing the
    * prerequisite DAG and the reference's skip-if-exists default
    * (run_dump, dump.py:264-270). Returns true when a write happened. */
  def dumpElement(
      spark: SparkSession, d: Dump, name: String, df: => DataFrame,
      force: Boolean = false): Boolean = {
    checkOrder(spark, d, name)
    val fresh = force || !elementExists(spark, d, name)
    if (fresh)
      df.write.mode("overwrite").parquet(d.element(name))
    fresh
  }

  /** Belief dump (dump.py:418-430): per-hash belief scores. */
  def dumpBelief(
      spark: SparkSession, d: Dump, ro: ReadonlyTables,
      force: Boolean = false): Boolean =
    dumpElement(spark, d, "belief",
      ro.sourceMeta.select(col("mk_hash"), col("belief")), force)

  /** Readonly dump (dump.py:432-459): the serving tables themselves,
    * one parquet directory per table under `readonly/`. */
  def dumpReadonly(
      spark: SparkSession, d: Dump, ro: ReadonlyTables,
      force: Boolean = false): Boolean = {
    checkOrder(spark, d, "readonly")
    val fresh = force || !elementExists(spark, d, "readonly")
    if (fresh) {
      val tables = Seq(
        "name_meta" -> ro.nameMeta, "text_meta" -> ro.textMeta,
        "other_meta" -> ro.otherMeta, "source_meta" -> ro.sourceMeta,
        "mesh_term_meta" -> ro.meshTermMeta,
        "mesh_concept_meta" -> ro.meshConceptMeta,
        "fast_raw_pa_link" -> ro.fastRawPaLink,
        "raw_stmt_mesh" -> ro.rawStmtMesh,
        "reading_ref_link" -> ro.readingRefLink,
        "agent_interactions" -> ro.agentInteractions,
        "pa_agents" -> ro.paAgents)
      tables.foreach { case (n, df) =>
        df.write.mode("overwrite").parquet(s"${d.element("readonly")}/$n")
      }
      // the directory-level _SUCCESS marks the whole element
      writeMarkerFile(spark, d, "readonly")
    }
    fresh
  }

  private def writeMarkerFile(
      spark: SparkSession, d: Dump, name: String): Unit = {
    val fs = fileSystem(spark, d.root)
    fs.create(new Path(d.element(name), "_SUCCESS"), true).close()
  }

  /** Source-count dump (dump.py:461-475): per-hash per-source counts. */
  def dumpSourceCount(
      spark: SparkSession, d: Dump, ro: ReadonlyTables,
      force: Boolean = false): Boolean =
    dumpElement(spark, d, "source_count",
      ro.sourceMeta.select(col("mk_hash"), col("src_json")), force)

  /** Residue/position dump (dump.py:477-495), from the pa_mods surface
    * via [[Sif.resPosFromMods]]. */
  def dumpResPos(
      spark: SparkSession, d: Dump, paMods: DataFrame,
      force: Boolean = false): Boolean =
    dumpElement(spark, d, "res_pos", Sif.resPosFromMods(paMods), force)

  /** Full pa_json dump (dump.py:522-539): one statement payload per
    * hash. */
  def dumpFullPaJson(
      spark: SparkSession, d: Dump, ro: ReadonlyTables,
      force: Boolean = false): Boolean = {
    val payload =
      if (ro.fastRawPaLink.columns.contains("pa_json"))
        ro.fastRawPaLink.select("mk_hash", "pa_json")
          .dropDuplicates("mk_hash")
      else ro.fastRawPaLink.select(col("mk_hash"),
        lit(null).cast("string").as("pa_json")).dropDuplicates("mk_hash")
    dumpElement(spark, d, "full_pa_json", payload, force)
  }

  /** Statement-hash -> MeSH number mapping (StatementHashMeshId,
    * dump.py:563-589): the reference selects (mk_hash, mesh_num) from
    * MeshTermMeta and MeshConceptMeta and pickles them under 'terms' /
    * 'concepts' dict keys; the dict becomes a `kind` column on one
    * relational frame. Requires the readonly element, as in the
    * reference (`requires = [Readonly]`). */
  def hashMeshIds(ro: ReadonlyTables): DataFrame =
    ro.meshTermMeta
      .select(lit("terms").as("kind"), col("mk_hash"), col("mesh_num"))
      .unionByName(ro.meshConceptMeta
        .select(lit("concepts").as("kind"), col("mk_hash"), col("mesh_num")))

  def dumpHashMeshIds(
      spark: SparkSession, d: Dump, ro: ReadonlyTables,
      force: Boolean = false): Boolean =
    dumpElement(spark, d, "mti_mesh_ids", hashMeshIds(ro), force)

  /** Principal content statistics (PrincipalStats, dump.py:376-415):
    * per (source, text_type, reader, reader_version, statement type),
    * the distinct content / reading / raw-statement / preassembled
    * counts over the principal left-join chain. The reference runs this
    * as one SQL aggregation in Postgres; here it is one groupBy over the
    * joined frames — partial aggregation map-side, a single shuffle on
    * the (low-cardinality) group key.
    *
    * `readings` is the reading⨝text_content surface (the
    * [[Distill.distill]] input shape plus `tcid`): rid, tcid, reader,
    * reader_version, source, text_type. `rawStatements`: sid, rid,
    * stype. `paLink`: sid, mk_hash. */
  def principalStats(
      readings: DataFrame,
      rawStatements: DataFrame,
      paLink: DataFrame): DataFrame =
    readings
      .join(rawStatements, Seq("rid"), "left")
      .join(paLink, Seq("sid"), "left")
      .groupBy("source", "text_type", "reader", "reader_version", "stype")
      .agg(
        countDistinct("tcid").as("n_content"),
        countDistinct("rid").as("n_readings"),
        countDistinct("sid").as("n_raw"),
        countDistinct("mk_hash").as("n_pa"))

  /** The CSV artifact of [[principalStats]] (the reference's `fmt =
    * 'csv'` with a header row; the grouped counts are tiny, so one
    * file). */
  def dumpPrincipalStats(
      spark: SparkSession, d: Dump,
      readings: DataFrame, rawStatements: DataFrame, paLink: DataFrame,
      force: Boolean = false): Boolean = {
    val name = "principal-statistics"
    checkOrder(spark, d, name)
    val fresh = force || !elementExists(spark, d, name)
    if (fresh)
      principalStats(readings, rawStatements, paLink)
        .coalesce(1).write.option("header", "true")
        .mode("overwrite").csv(d.element(name))
    fresh
  }

  /** SIF dump (dump.py:541-562): reads its prerequisites' DUMPED
    * artifacts (res_pos) rather than recomputing them — the reference's
    * `required_s3_paths` contract, which is what makes a dump
    * reproducible after the source world moves on. */
  def dumpSif(
      spark: SparkSession, d: Dump, ro: ReadonlyTables,
      types: TypeRegistry, complexTypeNum: Option[Int] = None,
      force: Boolean = false): Boolean = {
    checkOrder(spark, d, "sif")
    val resPos = spark.read.parquet(d.element("res_pos"))
    dumpElement(spark, d, "sif",
      Sif.dump(ro, types, complexTypeNum, Some(resPos))
        .withColumn("source_counts", Sif.srcStr(col("source_counts"))),
      force)
  }
}
