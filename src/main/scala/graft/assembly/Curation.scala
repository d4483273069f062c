package graft.assembly

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation store operations (principal curation table,
  * principal_schema.py:984-1006): per-statement curation counts attached to
  * query results, and curator anonymization at egress.
  */
object Curation {

  /** Curations per pa_hash (the Python dict loop of
    * call_handlers.py:337-354 as one aggregation). */
  def counts(curations: DataFrame): DataFrame =
    curations.groupBy("pa_hash").agg(count(lit(1)).as("n_curations"))

  /** Salted-MD5 curator anonymization — the reference appends the salt to
    * the curator and keeps the first 16 hex chars
    * (indra_db_service/api.py:630-639). */
  def anonymizeCurator(curator: Column, salt: String): Column =
    substring(md5(concat(curator, lit(salt))), 1, 16)

  /** Attach curation counts to a hash-keyed result set (left join; absent
    * means zero). */
  def attach(results: DataFrame, curations: DataFrame): DataFrame =
    results.join(
      counts(curations).withColumnRenamed("pa_hash", "mk_hash"),
      Seq("mk_hash"), "left")
      .withColumn("n_curations", coalesce(col("n_curations"), lit(0L)))

  // --- curation store -------------------------------------------------------

  /** One curation record — the principal curation table's columns
    * (principal_schema.py:984-1006) minus the server-side ones the engine
    * derives (id, date). */
  final case class Submission(
      paHash: Long,
      tag: String,
      curator: String,
      ip: String,
      text: Option[String] = None,
      sourceHash: Option[Long] = None,
      source: String = "direct_client",
      paJson: Option[String] = None,
      evJson: Option[String] = None)

  // one id counter PER STORE, seeded from that store's max id on first
  // touch — a single JVM-global counter issues duplicate ids when two
  // stores (or a fresh store after a seeded one) share the process. A
  // second PROCESS over the same dir still races; the reference delegates
  // that to Postgres sequences, and a multi-writer deployment should too.
  private val ids =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  /** Append one curation to the parquet log at `dir` — the engine analog of
    * submit_curation (client/principal/curation.py:16-80): validates the
    * hash against the known statements (BadHashError otherwise), fills
    * pa_json from the statement payload when the caller didn't send one,
    * stamps id + date. Single-row appends are the wrong shape for bulk
    * ingest — this is the curation UI's write path, a few rows a minute in
    * the reference; bulk loads should write the log directly. */
  def submit(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      sub: Submission,
      knownHashes: DataFrame): Long = {
    import spark.implicits._
    val known = knownHashes.select(col("mk_hash"))
      .filter(col("mk_hash") === sub.paHash)
    if (known.isEmpty)
      throw new IllegalArgumentException(s"Invalid hash: ${sub.paHash}")
    val paJson = sub.paJson.orElse {
      if (knownHashes.columns.contains("pa_json"))
        knownHashes.filter(col("mk_hash") === sub.paHash)
          .select("pa_json").as[String].collect().headOption
      else None
    }
    val counter = ids.computeIfAbsent(dir, { d =>
      val mx = store(spark, d).agg(max("id")).collect().head
      new java.util.concurrent.atomic.AtomicLong(
        if (mx.isNullAt(0)) 0L else mx.getLong(0))
    })
    val id = counter.incrementAndGet()
    Seq((id, sub.paHash, sub.sourceHash, sub.tag, sub.text, sub.curator,
        sub.ip, sub.source, paJson, sub.evJson))
      .toDF("id", "pa_hash", "source_hash", "tag", "text", "curator", "ip",
        "source", "pa_json", "ev_json")
      .withColumn("date", current_timestamp())
      .write.mode("append").parquet(s"$dir/curations")
    id
  }

  /** The curation log (empty frame with the right schema when nothing has
    * been submitted yet). */
  def store(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val path = new java.io.File(s"$dir/curations")
    if (path.exists()) spark.read.parquet(path.toString)
    else {
      import spark.implicits._
      Seq.empty[(Long, Long, Option[Long], String, Option[String], String,
          String, String, Option[String], Option[String])]
        .toDF("id", "pa_hash", "source_hash", "tag", "text", "curator", "ip",
          "source", "pa_json", "ev_json")
        .withColumn("date", current_timestamp())
    }
  }

  /** get_curations filter semantics (curation.py:83-120): every given
    * field constrains with equality. */
  def query(
      curations: DataFrame,
      paHash: Option[Long] = None,
      sourceHash: Option[Long] = None,
      tag: Option[String] = None,
      curator: Option[String] = None): DataFrame = {
    val preds = paHash.map(col("pa_hash") === _).toSeq ++
      sourceHash.map(col("source_hash") === _) ++
      tag.map(col("tag") === _) ++
      curator.map(col("curator") === _)
    preds.foldLeft(curations)(_ filter _)
  }

  /** The all-curations listing with curator names anonymized — what the
    * reference serves to users without the get_curations permission
    * (api.py:616-639). */
  def anonymized(curations: DataFrame, salt: String): DataFrame =
    curations.withColumn("curator",
      anonymizeCurator(col("curator"), salt))

  private val GroundingRe = "^\\[(.*)\\] -> ([^ ]+)$"

  /** Curated grounding mappings — get_grounding_curations
    * (client/principal/curation.py:106-140): curations tagged 'grounding'
    * whose text matches `[raw text] -> NS:ID|NS2:ID2...` yield one row per
    * (raw_text, db_name, db_id); empty and non-matching texts are skipped
    * (the reference logs them), each entry splits on the FIRST colon only
    * (ids may contain colons), and a curation with ANY colon-less entry is
    * skipped WHOLE — the reference's dict() failure skips the curation,
    * not the entry (curation.py:131-141). */
  def groundingCurations(curations: DataFrame): DataFrame =
    query(curations, tag = Some("grounding"))
      .filter(col("text").isNotNull)
      .select(
        regexp_extract(trim(col("text")), GroundingRe, 1).as("raw_text"),
        split(regexp_extract(trim(col("text")), GroundingRe, 2), "\\|")
          .as("entries"))
      .filter(size(col("entries")) > 0 &&
        forall(col("entries"), e => e.contains(":")))
      .select(col("raw_text"), explode(col("entries")).as("entry"))
      .select(col("raw_text"),
        split(col("entry"), ":", 2).getItem(0).as("db_name"),
        split(col("entry"), ":", 2).getItem(1).as("db_id"))
}
