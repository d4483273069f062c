package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** Compressed text-content handling — the reference stores article text as
  * zlib-compressed BYTEA (`text_content.content`, principal_schema.py:417-437)
  * and decompresses at read time. Decompression is per-partition imperative
  * work (a genuine mapPartitions case: a streaming Inflater per batch, no
  * codegen equivalent), producing the plain-text column for the readers.
  */
object Content {

  def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = graft.functions.ZlibPool.deflater(nowrap = false)
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }

  def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = graft.functions.ZlibPool.inflater(nowrap = false)
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) sys.error("truncated zlib stream")
      out.write(buf, 0, n)
    }
    out.toByteArray
  }

  /** (id, compressed-content) -> (id, text). One Inflater per row batch,
    * partition-local; the decompressed text never moves compressed. */
  def decompress(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df
      .selectExpr(s"CAST($idCol AS BIGINT)", contentCol)
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) =>
      (id, new String(inflate(bytes), java.nio.charset.StandardCharsets.UTF_8))
    }).toDF(idCol, "text")
  }

  /** Columnar inflate (codegen'd expression, [[graft.functions.InflateText]])
    * — unlike [[decompress]] it keeps every sibling column in the row. */
  def inflateText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.exprs.inflate_text(c)

  // --- content client (client/principal/content.py) -------------------------

  import org.apache.spark.sql.functions._

  /** get_reader_output (content.py:11-62): reader output for given text
    * content, optionally constrained to a reader (case-insensitive, as the
    * reference upper-cases) and version; `tcids` as a FRAME rather than a
    * literal list because ref-id resolution at scale is itself a join
    * (the reference's _get_trids round-trip). Output: (tcid, reader, text).
    */
  def readerOutput(
      readings: DataFrame,
      tcids: Option[DataFrame] = None,
      reader: Option[String] = None,
      readerVersion: Option[String] = None): DataFrame = {
    val preds = reader.map(r => upper(col("reader")) === r.toUpperCase).toSeq ++
      readerVersion.map(col("reader_version") === _)
    val base = preds.foldLeft(readings)(_ filter _)
    val constrained = tcids match {
      case Some(t) =>
        base.join(t.select("tcid").distinct(), Seq("tcid"), "left_semi")
      case None => base
    }
    constrained.select(col("tcid"), col("reader"),
      inflateText(col("bytes")).as("text"))
  }

  /** get_content_by_refs (content.py:64-135): content of one text type for
    * a pmid or trid list (exactly one must be given), optionally
    * constrained by source/format, keyed by the requesting id. Decompression
    * only happens when `unzip` (the reference's flag) — callers moving
    * content between stores keep it compressed. */
  def contentByRefs(
      textRefs: DataFrame,
      textContent: DataFrame,
      pmids: Option[Seq[Long]] = None,
      trids: Option[Seq[Long]] = None,
      sources: Option[Seq[String]] = None,
      formats: Option[Seq[String]] = None,
      contentType: String = "abstract",
      unzip: Boolean = true): DataFrame = {
    require(pmids.isDefined != trids.isDefined,
      "exactly one of pmids / trids must be given")
    require(Seq("abstract", "fulltext").contains(contentType),
      s"Unrecognized content type: $contentType")
    val preds = Seq(col("text_type") === contentType) ++
      sources.map(ss => col("source").isin(ss: _*)) ++
      formats.map(fs => col("format").isin(fs: _*))
    val content = preds.foldLeft(textContent)(_ filter _)
    val keyed = pmids match {
      case Some(ps) =>
        content.join(
          textRefs.filter(col("pmid").isin(ps: _*)).select("trid", "pmid"),
          "trid")
          .select(col("pmid").as("id_val"), col("content"))
      case None =>
        content.filter(col("trid").isin(trids.get: _*))
          .select(col("trid").as("id_val"), col("content"))
    }
    if (unzip) keyed.select(col("id_val"), inflateText(col("content")).as("text"))
    else keyed
  }

  /** get_text (content.py:137-153): text of one type per pmid (any
    * text_type — unlike get_content_by_refs this is unvalidated in the
    * reference too), whitespace re-coded as the reference does (tabs ->
    * spaces, then newlines -> tabs — the simultaneous translate is
    * equivalent to the sequential replaces). */
  def textByPmids(
      textRefs: DataFrame,
      textContent: DataFrame,
      pmids: Seq[Long],
      textType: String): DataFrame =
    textContent.filter(col("text_type") === textType)
      .join(textRefs.filter(col("pmid").isin(pmids: _*))
        .select("trid", "pmid"), "trid")
      .select(col("pmid"),
        translate(inflateText(col("content")), "\t\n", " \t").as("text"))

  /** WARC-style chunk ingestion: concatenated-gzip chunks -> one row per
    * record (chunk id, member_idx, version, headers map, body bytes).
    * Every stage is a codegen'd expression plus one generator fused into
    * the scan stage — compressed chunk bytes never cross a shuffle, and
    * the SAME transform runs batch or streaming (it is stateless).
    * Unparseable members are dropped (the curation posture); corrupt
    * chunk tails keep their good prefix by [[graft.functions.CodecsUtil.gzipMembers]]. */
  def warcRecords(
      chunks: DataFrame, idCol: String, chunkCol: String): DataFrame =
    chunks
      .select(col(idCol), posexplode(
        graft.functions.codecs.gzip_members(col(chunkCol))))
      .withColumnRenamed("pos", "member_idx")
      .select(col(idCol), col("member_idx"),
        graft.functions.codecs.warc_record(col("col")).as("r"))
      .where(col("r").isNotNull)
      .select(col(idCol), col("member_idx"),
        col("r.version").as("version"), col("r.headers").as("headers"),
        col("r.body").as("body"))

  /** WARC records -> decoded pages: the charset-aware end of the chain.
    * Body bytes decode under the WHATWG sniffing order
    * ([[graft.functions.CharsetUtil]]) with the record's Content-Type
    * header as the transport hint, so cp1252 / UTF-16 / Shift_JIS
    * bodies reach the text pipeline as text, not mojibake. Adds
    * `charset` (the chosen encoding) and `text` (decoded body); still
    * one fused scan-stage projection — bytes never cross a shuffle. */
  def warcPages(
      chunks: DataFrame, idCol: String, chunkCol: String): DataFrame = {
    // case-insensitive: warcRecord preserves written header case (the
    // WARC spec makes field names case-insensitive), so a record writing
    // "content-type:" must not lose its charset hint to an exact-case
    // lookup — mojibake for hint-only encodings like Shift_JIS
    val hint = graft.functions.codecs.header_get(
      col("headers"), lit("Content-Type"))
    warcRecords(chunks, idCol, chunkCol)
      .withColumn("charset",
        graft.functions.charsets.charset_detect(col("body"), hint))
      .withColumn("text",
        graft.functions.charsets.decode_text(col("body"), hint))
  }

  /** WARC response records -> decoded HTTP pages: the CommonCrawl
    * shape, where a response record's body is a full HTTP message —
    * status line, HTTP headers, then an entity body that may still be
    * Transfer-Encoding: chunked and/or Content-Encoding compressed.
    * The chain undoes each layer in protocol order, every step a
    * codegen'd expression in the scan stage:
    *
    *   gzip_members -> warc_record -> http_response -> http_dechunk
    *   (when chunked) -> decompress_bytes (when magic bytes say the
    *   entity is compressed; identity bodies pass through) ->
    *   decode_text with the HTTP Content-Type charset as hint.
    *
    * Non-HTTP records (warcinfo, request, metadata) drop. Output:
    * (idCol, member_idx, warc_headers, status, http_headers, charset,
    * text). A failed layer (corrupt chunking/compression) nulls `text`
    * but keeps the row — status-code analytics still work on it. */
  def httpPages(
      chunks: DataFrame, idCol: String, chunkCol: String): DataFrame = {
    val recs = warcRecords(chunks, idCol, chunkCol)
      .withColumnRenamed("headers", "warc_headers")
      .withColumn("h", graft.functions.codecs.http_response(col("body")))
      .where(col("h").isNotNull)
    val chunked = lower(coalesce(
      element_at(col("h.headers"), "transfer-encoding"), lit("")))
      .contains("chunked")
    val hint = element_at(col("h.headers"), "content-type")
    val contentEnc = lower(coalesce(
      element_at(col("h.headers"), "content-encoding"), lit("")))
    recs
      .withColumn("raw", when(chunked,
        graft.functions.codecs.http_dechunk(col("h.body")))
        .otherwise(col("h.body")))
      .withColumn("entity", when(
        graft.functions.codecs.codec_sniff(col("raw")).isNotNull,
        graft.functions.codecs.decompress_bytes(col("raw"), lit("auto")))
        // raw deflate has no magic to sniff: only the header knows.
        // coalesce keeps the raw bytes when the header lies (identity
        // body declared deflate) — the row degrades, not disappears
        .when(contentEnc.contains("deflate"), coalesce(
          graft.functions.codecs.decompress_bytes(col("raw"),
            lit("deflate")), col("raw")))
        .otherwise(col("raw")))
      .select(col(idCol), col("member_idx"), col("warc_headers"),
        col("h.status").as("status"),
        col("h.headers").as("http_headers"),
        graft.functions.charsets.charset_detect(col("entity"), hint)
          .as("charset"),
        graft.functions.charsets.decode_text(col("entity"), hint)
          .as("text"))
  }
}
