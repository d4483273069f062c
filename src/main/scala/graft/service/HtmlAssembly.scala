package graft.service

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.TypeRegistry
import graft.querydsl.{ReadonlyTables, Results, StmtQuery}

/** HTML statement view — the reference's `fmt=html` branch
  * (`indra_db_service/call_handlers.py:370-402`), where the statements
  * result is handed to indra's HtmlAssembler and rendered as the nested
  * agent-pair → relation → statement page with evidence-count and
  * per-source badges, sorted by evidence count throughout.
  *
  * Spark-first split: everything data-shaped — the grouping keys, the
  * per-group evidence totals that drive the sort, the English surfaces,
  * the nested ordering itself — is columnar over
  * [[Results.statementStructResult]] ([[viewModel]]); the driver-side
  * [[render]] is a single linear pass over the already-ordered,
  * maxRows-capped egress emitting markup on group-key changes. No
  * grouping or sorting happens on the driver, so the render cost is the
  * page size, never the corpus.
  */
object HtmlAssembly {

  /** One row per selected statement, pre-sorted into nested render order:
    * agent-pair groups by descending summed evidence, relation groups
    * within each pair likewise, statements within a relation by their own
    * evidence count (`sort_by=ev_count`, the service default —
    * call_handlers.py:382). Ties break on the key columns and mk_hash so
    * the page is deterministic. */
  def viewModel(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      evLimit: Int = 10): DataFrame = {
    val st = Results.statementStructResult(q, ro, types, evLimit)
    val names = filter(col("agent_names"), n => n.isNotNull)
    // top level: the first two present agents (HtmlAssembler's default
    // "agent-pair" grouping level); singletons group alone
    val pairNames = slice(names, 1, 2)
    // second level: statement type over the full agent list — one row per
    // distinct relation within the pair
    val relKey = concat_ws("|", col("stype"), array_join(names, ","))
    val keyed = st
      .withColumn("pair_names", pairNames)
      .withColumn("pair_key", array_join(pairNames, "|"))
      .withColumn("rel_key", relKey)
    val wPair = Window.partitionBy("pair_key")
    val wRel = Window.partitionBy("pair_key", "rel_key")
    keyed
      .withColumn("pair_ev", sum("ev_count").over(wPair))
      .withColumn("rel_ev", sum("ev_count").over(wRel))
      .select(col("pair_key"), col("pair_names"),
        col("pair_ev").cast("long").as("pair_ev"),
        col("rel_key"), col("rel_ev").cast("long").as("rel_ev"),
        col("mk_hash"), col("stype"), col("english"),
        coalesce(col("belief"), lit(0.0)).cast("double").as("belief"),
        col("ev_count").cast("long").as("ev_count"), col("n_returned"),
        to_json(col("src_json")).as("source_counts_json"),
        to_json(col("evidence")).as("evidence_json"))
      .orderBy(col("pair_ev").desc, col("pair_key").asc,
        col("rel_ev").desc, col("rel_key").asc,
        col("ev_count").desc, col("mk_hash").asc)
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** The meta-level heading surface (`_make_english_from_meta`,
    * indra_db_service/util.py:144-165) rebuilt driver-side so the
    * data-derived names are escaped BEFORE the bold markup wraps them —
    * the SQL twin ([[graft.functions.English.metaEnglish]]) interpolates
    * raw names and is for trusted surfaces only. */
  private def pairEnglish(names: scala.collection.Seq[String]): String = {
    val b = names.map(n => s"<b>${esc(n)}</b>")
    b match {
      case Seq() => ""
      case Seq(a) => s"$a is modified"
      case Seq(a, rest @ _*) => s"$a affects ${rest.mkString(", ")}"
    }
  }

  private def badgeRow(srcJson: String, evCount: Long, belief: Double):
      String = {
    val srcs = JsonMethods.parseOpt(srcJson).toSeq.flatMap {
      case JObject(fields) => fields.collect {
        case (s, JInt(n)) if n > 0 => (s, n.toLong)
      }
      case _ => Nil
    }.sortBy { case (s, n) => (-n, s) }
    val srcSpans = srcs.map { case (s, n) =>
      s"""<span class="badge src-badge" data-source="${esc(s)}">${esc(s)}: $n</span>"""
    }.mkString
    f"""<span class="badge ev-badge">$evCount%d</span>""" +
      f"""<span class="badge belief-badge">$belief%.2f</span>""" + srcSpans
  }

  private def evidenceList(evJson: String): String = {
    implicit val fmts: Formats = DefaultFormats
    val evs = JsonMethods.parseOpt(evJson).toSeq.flatMap {
      case JArray(items) => items
      case _ => Nil
    }
    evs.map { e =>
      val src = (e \ "source_api").extractOpt[String].getOrElse("")
      val pmid = (e \ "pmid").extractOpt[String]
        .orElse((e \ "pmid").extractOpt[Long].map(_.toString))
      val doi = (e \ "text_refs" \ "DOI").extractOpt[String]
      val refs = pmid.map(p =>
        s""" <a href="https://pubmed.ncbi.nlm.nih.gov/${esc(p)}/">PMID:${esc(p)}</a>""")
        .getOrElse("") +
        doi.map(d => s""" <span class="doi">DOI:${esc(d)}</span>""")
          .getOrElse("")
      s"""<li class="evidence"><span class="src">${esc(src)}</span>$refs</li>"""
    }.mkString
  }

  /** Render the ordered view model as the nested statements page. A
    * linear walk: pair / relation headers are emitted when their key
    * changes, which the [[viewModel]] ordering guarantees is exactly once
    * per group. `maxRows` caps the egress like the reference's MAX_STMTS
    * (call_handlers.py:363-367) and the summary block reports the
    * truncation the same way (statements_returned / end_of_statements). */
  def render(
      vm: DataFrame,
      maxRows: Int = 1000,
      title: String = "INDRA DB Statement Results"): String = {
    val rows = vm.limit(maxRows + 1).collect()
    val shown = rows.take(maxRows)
    val endOfStatements = rows.length <= maxRows
    val evReturned = shown.map(_.getAs[Long]("n_returned")).sum
    val sb = new StringBuilder
    sb ++= "<!doctype html><html><head><meta charset=\"utf-8\"/>"
    sb ++= s"<title>${esc(title)}</title></head><body>"
    sb ++= s"<h1>${esc(title)}</h1>"
    sb ++= "<div class=\"summary\">"
    sb ++= s"<span>statements_returned: ${shown.length}</span> "
    sb ++= s"<span>statement_limit: $maxRows</span> "
    sb ++= s"<span>end_of_statements: $endOfStatements</span> "
    sb ++= s"<span>evidence_returned: $evReturned</span></div>"
    var pair: String = null
    var rel: String = null
    for (r <- shown) {
      val pk = r.getAs[String]("pair_key")
      val rk = r.getAs[String]("rel_key")
      if (pk != pair) {
        if (pair != null) sb ++= "</ul></details></ul></details>"
        pair = pk; rel = null
        val heading = pairEnglish(r.getSeq[String](r.fieldIndex("pair_names")))
        sb ++= s"""<details class="agent-pair" open><summary>$heading"""
        sb ++= s"""<span class="badge ev-badge">${r.getAs[Long]("pair_ev")}</span></summary><ul>"""
      }
      if (rk != rel) {
        if (rel != null) sb ++= "</ul></details>"
        rel = rk
        sb ++= s"""<details class="relation" open><summary>${esc(r.getAs[String]("stype"))}"""
        sb ++= s"""<span class="badge ev-badge">${r.getAs[Long]("rel_ev")}</span></summary><ul>"""
      }
      sb ++= s"""<li class="statement" data-hash="${r.getAs[Long]("mk_hash")}">"""
      sb ++= s"""<span class="english">${esc(r.getAs[String]("english"))}</span>"""
      sb ++= badgeRow(r.getAs[String]("source_counts_json"),
        r.getAs[Long]("ev_count"), r.getAs[Double]("belief"))
      sb ++= s"""<ul class="evidence-list">${evidenceList(r.getAs[String]("evidence_json"))}</ul>"""
      sb ++= "</li>"
    }
    if (pair != null) sb ++= "</ul></details></ul></details>"
    sb ++= "</body></html>"
    sb.toString
  }

  /** The whole `fmt=html` response for a statements request
    * (call_handlers.py:370-402). */
  def page(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      evLimit: Int,
      maxRows: Int): String =
    render(viewModel(q, ro, types, evLimit), maxRows)
}
