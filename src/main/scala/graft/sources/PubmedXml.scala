package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PubMed baseline-XML MeSH extraction — the ingest the reference runs as
  * a download-and-parse prep step (readonly_dumping.py:1549-1641,
  * :1795-1803), producing the (pmid, mesh_num, major_topic, is_concept)
  * annotation table.
  *
  * Input: one XML document per row (e.g. `spark.read.text` with a custom
  * record delimiter, or wholetext per article). Extraction is pure column
  * regexes — no XML library dependency, streaming-friendly, and the
  * per-article work is embarrassingly parallel.
  */
object PubmedXml {

  /** Extract (pmid, mesh_ui, major_topic) rows from an `xml` string column
    * holding one PubmedArticle per row. MeSH descriptor UIs (D...) map to
    * terms, C-prefixed supplemental concepts to concepts. */
  def meshAnnotations(articles: DataFrame): DataFrame = {
    val pmid = regexp_extract(col("xml"),
      "<PMID[^>]*>([0-9]+)</PMID>", 1).cast("long")
    val headings = regexp_extract_all(col("xml"),
      lit("<DescriptorName UI=\"[CD][0-9]+\"[^>]*MajorTopicYN=\"[YN]\""),
      lit(0))
    articles
      .withColumn("pmid", pmid)
      .filter(col("pmid").isNotNull)
      .select(col("pmid"), explode(headings).as("m"))
      .select(
        col("pmid"),
        regexp_extract(col("m"), "UI=\"([CD][0-9]+)\"", 1).as("mesh_ui"),
        (regexp_extract(col("m"), "MajorTopicYN=\"([YN])\"", 1) === "Y")
          .as("major_topic"))
      .withColumn("mesh_num", graft.functions.Ids.meshNum(col("mesh_ui")))
      .withColumn("is_concept",
        graft.functions.Ids.meshIsConcept(col("mesh_ui")).cast("int"))
      .select("pmid", "mesh_num", "is_concept", "major_topic")
  }
}
