package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup, TextAnalysis}
import graft.sources.Tables

/** TEMPORARY measurement probe (not part of the driver contract; removed
  * before round end): times each stage of q_curation_pipeline in
  * isolation, mirroring its exact fixture (corpusNear, n = 5). */
object CurProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("cur-probe")
    val d0 = Tables.parallelized(Tables.table(spark, dir, "documents"))
      .select("doc_id", "text")
    val toksC = TextAnalysis.tokens(col("text"))
    val docs = d0.unionByName(
      d0.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          array_join(slice(toksC, lit(1), size(toksC) - 2), " ").as("text")))
    val bench = d0.filter(col("doc_id") % 7 === 0).select("doc_id", "text")
    def time[T](label: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 2).foreach { i =>
        val df = f
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    val n = 5
    def stats = TextAnalysis.qualityStats(docs, "text", Nil)
      .withColumn("lang_pred", TextAnalysis.langId(col("text"), Nil))
    time("stats")(stats)
    def kept = stats
      .filter(col("n_tokens") >= 30 && col("lang_pred") === "en" &&
        col("ttr") >= 0.2)
      .select(col("doc_id"), col("text"),
        col("n_tokens").cast("long").as("n_tokens"))
      .localCheckpoint(false)
    time("kept(ckpt)")(kept)
    val keptM = kept
    def pairs = Dedup.minhashNearDups(keptM.select("doc_id", "text"),
      "doc_id", "text", n = n, k = 12, r = 3, threshold = 0.6)
      .localCheckpoint(false)
    time("minhash pairs (kept warm)")(pairs)
    val pairsM = pairs
    def deduped = Dedup.dedupCorpus(keptM, "doc_id", pairsM)
    time("dedupCorpus/CC (inputs warm)")(deduped)
    val dedupedM = deduped.localCheckpoint(false)
    dedupedM.count()
    def clean = dedupedM.join(
      Curate.contaminated(dedupedM.select("doc_id", "text"), bench,
        "doc_id", "text", n = n, minFrac = 0.5)
        .select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    time("contaminated+anti (deduped warm)")(clean)
    time("hashSplit (clean warm)") {
      val c = clean.localCheckpoint(false); c.count()
      Curate.hashSplit(c, "doc_id").select(col("doc_id"), col("split"),
        col("n_tokens"))
    }
    time("FULL pipeline")(
      Curate.curationPipeline(docs, "doc_id", "text", bench, n = n))
    spark.stop()
  }
}
