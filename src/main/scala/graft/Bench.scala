package graft
import org.apache.spark.sql.functions.{count, lit}

/** Benchmark main: one JSON line with per-query steady-state seconds.
  *
  * Hygiene (round-3 verdict): the shared readonly cache is force-
  * materialized BEFORE the timed loop so its build cost is billed to
  * nobody's query; each timed run reports the shuffle/broadcast stage
  * counts of its executed (post-AQE) plan under "plans", so a timing swing
  * with unchanged stage counts reads as harness noise, not a plan
  * regression. "queries" stays name -> seconds for the driver contract.
  */
object Bench {
  // DISTINCT stage ids: a reused exchange prints at every consumer site,
  // which would over-count shared shuffles as independent ones
  private def occ(s: String, pat: String): Int =
    (pat + " (\\d+)").r.findAllMatchIn(s).map(_.group(1)).toSet.size

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // comma-separated allowlist for iterating on specific queries locally;
    // unset (the driver's mode) benches everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.local("graft-bench")
    queries.TpchWorld.readonly(spark, sfDir).materializeAll()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // the same aggregate Dataset.count() builds, but held so the executed
      // adaptive plan is readable after collect
      def run(): (Double, Long, String) =
        try {
          val agg = fn(spark, sfDir).agg(count(lit(1)).as("n"))
          val t0 = System.nanoTime()
          val rows = agg.collect().head.getLong(0)
          val sec = (System.nanoTime() - t0) / 1e9
          (sec, rows, agg.queryExecution.executedPlan.toString)
        } catch { case _: Throwable => (-1.0, -1L, "") }
      run() // warmup: steady-state execution, not codegen compile + JIT
      // median of three measured runs: single-shot timings swing 2-8× on
      // unchanged code (GC pauses, block eviction) and mask real deltas.
      // Failed runs (-1 sentinel) are dropped first — sorted in, one
      // failure would skew the "median" to the faster real sample and two
      // would report -1 as if it were a timing
      val runs = Seq(run(), run(), run()).filter(_._1 >= 0)
      val (sec, rows, plan) =
        if (runs.isEmpty) (-1.0, -1L, "")
        else runs.sortBy(_._1).apply(runs.size / 2)
      (name, sec, rows,
        occ(plan, "ShuffleQueryStage"), occ(plan, "BroadcastQueryStage"))
    }
    val qs = results.map { case (k, sec, _, _, _) => s"\"$k\":$sec" }
      .mkString("{", ",", "}")
    val plans = results.map { case (k, _, rows, sh, bc) =>
      s"""\"$k\":{\"rows\":$rows,\"shuffles\":$sh,\"broadcasts\":$bc}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"plans":$plans,"sf":"$sfDir"}""")
    spark.stop()
  }
}
