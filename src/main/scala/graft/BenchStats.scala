package graft

/** Benchmark protocol main — the reference's benchmarker measurement
  * scheme (benchmarker/util.py:21-54, cli.py:85-129): N repeats per query
  * after warmup, reporting per-query mean and standard deviation of wall
  * seconds plus the pass fraction, as one JSON line.
  *
  * Usage: runMain graft.BenchStats [repeats]  (SPARK_GRAFT_SF_DIR selects
  * the scale dir; default sf0.1.)
  */
object BenchStats {
  def main(args: Array[String]): Unit = {
    val repeats = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench-stats")
    // shared-cache build must not bill the first query that touches it
    queries.TpchWorld.readonly(spark, sfDir).materializeAll()
    val stats = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warmup
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val secs = times.map(_._1)
      val mean = secs.sum / secs.size
      val std = math.sqrt(secs.map(t => (t - mean) * (t - mean)).sum / secs.size)
      val passed = times.count(_._2).toDouble / times.size
      name -> ((mean, std, passed))
    }
    val qs = stats.map { case (k, (m, s, p)) =>
      f"""\"$k\":{\"mean\":$m%.4f,\"std\":$s%.4f,\"passed\":$p%.2f}"""
    }.mkString("{", ",", "}")
    val total = stats.map(_._2._1).sum
    println(
      s"""{"metric":"mean_total","value":$total,"unit":"sec","repeats":$repeats,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
