package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** Misra–Gries guarantees the DuckDB gate can't plant: on a Zipf stream
  * with vocabulary far above k, every provably-findable term survives with
  * bounded undercount, under any partitioning (merge order), and the
  * sketch never holds more than k counters or overcounts anything.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("sketches-test")
  import spark.implicits._

  // Zipf-ish stream: term i occurs 2000/i times, i = 1..200;
  // N ~ 11800, so at k=16 the findability threshold N/17 ~ 694 —
  // t1 (2000) and t2 (1000) are guaranteed, the tail is not
  private lazy val stream =
    (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
  private lazy val exact = stream.groupBy(identity).map {
    case (t, xs) => t -> xs.size.toLong
  }

  test("guaranteed terms survive with bounded undercount, any partitioning") {
    val n = stream.size.toLong
    val k = 16
    val bound = n / (k + 1)
    for (parts <- Seq(1, 7, 32)) {
      val df = stream.toDF("term").repartition(parts)
      val got = Sketches.misraGries(df, "term", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= k, s"parts=$parts: ${got.size} counters > k")
      // no overcount, ever
      got.foreach { case (t, est) =>
        assert(est <= exact(t), s"parts=$parts: $t overcounted")
        assert(exact(t) - est <= bound, s"parts=$parts: $t est=$est")
      }
      // both provably-findable terms present
      exact.filter(_._2 > bound).keys.foreach { t =>
        assert(got.contains(t), s"parts=$parts: lost guaranteed term $t")
      }
    }
  }

  test("heavyHitters audit reports found + within_bound for every heavy term") {
    val df = stream.toDF("term").repartition(13)
    val rows = Sketches.heavyHitters(df, "term", 16).collect()
    assert(rows.map(_.getString(0)).toSet == Set("t1", "t2"))
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} not found")
      assert(r.getBoolean(3), s"${r.getString(0)} out of bounds")
      assert(r.getLong(1) == exact(r.getString(0)))
    }
  }

  test("degenerate cases: vocab <= k is exact; k=1 finds a majority element") {
    val small = Seq("a", "a", "b", "c", "a", "b").toDF("term")
    val got = Sketches.misraGries(small.repartition(3), "term", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L)) // no eviction: exact
    val majority = (Seq.fill(60)("x") ++ (1 to 40).map(i => s"y$i"))
      .toDF("term").repartition(5)
    val mg1 = Sketches.misraGries(majority, "term", 1)
      .collect().map(_.getString(0))
    assert(mg1.sameElements(Array("x"))) // freq > N/2 must be THE counter
  }
  test("hllMergeEstimate: union of per-group sketches matches direct sketch") {
    val df = (1 to 5000).map(i => (s"g${i % 7}", (i % 1200).toLong))
      .toDF("g", "v")
    val merged = Sketches.hllMergeEstimate(df, "g", "v").collect().head
    val direct = df
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(v, 12))"))
      .collect().head.getLong(0).toDouble
    val est = merged.getAs[Long]("estimate").toDouble
    assert(merged.getAs[Long]("n_groups") == 7L)
    // register-wise max union: merging per-group sketches costs (almost)
    // nothing vs sketching the stream directly — the union estimator uses
    // a wider register encoding, so allow a sub-percent wobble
    assert(math.abs(est - direct) <= direct * 0.01,
      s"merged $est vs direct $direct")
    assert(math.abs(est - 1200.0) <= 1200.0 * 0.05, s"estimate $est")
  }

  test("per-group sketches: guarantees hold per key; persisted merge law") {
    val k = 16
    // two keys with DIFFERENT distributions: key A = the Zipf stream,
    // key B = a majority element plus noise — per-key thresholds differ
    val rows =
      stream.map(("a", _)) ++
        (Seq.fill(3000)("maj") ++ (1 to 150).map(i => s"x$i")).map(("b", _))
    val df = rows.toDF("key", "term").repartition(13)
    def audit(skByKey: org.apache.spark.sql.DataFrame): Unit = {
      val got = skByKey.select(col("key"), explode(col("mg")))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val byKey = rows.groupBy(_._1)
      for ((key, xs) <- byKey) {
        val n = xs.size.toLong
        val bound = n / (k + 1)
        val ex = xs.groupBy(_._2).map { case (t, ys) => t -> ys.size.toLong }
        assert(got.keys.count(_._1 == key) <= k)
        got.collect { case ((`key`, t), est) =>
          assert(est <= ex(t), s"$key/$t overcounted")
          assert(ex(t) - est <= bound, s"$key/$t est=$est")
        }
        ex.filter(_._2 > bound).keys.foreach { t =>
          assert(got.contains((key, t)), s"guaranteed $key/$t missing")
        }
      }
    }
    audit(Sketches.misraGriesByKey(df, "key", "term", k))

    // persistence convention: sketch three batches independently, persist
    // the map columns, fold them later — same bounds after the merge
    // (mergeable-summaries law), without re-reading any batch's rows
    val batches = (0 until 3).map { b =>
      val batch = rows.zipWithIndex.collect {
        case (r, i) if i % 3 == b => r
      }.toDF("key", "term")
      Sketches.misraGriesByKey(batch, "key", "term", k)
    }
    val persisted = batches.reduce(_ unionByName _)
    audit(Sketches.misraGriesMergeByKey(persisted, "key", "mg", k))

    // the audit gate's columns are all-true on this data
    val flags = Sketches.heavyHittersByKey(df, "key", "term", k).collect()
    assert(flags.nonEmpty)
    assert(flags.forall(r => r.getBoolean(3) && r.getBoolean(4)))

    // null sketch rows (outer joins, schema evolution) are skipped by the
    // merge, not an executor NPE
    val withNull = persisted.unionByName(
      persisted.limit(1).select(col("key"),
        lit(null).cast(persisted.schema("mg").dataType).as("mg")))
    audit(Sketches.misraGriesMergeByKey(withNull, "key", "mg", k))
  }
}
