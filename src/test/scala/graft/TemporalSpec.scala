package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal
import graft.sources.Tables

/** Temporal joins: the as-of union-trick plan against an independent
  * brute-force formulation, the bucketed variant's equality with the plain
  * one across bucket widths, tolerance semantics, and the range join
  * against a naive inequality join.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("temporal-test")
  val dir = "/root/testdata/sf0.001"

  def events = Tables.events(spark, dir)

  def purchases = events.where(col("event_type") === "purchase")
    .select("user_id", "event_id", "ts")

  def touches = events.where(col("event_type") =!= "purchase")
    .select(col("user_id"), col("ts"),
      col("event_id").as("touch_event_id"),
      col("event_type").as("touch_type"))

  def asofRows(df: DataFrame): Set[(Long, Long, Any, Any)] =
    df.select(col("user_id"), col("event_id"),
        col("touch_event_id"), col("touch_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3)))
      .toSet

  def plain(tol: Option[Long] = None): DataFrame =
    Temporal.asofJoin(purchases, "user_id", "ts", touches, "user_id", "ts",
      payload = Seq("touch_event_id", "touch_type"),
      rightTieBreak = "touch_event_id", toleranceUs = tol)

  test("asofJoin matches a brute-force max_by over candidate pairs") {
    // independent formulation: join all (purchase, earlier-or-equal touch)
    // pairs, keep the max_by (ts, tie-break) per purchase, left-join back
    val p = purchases
    val t = touches
    val best = p.join(t.withColumnRenamed("ts", "t_ts"), Seq("user_id"))
      .where(col("t_ts") <= col("ts"))
      .groupBy("user_id", "event_id")
      .agg(max_by(
        struct(col("touch_event_id"), col("touch_type")),
        struct(col("t_ts"), col("touch_event_id"))).as("m"))
      .select(col("user_id"), col("event_id"),
        col("m.touch_event_id"), col("m.touch_type"))
    val expected = p.join(best, Seq("user_id", "event_id"), "left")
    assert(asofRows(plain()) == asofRows(expected))
    assert(plain().count() == p.count()) // left-outer: no row loss
  }

  test("bucketed asofJoin equals the plain one across bucket widths") {
    val base = asofRows(plain())
    for (bucketUs <- Seq(3600L * 1000000L, 86400L * 1000000L,
        7L * 86400L * 1000000L)) {
      val bucketed = Temporal.asofJoinBucketed(
        purchases, "user_id", "ts", touches, "user_id", "ts",
        payload = Seq("touch_event_id", "touch_type"),
        rightTieBreak = "touch_event_id", bucketUs = bucketUs)
      assert(asofRows(bucketed) == base, s"bucketUs=$bucketUs")
    }
  }

  test("tolerance nulls matches older than the bound, keeps fresh ones") {
    val tol = 3600L * 1000000L // 1 hour
    val plainAges = plain().select(col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("age_us"),
        col("touch_event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.get(3)))
      .toMap
    val tolRows = plain(Some(tol)).select(col("user_id"), col("event_id"),
        col("touch_event_id")).collect()
    assert(tolRows.nonEmpty)
    var kept = 0
    tolRows.foreach { r =>
      val (age, touch) = plainAges((r.getLong(0), r.getLong(1)))
      age match {
        case Some(a) if a <= tol =>
          assert(r.get(2) == touch); kept += 1
        case _ => assert(r.get(2) == null)
      }
    }
    assert(kept > 0, "fixture should contain some within-tolerance matches")
    assert(kept < tolRows.length,
      "fixture should contain some beyond-tolerance matches")
  }

  test("tolerance on the bucketed variant matches the plain variant") {
    val tol = 3600L * 1000000L
    val b = Temporal.asofJoinBucketed(
      purchases, "user_id", "ts", touches, "user_id", "ts",
      payload = Seq("touch_event_id", "touch_type"),
      rightTieBreak = "touch_event_id",
      bucketUs = 86400L * 1000000L, toleranceUs = Some(tol))
    assert(asofRows(b) == asofRows(plain(Some(tol))))
  }

  test("rangeJoin equals the naive inequality join") {
    val orders = Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate")
    val iv = Tables.table(spark, dir, "lineitem")
      .where(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").as("s"),
        (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("e"))
    def pairs(df: DataFrame) = df
      .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val binned = Temporal.rangeJoin(orders, "o_orderdate", iv, "s", "e",
      binUs = 4L * 86400L * 1000000L)
    val naive = orders.join(iv,
      col("o_orderdate") >= col("s") && col("o_orderdate") <= col("e"))
    val got = pairs(binned)
    assert(got == pairs(naive))
    assert(got.nonEmpty)
  }

  test("rangeJoin rejects a bin narrower than the longest interval") {
    val orders = Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate")
    val iv = Tables.table(spark, dir, "lineitem").limit(10)
      .select(col("l_shipdate").as("s"),
        (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("e"))
    val ex = intercept[IllegalArgumentException] {
      Temporal.rangeJoin(orders, "o_orderdate", iv, "s", "e",
        binUs = 86400L * 1000000L)
    }
    assert(ex.getMessage.contains("longest interval"))
    // validate=false skips the blocking pass; an undersized bin stays
    // EXACT (an interval explodes into all its bins), it only widens the
    // candidate fan-out past the 2x guarantee
    val loose = Temporal.rangeJoin(orders, "o_orderdate", iv, "s", "e",
      binUs = 86400L * 1000000L, validate = false)
    val strict = Temporal.rangeJoin(orders, "o_orderdate", iv, "s", "e",
      binUs = 4L * 86400L * 1000000L)
    assert(loose.select("o_orderkey", "s").collect().toSeq.sorted(
        Ordering.by((r: org.apache.spark.sql.Row) => r.toString)) ==
      strict.select("o_orderkey", "s").collect().toSeq.sorted(
        Ordering.by((r: org.apache.spark.sql.Row) => r.toString)))
  }

  test("rangeJoin with an empty interval side yields an empty result") {
    val orders = Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate")
    val iv = Tables.table(spark, dir, "lineitem")
      .where(col("l_quantity") > 1e9) // empty
      .select(col("l_shipdate").as("s"),
        (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("e"))
    // the validation aggregate sees a NULL max span; must not NPE
    val out = Temporal.rangeJoin(orders, "o_orderdate", iv, "s", "e",
      binUs = 4L * 86400L * 1000000L)
    assert(out.count() == 0L)
  }

  test("asofJoin plan has no join node; rangeJoin plan has no nested loop") {
    val asofPlan = plain().queryExecution.executedPlan.toString
    assert(!asofPlan.contains("Join"), s"unexpected join in asof plan")
    val binned = Temporal.rangeJoin(
      Tables.table(spark, dir, "orders").select("o_orderkey", "o_orderdate"),
      "o_orderdate",
      Tables.table(spark, dir, "lineitem").where(col("l_quantity") > 49)
        .select(col("l_shipdate").as("s"),
          (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("e")),
      "s", "e", binUs = 4L * 86400L * 1000000L)
    val rangePlan = binned.queryExecution.executedPlan.toString
    assert(!rangePlan.contains("BroadcastNestedLoopJoin"),
      "range join must compile to an equi-join on the bin, not a nested loop")
  }
  test("intervalJoin equals the naive overlap join, no duplicate pairs") {
    val oiv = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").as("os"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("oe"))
    val siv = Tables.table(spark, dir, "lineitem")
      .where(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").as("ss"),
        (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("se"))
    def key(df: DataFrame) = df
      .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val naive = key(oiv.join(siv,
      col("os") <= col("se") && col("ss") <= col("oe")))
    assert(naive.nonEmpty)
    // bins smaller than the intervals (multi-bin spans exercise the
    // first-shared-bin dedup) and larger than both
    for (days <- Seq(2L, 10L)) {
      val got = key(Temporal.intervalJoin(oiv, "os", "oe", siv, "ss", "se",
        binUs = days * 86400L * 1000000L))
      assert(got.length == naive.length, s"binDays=$days: duplicates or loss")
      assert(got.toSet == naive.toSet, s"binDays=$days")
    }
  }
  test("asofJoinForward matches a brute-force min-ts/max-tiebreak pick") {
    val fwd = Temporal.asofJoinForward(purchases, "user_id", "ts",
      touches, "user_id", "ts",
      payload = Seq("touch_event_id", "touch_type"),
      rightTieBreak = "touch_event_id")
    val best = purchases
      .join(touches.withColumnRenamed("ts", "t_ts"), Seq("user_id"))
      .where(col("t_ts") >= col("ts"))
      .groupBy("user_id", "event_id")
      .agg(max_by(
        struct(col("touch_event_id"), col("touch_type")),
        struct((unix_micros(col("t_ts")) * -1).as("neg"),
          col("touch_event_id"))).as("m"))
      .select(col("user_id"), col("event_id"),
        col("m.touch_event_id"), col("m.touch_type"))
    val expected = purchases.join(best, Seq("user_id", "event_id"), "left")
    assert(asofRows(fwd) == asofRows(expected))
    assert(fwd.count() == purchases.count())
    // forward tolerance keeps only near-future matches
    val tol = 3600L * 1000000L
    val fwdTol = Temporal.asofJoinForward(purchases, "user_id", "ts",
      touches, "user_id", "ts",
      payload = Seq("touch_event_id", "touch_type"),
      rightTieBreak = "touch_event_id", toleranceUs = Some(tol))
    val leads = fwd.select(col("user_id"), col("event_id"),
        (unix_micros(col("asof_ts")) - unix_micros(col("ts"))).as("lead_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2)))
      .toMap
    fwdTol.select(col("user_id"), col("event_id"), col("touch_event_id"))
      .collect().foreach { r =>
        val lead = leads((r.getLong(0), r.getLong(1)))
        val fresh = lead.exists(_.asInstanceOf[Long] <= tol)
        assert((r.get(2) != null) == fresh)
      }
  }
  test("broadcast asofJoin equals the windowed one and never shuffles facts") {
    val b = Temporal.asofJoinBroadcast(purchases, "user_id", "ts",
      touches, "user_id", "ts",
      payload = Seq("touch_event_id", "touch_type"),
      rightTieBreak = "touch_event_id")
    assert(asofRows(b) == asofRows(plain()))
    val p = b.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"dimension not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"fact side shuffled or windowed:\n$p")
    // tolerance parity too
    val tol = 3600L * 1000000L
    val bt = Temporal.asofJoinBroadcast(purchases, "user_id", "ts",
      touches, "user_id", "ts",
      payload = Seq("touch_event_id", "touch_type"),
      rightTieBreak = "touch_event_id", toleranceUs = Some(tol))
    assert(asofRows(bt) == asofRows(plain(Some(tol))))
  }
}
