package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.assembly.{Bookkeeping, Preassembly}
import graft.sources.Tables

/** Principal dump export (keyword blocklist + TSV round-trip) and the
  * update-bookkeeping / rejected-statements logs.
  */
class BookkeepingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("bookkeeping-test")

  test("principal dump: blocklist rejects mutating queries, case-insensitive") {
    assert(Tables.findDisallowedKeywords(
      "SELECT * FROM t WHERE x = 1") == Seq())
    assert(Tables.findDisallowedKeywords(
      "UPDATE t SET x = 1; select Drop FROM t") == Seq("drop", "set", "update"))
    val e = intercept[IllegalArgumentException] {
      Tables.principalQueryToTsv(spark, "DELETE FROM t", "/tmp/never")
    }
    assert(e.getMessage.contains("delete"))
  }

  test("principal dump: TSV with \\N nulls round-trips through the reader") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dump").toString + "/out"
    Seq((1L, Some("a"), Some(2.5)), (2L, None, None))
      .toDF("id", "s", "v").createOrReplaceTempView("dump_src")
    Tables.principalQueryToTsv(spark,
      "SELECT id, s, v FROM dump_src ORDER BY id", dir)
    val back = spark.read
      .option("sep", "\t").option("header", "true").option("nullValue", "\\N")
      .schema("id LONG, s STRING, v DOUBLE").csv(dir)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)))).toSet
    assert(back == Set((1L, Some("a"), Some(2.5)), (2L, None, None)))
  }

  test("update log: append, read back, watermark by last completed run") {
    val dir = Files.createTempDirectory("bk").toString
    Bookkeeping.recordUpdate(spark, dir, "preassembly", 1L,
      Map("raw" -> 100L, "unique" -> 60L))
    Bookkeeping.recordUpdate(spark, dir, "preassembly", 2L,
      Map("raw" -> 120L, "unique" -> 70L))
    Bookkeeping.recordUpdate(spark, dir, "preassembly", 3L,
      Map("raw" -> 10L), completed = false)
    Bookkeeping.recordUpdate(spark, dir, "reading", 5L, Map("docs" -> 9L))
    assert(Bookkeeping.updates(spark, dir).count() == 4)
    val last = Bookkeeping.lastCompleted(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last == Map("preassembly" -> 2L, "reading" -> 5L))
  }

  test("rejected statements log captures the failure reason") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rej").toString
    val raw = Seq(
      (1L, """{"type":"Activation","subj":{"name":"A"},"obj":{"name":"B"}}"""),
      // backslash-free garbage partial-fills to an empty struct -> no_type
      (2L, """garbage"""),
      (3L, """{"type":"Activation"}"""),
      (4L, """{"subj":{"name":"A"}}"""),
      // suspect (backslash) garbage fails BOTH strict parses -> parse_error
      (5L, """{"ty\\pe": \q"""),
    ).toDF("raw_stmt_id", "raw_json")
    val (_, rejected) = Preassembly.partitionValid(Preassembly.parse(raw))
    Bookkeeping.recordRejected(rejected, dir, runId = 7L)
    val rows = Bookkeeping.rejectedStatements(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(2L -> "no_type", 3L -> "no_agents", 4L -> "no_type",
      5L -> "parse_error"))
  }
}
