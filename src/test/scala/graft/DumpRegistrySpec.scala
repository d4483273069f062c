package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.assembly.{DumpRegistry, Sif}
import graft.queries.TpchWorld

/** The dated-prefix dump registry: prerequisite ordering, start/end
  * markers, listing/filtering, resume, latest-element lookup, and
  * artifact parity with the direct exports.
  */
class DumpRegistrySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("dump-registry-test")
  val dir = "/root/testdata/sf0.001"
  lazy val ro = TpchWorld.readonly(spark, dir)
  lazy val root =
    java.nio.file.Files.createTempDirectory("graft_dumps").toString

  test("full dump run: ordering, listing, resume, latest, parity") {
    import spark.implicits._
    import DumpRegistry._

    // foreign directories under the root must never list as dumps
    // (the reference's strptime probe, dump.py:64-77)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "not-a-date"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "2020-13-36"))

    val d = start(spark, root, "2020-07-16")
    // prerequisite DAG: readonly needs belief, end needs everything
    intercept[DumpOrderError](dumpReadonly(spark, d, ro))
    assert(dumpBelief(spark, d, ro))
    assert(dumpReadonly(spark, d, ro))
    assert(dumpSourceCount(spark, d, ro))
    val paMods = Seq(
      (1L, 0, "phosphorylation", "S", "33"),
      (2L, 0, "phosphorylation", "T", null))
      .toDF("mk_hash", "ag_num", "mod_type", "residue", "position")
    assert(dumpResPos(spark, d, paMods))
    assert(dumpFullPaJson(spark, d, ro))
    // StatementHashMeshId (dump.py:563-589): readonly already present
    // here; the before-readonly ordering error is asserted on d2 below
    assert(dumpHashMeshIds(spark, d, ro))
    intercept[DumpOrderError](markEnd(spark, d)) // sif still missing
    assert(dumpSif(spark, d, ro, TpchWorld.types,
      Some(TpchWorld.complexTypeNum)))
    // skip-if-exists default (run_dump, dump.py:264-270)
    assert(!dumpBelief(spark, d, ro))

    // principal statistics: planted chain — content c1 read twice by r1
    // (one reading raw-less), once by r2; c2 unread by anything with raws
    val readings = Seq(
      (10L, 1L, "reach", 1L, "pubmed", "abstract"),
      (11L, 1L, "reach", 1L, "pubmed", "abstract"),
      (12L, 1L, "sparser", 2L, "pubmed", "abstract"),
      (13L, 2L, "reach", 1L, "pmc", "fulltext"))
      .toDF("rid", "tcid", "reader", "reader_version", "source", "text_type")
    val raw = Seq((100L, 10L, "Activation"), (101L, 10L, "Activation"),
      (102L, 12L, "Complex"))
      .toDF("sid", "rid", "stype")
    val pa = Seq((100L, 7L), (101L, 7L)).toDF("sid", "mk_hash")
    intercept[DumpOrderError](markEnd(spark, d)) // stats required by end
    assert(dumpPrincipalStats(spark, d, readings, raw, pa))
    val stats = spark.read.option("header", "true")
      .csv(d.element("principal-statistics"))
    // (pubmed reach Activation), (pubmed reach null: rid 11 has no raw),
    // (pubmed sparser Complex), (pmc reach null)
    assert(stats.count() == 4)
    val reach = stats.filter(col("reader") === "reach" &&
      col("stype") === "Activation").collect().head
    assert(reach.getAs[String]("n_content") == "1" &&
      reach.getAs[String]("n_readings") == "1" &&
      reach.getAs[String]("n_raw") == "2" &&
      reach.getAs[String]("n_pa") == "1")
    val rawless = stats.filter(col("reader") === "reach" &&
      col("source") === "pmc").collect().head
    assert(rawless.getAs[String]("n_raw") == "0" &&
      rawless.getAs[String]("n_pa") == "0")

    markEnd(spark, d)

    val d2 = start(spark, root, "2020-08-28")
    assert(dumpBelief(spark, d2, ro))
    // hash->mesh requires the readonly element (requires = [Readonly])
    intercept[DumpOrderError](dumpHashMeshIds(spark, d2, ro))

    // listing + status filters (list_dumps, dump.py:33-88)
    assert(listDumps(spark, root).map(_.dateStamp) ==
      Seq("2020-07-16", "2020-08-28"))
    assert(listDumps(spark, root, started = Some(true), ended = Some(true))
      == Seq(d))
    assert(listDumps(spark, root, ended = Some(false)) == Seq(d2))

    // continuing re-enters the latest unended dump (Start.dump, :306-318)
    assert(start(spark, root, "2020-09-18", continuing = true) == d2)
    // a fresh (non-continuing) start always opens its own prefix
    assert(start(spark, root, "2020-09-18").dateStamp == "2020-09-18")

    // latest-element lookup walks started dumps newest-first
    // (get_latest_dump_s3_path, dump.py:91-121)
    assert(latestDumpPath(spark, root, "belief")
      .contains(d2.element("belief")))
    assert(latestDumpPath(spark, root, "sif").contains(d.element("sif")))

    // artifact parity: belief rows, and the sif element equals a direct
    // export fed the DUMPED res_pos (the required_s3_paths contract)
    assert(spark.read.parquet(d.element("belief")).count() ==
      ro.sourceMeta.count())
    val sif = spark.read.parquet(d.element("sif"))
    val direct = Sif.dump(ro, TpchWorld.types,
      Some(TpchWorld.complexTypeNum),
      Some(spark.read.parquet(d.element("res_pos"))))
      .withColumn("source_counts", Sif.srcStr(col("source_counts")))
    assert(sif.count() == direct.count())
    assert(sif.exceptAll(direct).isEmpty && direct.exceptAll(sif).isEmpty)
    // and the hash->mesh element equals the direct mapping
    val mti = spark.read.parquet(d.element("mti_mesh_ids"))
    val mtiDirect = DumpRegistry.hashMeshIds(ro)
    assert(mti.exceptAll(mtiDirect).isEmpty &&
      mtiDirect.exceptAll(mti).isEmpty)
  }
}
