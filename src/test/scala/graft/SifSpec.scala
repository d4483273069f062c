package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.assembly.Sif
import graft.core.TypeRegistry

/** SIF export semantics over a hand-planted world: pair expansion rules
  * (first-two for linear statements, ordered permutations for small
  * complexes, skip for large ones), priority grounding, NAME handling,
  * and the pa_mods-derived residue/position surface. The full dataflow is
  * oracle-gated by q_sif_pairs; this spec pins the branchy edge cases the
  * TPC-H world does not plant.
  */
class SifSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("sif-test")

  val types = TypeRegistry(Seq("Activation", "Complex"))
  val act = types.num("Activation") // 0
  val cx = types.num("Complex")     // 1

  def world() = {
    import spark.implicits._
    // h1 linear, 3 grounded positions -> first two only
    // h2 Complex of 3 -> 6 ordered pairs
    // h3 Complex of 4 -> skipped entirely
    // h4 linear, 1 grounded position (pos 1 is NAME-only) -> skipped
    // h5 linear, pos 0 grounded in both HGNC and CHEBI -> HGNC wins
    val otherMeta = Seq(
      (1L, 0, "HGNC", "A"), (1L, 1, "HGNC", "B"), (1L, 2, "HGNC", "C"),
      (2L, 0, "HGNC", "X"), (2L, 1, "HGNC", "Y"), (2L, 2, "HGNC", "Z"),
      (3L, 0, "HGNC", "Q"), (3L, 1, "HGNC", "R"), (3L, 2, "HGNC", "S"),
      (3L, 3, "HGNC", "T"),
      (4L, 0, "HGNC", "L"),
      (5L, 0, "HGNC", "H"), (5L, 0, "CHEBI", "CH"), (5L, 1, "CHEBI", "CJ"),
    ).toDF("mk_hash", "ag_num", "db_name", "db_id")
    val nameMeta = Seq(
      (1L, 0, "nA"), (1L, 1, "nB"),
      (2L, 0, "nX"), (2L, 1, "nY"), (2L, 2, "nZ"),
      (4L, 0, "nL"), (4L, 1, "nOnlyName"),
      (5L, 0, "nH"), (5L, 1, "nJ"),
    ).toDF("mk_hash", "ag_num", "db_id")
    val sourceMeta = Seq(
      (1L, act, 7L, 0.9), (2L, cx, 3L, 0.5), (3L, cx, 2L, 0.4),
      (4L, act, 1L, 0.1), (5L, act, 5L, 0.8),
    ).toDF("mk_hash", "type_num", "ev_count", "belief")
      .withColumn("src_json", map(lit("reach"), col("ev_count")))
    (nameMeta, otherMeta, sourceMeta)
  }

  test("pair expansion: first-two, permutations <= 3, skip > 3, skip < 2") {
    val (nm, om, sm) = world()
    val sif = Sif.dump(nm, om, sm, types, Some(cx), None)
      .localCheckpoint(false)
    // h1: exactly one row, agents (A, B) — position 2 never appears
    val h1 = sif.filter(col("stmt_hash") === 1L).collect()
    assert(h1.length == 1)
    assert(h1.head.getAs[String]("agA_id") == "A" &&
      h1.head.getAs[String]("agB_id") == "B")
    assert(h1.head.getAs[String]("agA_name") == "nA" &&
      h1.head.getAs[String]("agB_name") == "nB")
    // h2: 3-member complex -> all 6 ordered pairs
    val h2 = sif.filter(col("stmt_hash") === 2L)
      .select("agA_id", "agB_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(h2 == Set(("X", "Y"), ("X", "Z"), ("Y", "X"), ("Y", "Z"),
      ("Z", "X"), ("Z", "Y")))
    // h3 (4-member complex) and h4 (one grounded agent) emit nothing
    assert(sif.filter(col("stmt_hash").isin(3L, 4L)).count() == 0)
  }

  test("priority grounding and name attachment") {
    val (nm, om, sm) = world()
    val sif = Sif.dump(nm, om, sm, types, Some(cx), None)
    val h5 = sif.filter(col("stmt_hash") === 5L).collect()
    assert(h5.length == 1)
    val r = h5.head
    // HGNC outranks CHEBI for position 0; position 1 only has CHEBI
    assert(r.getAs[String]("agA_ns") == "HGNC" &&
      r.getAs[String]("agA_id") == "H")
    assert(r.getAs[String]("agB_ns") == "CHEBI" &&
      r.getAs[String]("agB_id") == "CJ")
    assert(r.getAs[String]("agB_name") == "nJ")
    // a grounded position with no NAME row keeps a null name (h1 pos 2 is
    // never emitted; plant one: h2's names all exist, so drop one)
    val sifNoName = Sif.dump(nm.filter(!(col("mk_hash") === 5L &&
        col("ag_num") === 1)), om, sm, types, Some(cx), None)
    val r2 = sifNoName.filter(col("stmt_hash") === 5L).collect().head
    assert(r2.getAs[String]("agB_name") == null)
  }

  test("resPosFromMods picks one deterministic mod row per hash") {
    import spark.implicits._
    val mods = Seq(
      (1L, 1, "acetylation", "K", "44"),
      (1L, 0, "phosphorylation", "S", "33"),
      (2L, 0, "phosphorylation", null, null),
    ).toDF("mk_hash", "ag_num", "mod_type", "residue", "position")
    val rp = Sif.resPosFromMods(mods).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // h1: the (ag_num 0) row wins; h2: all-null res/pos rows are dropped
    assert(rp(1L) == ("S", "33"))
    assert(!rp.contains(2L))
  }

  test("fixId covers the dump-specific id cleanups") {
    import spark.implicits._
    val df = Seq(
      ("GO", "8150"), ("EFO", "EFO:0000001"), ("UP", "P04637-2"),
      ("UP", "SL-0002"), ("FPLX", "TCF-LEF"), ("HGNC", "6091"),
    ).toDF("ns", "id")
    val out = df.select(col("ns"), Sif.fixId(col("ns"), col("id")).as("fid"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSet == Set(
      ("GO", "0008150"), ("EFO", "0000001"), ("UP", "P04637"),
      ("UP", "SL-0002"), ("FPLX", "TCF_LEF"), ("HGNC", "6091")))
  }
}
