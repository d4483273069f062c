package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.exprs.stable_hash64

/** Hash determinism is the root of the whole assembly DAG (SURVEY §7.1):
  * golden values pin the exact MD5-prefix semantics, and the expression must
  * produce identical results on the eval path and the codegen path.
  */
class StableHashSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("hash-test")

  val golden = Seq(
    "Phosphorylation(MEK(), ERK())" -> 5435586938413883772L,
    "abc" -> -8070080442485551184L,
    "" -> -3162216497309240828L,
  )

  test("golden values via DataFrame (codegen path)") {
    import spark.implicits._
    val got = golden.map(_._1).toDF("s")
      .select(stable_hash64(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == golden.map(_._2))
  }

  test("null propagates") {
    import spark.implicits._
    val got = Seq[Option[String]](None).toDF("s")
      .select(stable_hash64(col("s")))
      .collect()
    assert(got.head.isNullAt(0))
  }

  test("stable across repeated evaluation and distinct on hash") {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"stmt_$i").toDF("s")
      .select(stable_hash64(col("s")).as("h"))
    assert(df.distinct().count() == 1000) // no collisions on this corpus
  }
}
