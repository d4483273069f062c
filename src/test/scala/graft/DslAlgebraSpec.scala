package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.assembly.{ReadonlyBuilder, StatementWorld}
import graft.core.TypeRegistry
import graft.querydsl._

/** The reference's oracle harness re-expressed (tests/test_query.py:394-568):
  * build a synthetic corpus, evaluate base queries and random compositions
  * BOTH through the Spark engine and as plain Scala set algebra, and assert
  * equality plus the complement law `~q == all -- q`.
  */
object Fixture {
  final case class Stmt(
      hash: Long,
      stype: String,
      agents: Seq[(Int, String, String, Int)], // ag_num, db_name, db_id, role_num
      srcCounts: Map[String, Int],
      mesh: Seq[(Long, Boolean)], // mesh_num, is_concept
      pmids: Seq[Long])

  val types = TypeRegistry(Seq(
    "Phosphorylation", "Activation", "Inhibition", "Complex", "ActiveForm"))
  val readers = Seq("reach", "medscan")
  val dbs = Seq("pc", "signor")

  // deterministic synthetic corpus in the spirit of _build_test_set
  // (tests/test_query.py:24-178): 4 agents x 5 types x source subsets x mesh
  val stmts: Seq[Stmt] = {
    val rng = new scala.util.Random(42)
    val agentIds = Seq("ERK", "TP53", "MEK", "Vemurafenib")
    val namespaces = Seq("NAME", "TEXT", "FPLX", "CHEBI")
    val allSrcs = Seq("reach", "medscan", "pc", "signor")
    (1 to 80).map { i =>
      val nAg = 1 + rng.nextInt(3)
      val agents = (0 until nAg).map { k =>
        (k, namespaces(rng.nextInt(4)), agentIds(rng.nextInt(4)),
          rng.nextInt(3) - 1)
      }
      val srcs = rng.shuffle(allSrcs).take(1 + rng.nextInt(4))
        .map(s => s -> (1 + rng.nextInt(5))).toMap
      val mesh = (0 until rng.nextInt(3)).map { _ =>
        val m = rng.nextInt(10).toLong
        (m, m % 2 == 1)
      }
      val pmids = (0 to rng.nextInt(2)).map(_ => rng.nextInt(20).toLong)
      Stmt(i.toLong * 31 + 7, types.sorted(rng.nextInt(5)), agents, srcs,
        mesh, pmids)
    }
  }

  val all: Set[Long] = stmts.map(_.hash).toSet

  /** Deterministic evidence rows (sid, hash, src, rid, pmid) — the single
    * source of truth shared by the Spark world and the oracle evaluator. */
  val evRows: Seq[(Long, Long, String, Long, Long)] = {
    var sid = 0L
    stmts.flatMap { s =>
      var j = 0
      s.srcCounts.toSeq.sortBy(_._1).flatMap { case (src, n) =>
        (1 to n).map { _ =>
          sid += 1; j += 1
          (sid, s.hash, src, sid, s.pmids((j - 1) % s.pmids.size))
        }
      }
    }
  }
  val pmidsByStmt: Map[Long, Set[Long]] =
    evRows.groupBy(_._2).map { case (h, rows) => h -> rows.map(_._5).toSet }

  /** Naive reference evaluator — plain set semantics, no Spark. */
  def eval(q: StmtQuery): Set[Long] = q match {
    case EmptyQuery => Set.empty
    case FullQuery => all
    case HasAgent(id, ns, role, agNum, inv) =>
      val rid = QueryCompiler.regularizeAgentId(id, ns)
      def idMatch(s: String): Boolean =
        if (rid.contains('%') || rid.contains('_'))
          s.matches(rid.replace("%", ".*").replace("_", "."))
        else s == rid
      val pos = stmts.filter(_.agents.exists { case (k, dn, di, rn) =>
        dn == (if (ns == "AUTO") "NAME" else ns) && idMatch(di) &&
          role.forall(r => graft.core.Roles.toNum(r) == rn) &&
          agNum.forall(_ == k)
      }).map(_.hash).toSet
      if (inv) all -- pos else pos
    case HasHash(hs, inv) =>
      if (inv) all -- hs else all.intersect(hs)
    case HasSources(srcs, inv) =>
      val pos = stmts.filter(s => srcs.forall(s.srcCounts.contains))
        .map(_.hash).toSet
      if (inv) all -- pos else pos
    case HasOnlySource(src, inv) =>
      val pos = stmts.filter(s => s.srcCounts.keySet == Set(src))
        .map(_.hash).toSet
      if (inv) all -- pos else pos
    case HasReadings(inv) =>
      val pos = stmts.filter(_.srcCounts.keySet.exists(readers.contains))
        .map(_.hash).toSet
      if (inv) all -- pos else pos
    case HasDatabases(inv) =>
      val pos = stmts.filter(_.srcCounts.keySet.exists(dbs.contains))
        .map(_.hash).toSet
      if (inv) all -- pos else pos
    case HasType(ts, sub, inv) =>
      val expanded =
        (if (sub) ts.flatMap(t => types.withSubclasses(t, TypeRegistry.indraHierarchy))
         else ts).toSet
      val pos = stmts.filter(s => expanded.contains(s.stype)).map(_.hash).toSet
      if (inv) all -- pos else pos
    case HasNumAgents(ns, inv) =>
      val pos = stmts.filter(s => ns.contains(s.agents.map(_._1).distinct.size))
        .map(_.hash).toSet
      if (inv) all -- pos else pos
    case HasNumEvidence(ns, inv) =>
      val pos = stmts.filter(s => ns.contains(s.srcCounts.values.sum))
        .map(_.hash).toSet
      if (inv) all -- pos else pos
    case HasEvidenceBound(bs, inv) =>
      def ok(n: Long, b: EvBound) = b.op match {
        case "<" => n < b.value; case ">" => n > b.value
        case "<=" => n <= b.value; case ">=" => n >= b.value
        case "==" => n == b.value; case "!=" => n != b.value
      }
      val pos = stmts.filter(s => bs.forall(ok(s.srcCounts.values.sum, _)))
        .map(_.hash).toSet
      if (inv) all -- pos else pos
    case FromPapers(papers, inv) =>
      val ids = papers.map(_._2.toLong).toSet
      val pos = stmts
        .filter(s => pmidsByStmt.getOrElse(s.hash, Set.empty).exists(ids.contains))
        .map(_.hash).toSet
      if (inv) all -- pos else pos
    case m: FromMeshIds =>
      val nums = m.meshNums.toSet
      val pos = stmts
        .filter(_.mesh.exists { case (n, c) => c == m.isConcept && nums.contains(n) })
        .map(_.hash).toSet
      if (m.inverted) all -- pos else pos
    case Intersection(qs) => qs.map(eval).reduce(_ intersect _)
    case Union(qs) => qs.map(eval).reduce(_ union _)
  }

  /** Spark-side world for ReadonlyBuilder. */
  def world(spark: SparkSession): StatementWorld = {
    import spark.implicits._
    val ev = evRows
    val evDF = ev.toDF("sid", "mk_hash", "src", "rid", "pmid")
    val agDF = stmts.flatMap(s => s.agents.map { case (k, dn, di, rn) =>
      (s.hash, k, dn, di, rn)
    }).toDF("mk_hash", "ag_num", "db_name", "db_id", "role_num")
    // attach each mesh annotation to every evidence row of the statement
    val evByStmt = ev.groupBy(_._2)
    val meshDF = stmts.flatMap { s =>
      s.mesh.flatMap { case (m, c) =>
        evByStmt.getOrElse(s.hash, Nil).map(e => (e._1, m, if (c) 1 else 0))
      }
    }.toDF("sid", "mesh_num", "is_concept")
    val refsDF = ev.map(e => (e._4, e._5, e._2)).toDF("rid", "pmid", "trid")
    val stDF = stmts.map(s => (s.hash, s.stype, 0.5)).toDF("mk_hash", "stype", "belief")
    StatementWorld(stDF, evDF, agDF, meshDF, refsDF)
  }
}

class DslAlgebraSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("dsl-algebra-test")
  lazy val ro: ReadonlyTables =
    ReadonlyBuilder.build(spark, Fixture.world(spark), Fixture.types,
      Fixture.readers, Fixture.dbs).persistAll()

  def engine(q: StmtQuery): Set[Long] =
    QueryCompiler.compile(q, ro, Fixture.types)
      .select("mk_hash").collect().map(_.getLong(0)).toSet

  val baseQueries: Seq[StmtQuery] = Seq(
    HasAgent("ERK"),
    HasAgent("MEK", role = Some("SUBJECT")),
    HasAgent("TP53", namespace = "TEXT"),
    HasAgent("Vemurafenib", namespace = "CHEBI", agentNum = Some(0)),
    HasAgent("%E%"), // LIKE wildcard: matches ERK and MEK names
    HasSources(Seq("reach")),
    HasSources(Seq("reach", "signor")),
    HasOnlySource("medscan"),
    HasReadings(),
    HasDatabases(),
    HasType(Seq("Phosphorylation")),
    HasType(Seq("Activation", "Complex")),
    HasType(Seq("Modification"), includeSubclasses = true), // expands to Phosphorylation
    HasType(Seq("RegulateActivity"), includeSubclasses = true),
    HasNumAgents(Seq(2, 3)),
    HasNumEvidence(Seq(1, 2, 3)),
    HasEvidenceBound(Seq(EvBound.parse(">= 5"))),
    HasHash(Fixture.stmts.take(5).map(_.hash).toSet),
    FromPapers(Seq("pmid" -> "3", "pmid" -> "7")),
    FromMeshIds(Seq("D2", "D4")),
    FromMeshIds(Seq("C3")),
    FromMeshIds(Seq("D2", "C3")),
  )

  test("fixture sanity: every base query selects a proper nonempty subset somewhere") {
    val sizes = baseQueries.map(q => Fixture.eval(q).size)
    assert(sizes.count(_ > 0) >= baseQueries.size - 2, s"too many empty: $sizes")
  }

  test("base queries: engine == set-algebra oracle") {
    for (q <- baseQueries)
      assert(engine(q) == Fixture.eval(q), s"mismatch for $q")
  }

  test("complement law: engine(~q) == all -- oracle(q)") {
    for (q <- baseQueries)
      assert(engine(~q) == (Fixture.all -- Fixture.eval(q)), s"mismatch for ~$q")
  }

  test("pair compositions (sampled): & and | match set algebra") {
    val rng = new scala.util.Random(7)
    val pairs = rng.shuffle(
      (for (a <- baseQueries; b <- baseQueries if a != b) yield (a, b)).toVector
    ).take(40)
    for ((a, b) <- pairs) {
      assert(engine(a & b) == (Fixture.eval(a) intersect Fixture.eval(b)),
        s"AND mismatch: $a & $b")
      assert(engine(a | b) == (Fixture.eval(a) union Fixture.eval(b)),
        s"OR mismatch: $a | $b")
    }
  }

  test("mixed polarity and De Morgan (sampled)") {
    val rng = new scala.util.Random(11)
    val pairs = rng.shuffle(
      (for (a <- baseQueries; b <- baseQueries if a != b) yield (a, b)).toVector
    ).take(20)
    for ((a, b) <- pairs) {
      assert(engine(a & ~b) == (Fixture.eval(a) -- Fixture.eval(b)),
        s"a & ~b mismatch: $a, $b")
      assert(engine(~(a | b)) == (Fixture.all -- (Fixture.eval(a) union Fixture.eval(b))),
        s"~(a|b) mismatch: $a, $b")
    }
  }

  test("triple compositions through the engine (sampled)") {
    val rng = new scala.util.Random(13)
    val qs = baseQueries
    val triples = rng.shuffle(
      (for (a <- qs; b <- qs; c <- qs if a != b && b != c) yield (a, b, c)).toVector
    ).take(12)
    for ((a, b, c) <- triples) {
      assert(engine((a & b) | c) ==
        ((Fixture.eval(a) intersect Fixture.eval(b)) union Fixture.eval(c)),
        s"(a&b)|c mismatch: $a, $b, $c")
      assert(engine(a & (b | ~c)) ==
        (Fixture.eval(a) intersect
          (Fixture.eval(b) union (Fixture.all -- Fixture.eval(c)))),
        s"a&(b|~c) mismatch: $a, $b, $c")
    }
  }

  test("algebraic rewrites preserve semantics (exhaustive, in-memory)") {
    for (a <- baseQueries; b <- baseQueries) {
      assert(Fixture.eval(a & b) == (Fixture.eval(a) intersect Fixture.eval(b)))
      assert(Fixture.eval(a | b) == (Fixture.eval(a) union Fixture.eval(b)))
      assert(Fixture.eval(~(a & b)) ==
        (Fixture.all -- (Fixture.eval(a) intersect Fixture.eval(b))))
    }
  }

  test("triple compositions preserve semantics (exhaustive, in-memory)") {
    val qs = baseQueries.take(12)
    for (a <- qs; b <- qs; c <- qs) {
      assert(Fixture.eval((a & b) | c) ==
        ((Fixture.eval(a) intersect Fixture.eval(b)) union Fixture.eval(c)))
      assert(Fixture.eval(a & (b | c)) ==
        (Fixture.eval(a) intersect (Fixture.eval(b) union Fixture.eval(c))))
    }
  }

  test("identity and annihilator laws") {
    val q = baseQueries.head
    assert((q & FullQuery) == q)
    assert((q | EmptyQuery) == q)
    assert((q & EmptyQuery).isEmpty)
    assert((q | FullQuery).isFull)
    assert((q & ~q).isEmpty)
    assert((q | ~q).isFull)
    assert((q & q) == q)
    assert((q | q) == q)
  }

  test("same-class list merges") {
    val h1 = HasHash(Set(1L, 2L, 3L))
    val h2 = HasHash(Set(2L, 3L, 4L))
    assert((h1 & h2) == HasHash(Set(2L, 3L)))
    assert((h1 | h2) == HasHash(Set(1L, 2L, 3L, 4L)))
    val t1 = HasType(Seq("Activation", "Complex"))
    val t2 = HasType(Seq("Complex", "Inhibition"))
    assert((t1 & t2) == HasType(Seq("Complex")))
  }
}
