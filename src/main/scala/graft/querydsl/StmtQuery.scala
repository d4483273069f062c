package graft.querydsl

/** Compositional boolean query DSL over the assembled statement corpus.
  *
  * Re-expresses the reference's `Query` tree (indra_db/client/readonly/
  * query.py:350-1078): immutable algebraic nodes composed with `&`, `|`,
  * `~`, constructor-time logical rewrites (query.py:976-1062, :2520-2622,
  * :2805-2881), and leaf semantics from SURVEY.md §2.2. Compilation to
  * Spark plans lives in [[QueryCompiler]]; the algebra here is engine-
  * agnostic so the ScalaTest oracle harness can evaluate it against plain
  * Scala set algebra.
  */
sealed trait StmtQuery {
  def inverted: Boolean

  /** Logical complement (`~q`). De Morgan at merge nodes; leaves flip a flag
    * and compile to an anti-join (query.py:1752-1766). */
  def invert: StmtQuery
  def unary_~ : StmtQuery = invert

  def &(other: StmtQuery): StmtQuery = Intersection.of(Seq(this, other))
  def |(other: StmtQuery): StmtQuery = Union.of(Seq(this, other))

  /** True when the query provably selects nothing / everything — the
    * constant-folding short-circuits of query.py:935-944. */
  def isEmpty: Boolean = false
  def isFull: Boolean = false

  /** Inverse-pair detection (`is_inverse_of`, query.py:1069-1075). */
  def isInverseOf(other: StmtQuery): Boolean = invert == other
}

/** Neutral element for chain building (query.py:1081-1103). */
case object EmptyQuery extends StmtQuery {
  def inverted = false
  def invert: StmtQuery = FullQuery
  override def isEmpty = true
}

/** Complement of EmptyQuery: scan-everything (query.py full queries). */
case object FullQuery extends StmtQuery {
  def inverted = false
  def invert: StmtQuery = EmptyQuery
  override def isFull = true
}

// ---------------------------------------------------------------------------
// Leaves
// ---------------------------------------------------------------------------

/** Statements having an agent with the given grounding. Namespace routes the
  * scan: NAME -> name_meta, TEXT -> text_meta, else other_meta + db_name
  * filter (query.py:1615-1767, routing :1717-1725). */
final case class HasAgent(
    agentId: String,
    namespace: String = "NAME",
    role: Option[String] = None,
    agentNum: Option[Int] = None,
    inverted: Boolean = false,
) extends StmtQuery {
  // the reference raises on both (query.py:1683-1685)
  require(role.isEmpty || agentNum.isEmpty,
    "specify role OR agent_num, not both")
  def invert: StmtQuery = copy(inverted = !inverted)

  /** SQL LIKE wildcards in the id select pattern matching, as in the
    * reference's `db_id.like(regularized_id)` (query.py:1731-1732);
    * "%" alone matches any agent in the namespace. */
  def hasWildcard: Boolean = agentId.contains('%') || agentId.contains('_')
}

/** mk_hash ∈ list (query.py:1520-1579). */
final case class HasHash(hashes: Set[Long], inverted: Boolean = false)
    extends StmtQuery {
  def invert: StmtQuery = copy(inverted = !inverted)
  override def isEmpty: Boolean = hashes.isEmpty && !inverted
  override def isFull: Boolean = hashes.isEmpty && inverted
}

/** Evidence from ALL listed sources (conjunction of per-source count > 0;
  * inversion De Morgans to an OR of nulls, query.py:1399-1454). */
final case class HasSources(sources: Seq[String], inverted: Boolean = false)
    extends StmtQuery {
  require(sources.nonEmpty, "HasSources needs at least one source")
  def invert: StmtQuery = copy(inverted = !inverted)
}

/** Evidence exclusively from one source (query.py:1356-1396). */
final case class HasOnlySource(source: String, inverted: Boolean = false)
    extends StmtQuery {
  def invert: StmtQuery = copy(inverted = !inverted)
}

/** has_rd / has_db boolean flags (query.py:1457-1517). */
final case class HasReadings(inverted: Boolean = false) extends StmtQuery {
  def invert: StmtQuery = copy(inverted = !inverted)
}
final case class HasDatabases(inverted: Boolean = false) extends StmtQuery {
  def invert: StmtQuery = copy(inverted = !inverted)
}

/** Marker for constraints that are *intrusive*: pushed into every branch of
  * a merge rather than applied after it (IntrusiveQuery,
  * query.py:2051-2143). */
sealed trait IntrusiveQuery extends StmtQuery

/** type_num ∈ set, with optional subclass expansion (query.py:2307-2362). */
final case class HasType(
    types: Seq[String],
    includeSubclasses: Boolean = false,
    inverted: Boolean = false,
) extends IntrusiveQuery {
  def invert: StmtQuery = copy(inverted = !inverted)
  override def isEmpty: Boolean = types.isEmpty && !inverted
  override def isFull: Boolean = types.isEmpty && inverted
}

/** agent_count ∈ list (query.py:2146-2174). */
final case class HasNumAgents(nums: Seq[Int], inverted: Boolean = false)
    extends IntrusiveQuery {
  def invert: StmtQuery = copy(inverted = !inverted)
}

/** ev_count ∈ list (query.py:2177-2204). */
final case class HasNumEvidence(nums: Seq[Int], inverted: Boolean = false)
    extends IntrusiveQuery {
  def invert: StmtQuery = copy(inverted = !inverted)
}

/** ev_count satisfies all relational-string bounds, e.g. "< 10"
  * (query.py:2266-2304; `Bound` parser :2207-2263). */
final case class HasEvidenceBound(bounds: Seq[EvBound], inverted: Boolean = false)
    extends IntrusiveQuery {
  def invert: StmtQuery = copy(inverted = !inverted)
}

final case class EvBound(op: String, value: Long) {
  require(EvBound.ops.contains(op), s"bad bound op: $op")
  def invertOp: EvBound = EvBound(EvBound.inverseOf(op), value)
}
object EvBound {
  val ops = Set("<", ">", "<=", ">=", "==", "!=")
  val inverseOf: Map[String, String] = Map(
    "<" -> ">=", ">" -> "<=", "<=" -> ">", ">=" -> "<", "==" -> "!=", "!=" -> "==")
  /** Parse "< 10" style strings (Bound.from_string). */
  def parse(s: String): EvBound = {
    val t = s.trim.split("\\s+")
    EvBound(t(0), t(1).toLong)
  }
}

/** Evidence from the given papers, via reading_ref_link -> fast_raw_pa_link
  * (query.py:1811-1900). idType ∈ pmid|pmcid|doi|trid|tcid. */
final case class FromPapers(
    papers: Seq[(String, String)],
    inverted: Boolean = false,
) extends StmtQuery {
  def invert: StmtQuery = copy(inverted = !inverted)
}

/** Statements from papers annotated with the given MeSH ids. D-prefixed ids
  * route to mesh_term_meta, C-prefixed to mesh_concept_meta; a mixed list is
  * split into a Union at construction (query.py:1903-2048, split
  * :1926-1949). */
final case class FromMeshIds private[querydsl] (
    meshIds: Seq[String],
    inverted: Boolean = false,
) extends StmtQuery {
  def invert: StmtQuery = copy(inverted = !inverted)
  val isConcept: Boolean = meshIds.headOption.exists(_.startsWith("C"))
  /** prefix-stripped numeric ids (readonly_dumping.py:1848-1850) */
  def meshNums: Seq[Long] = meshIds.map(_.drop(1).toLong)
}
object FromMeshIds {
  /** Mixed C/D input auto-splits into a Union (query.py:1926-1949). */
  def apply(meshIds: Seq[String]): StmtQuery = {
    require(meshIds.nonEmpty, "FromMeshIds needs at least one id")
    require(meshIds.forall(id => id.startsWith("C") || id.startsWith("D")),
      "MeSH ids must start with C or D")
    val (c, d) = meshIds.partition(_.startsWith("C"))
    (c, d) match {
      case (cs, Nil) => new FromMeshIds(cs)
      case (Nil, ds) => new FromMeshIds(ds)
      case (cs, ds) => Union.of(Seq(new FromMeshIds(cs), new FromMeshIds(ds)))
    }
  }
}

/** Drill-down filter on agent_interactions by exact agent set — the
  * reference's FromAgentJson leaf (query.py:1155-1196), the node behind the
  * service's /expand endpoint: agentJson maps agent position to its NAME
  * grounding; optional statement-type and hash-list constraints narrow the
  * match (AgentInteractionMeta._apply_constraints, query.py:1106-1120). */
final case class FromAgentJson(
    agentJson: Map[Int, String],
    stmtType: Option[String] = None,
    hashes: Option[Set[Long]] = None,
    inverted: Boolean = false,
) extends StmtQuery {
  require(agentJson.nonEmpty, "FromAgentJson needs at least one agent")
  def invert: StmtQuery = copy(inverted = !inverted)

  /** Canonical rendering matching agent_interactions.agent_str (sorted
    * "num:id" entries joined with ";"). */
  def agentStr: String =
    agentJson.toSeq.map { case (n, id) => s"$n:$id" }.sorted.mkString(";")
}

// ---------------------------------------------------------------------------
// Merges
// ---------------------------------------------------------------------------

/** AND of subqueries. Construction applies the reference's rewrites
  * (query.py:2520-2622): flattening, idempotence, annihilators,
  * contradiction detection, same-class list merges (∩). */
final case class Intersection private[querydsl] (queries: Seq[StmtQuery])
    extends StmtQuery {
  def inverted = false
  def invert: StmtQuery = Union.of(queries.map(_.invert)) // De Morgan
}

/** OR of subqueries; dual rewrites (query.py:2805-2881), list merges (∪). */
final case class Union private[querydsl] (queries: Seq[StmtQuery])
    extends StmtQuery {
  def inverted = false
  def invert: StmtQuery = Intersection.of(queries.map(_.invert)) // De Morgan
}

object Intersection {
  def of(qs: Seq[StmtQuery]): StmtQuery =
    Merge.build(qs, isAnd = true)
}
object Union {
  def of(qs: Seq[StmtQuery]): StmtQuery =
    Merge.build(qs, isAnd = false)
}

private[querydsl] object Merge {
  /** Shared merge-constructor rewrites; `isAnd` selects Intersection
    * semantics, else Union. */
  def build(qs0: Seq[StmtQuery], isAnd: Boolean): StmtQuery = {
    // 1. flatten nested same-kind merges
    val flat = qs0.flatMap {
      case Intersection(sub) if isAnd => sub
      case Union(sub) if !isAnd => sub
      case q => Seq(q)
    }
    // 2. identity elements drop out; annihilators short-circuit
    val identityDropped = flat.filterNot(q => if (isAnd) q.isFull else q.isEmpty)
    if (identityDropped.exists(q => if (isAnd) q.isEmpty else q.isFull))
      return if (isAnd) EmptyQuery else FullQuery
    // 3. idempotence: q & q -> q
    val uniq = identityDropped.distinct
    // 4. contradiction / tautology: q & ~q -> empty ; q | ~q -> full
    val hasInversePair = uniq.combinations(2).exists {
      case Seq(a, b) => a.isInverseOf(b)
      case _ => false
    }
    if (hasInversePair) return if (isAnd) EmptyQuery else FullQuery
    // 5. same-class list merges (query.py:1032-1058): combine positive
    //    HasHash/HasType/HasNum* pairs set-wise (∩ for and, ∪ for or).
    val merged = mergeLists(uniq, isAnd)
    merged match {
      case Nil => if (isAnd) FullQuery else EmptyQuery
      case Seq(one) => one
      case many => if (isAnd) new Intersection(many) else new Union(many)
    }
  }

  private def setOp[A](a: Set[A], b: Set[A], isAnd: Boolean): Set[A] =
    if (isAnd) a.intersect(b) else a.union(b)

  private def mergeLists(qs: Seq[StmtQuery], isAnd: Boolean): Seq[StmtQuery] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[StmtQuery]
    for (q <- qs) {
      val merged = out.indices.collectFirst(Function.unlift { i =>
        (out(i), q) match {
          // positive ∧/∨ positive merges set-wise; inverted pairs merge with
          // the reversed operation (De Morgan on the complement sets).
          case (HasHash(a, ia), HasHash(b, ib)) if ia == ib =>
            Some(i -> HasHash(setOp(a, b, isAnd ^ ia), ia))
          case (HasType(a, sa, ia), HasType(b, sb, ib))
              if ia == ib && sa == sb =>
            Some(i -> HasType(
              setOp(a.toSet, b.toSet, isAnd ^ ia).toSeq.sorted, sa, ia))
          case (HasNumAgents(a, ia), HasNumAgents(b, ib)) if ia == ib =>
            Some(i -> HasNumAgents(
              setOp(a.toSet, b.toSet, isAnd ^ ia).toSeq.sorted, ia))
          case (HasNumEvidence(a, ia), HasNumEvidence(b, ib)) if ia == ib =>
            Some(i -> HasNumEvidence(
              setOp(a.toSet, b.toSet, isAnd ^ ia).toSeq.sorted, ia))
          case _ => None
        }
      })
      merged match {
        case Some((i, m)) => out(i) = m
        case None => out += q
      }
    }
    // a merged-to-empty positive list annihilates an AND; in an OR it's
    // just the empty contribution and drops out
    out.toSeq.flatMap {
      case h @ HasHash(s, false) if s.isEmpty => if (isAnd) Seq(h) else Nil
      case t @ HasType(s, _, false) if s.isEmpty => if (isAnd) Seq(t) else Nil
      case q => Seq(q)
    } match {
      case s if s.exists(_.isEmpty) && isAnd => Seq(EmptyQuery)
      case s => s
    }
  }
}
