package graft.sources

/** Nearline read planning: decide Scan vs Query vs Get(s) from pushed
  * predicates — a pure-function re-expression of the reference's
  * `DynamoReadBuilder` / `DynamoFilterBuilder` state machine
  * (`storage-dynamo/.../filter/DynamoFilterBuilder.java:120-304`,
  * `DynamoReadBuilder.java:124-260`, SURVEY.md §4 R4).
  *
  * Decision table (as pinned by `TestDynamoFilterPushdown`):
  *   - hash-key `=`                        → Query(hash)
  *   - hash `=` AND sort `=`               → Get(hash, sort)
  *   - hash `=` AND sort range (<,<=,>,>=,BETWEEN) → Query(hash, sortRange)
  *   - OR of key-equality conjuncts        → list of Gets/Queries
  *   - attribute predicates               → attached as a filter expression
  *     to the Query/Scan; any shape that can't attach degrades to Scan
  *     with the whole predicate as the filter (never wrong, just slower)
  *   - partial conversion keeps a residual engine-side filter.
  */
object ReadPlanner {

  /** Minimal predicate algebra over a key/attribute namespace. */
  sealed trait Pred
  case class Eq(field: String, value: String) extends Pred
  /** `<>` — server-evaluable as an attribute filter (the reference's
    * pushdown map includes it, `DynamoFilterSpec.java:25-46`), but never a
    * key condition: it lands in the filter expression of a Scan/Query. */
  case class Ne(field: String, value: String) extends Pred
  /** op ∈ {"<", "<=", ">", ">="} */
  case class Cmp(field: String, op: String, value: String) extends Pred
  case class Between(field: String, lo: String, hi: String) extends Pred
  case class And(ps: Seq[Pred]) extends Pred
  case class Or(ps: Seq[Pred]) extends Pred
  /** Anything not expressible here (IS NULL, LIKE, functions…). */
  case class Opaque(description: String) extends Pred

  sealed trait Read { def residual: Option[Pred] }
  /** Full parallel segmented scan with an optional server-side filter. */
  case class Scan(filter: Option[Pred], residual: Option[Pred]) extends Read
  /** Hash-key query, optional sort-key condition, optional attribute filter. */
  case class Query(hash: String, sortCond: Option[Pred], filter: Option[Pred],
      residual: Option[Pred]) extends Read
  /** Full-primary-key point get. */
  case class Get(hash: String, sort: String, residual: Option[Pred]) extends Read
  /** OR of key-equalities → independent keyed reads, unioned. */
  case class MultiRead(reads: Seq[Read]) extends Read {
    def residual: Option[Pred] = None
  }

  /** Plan a read for a table with the given hash/sort key names. `pred`
    * is the full pushed predicate (None = full scan). */
  def plan(hashKey: String, sortKey: String, pred: Option[Pred]): Read = pred match {
    case None => Scan(None, None)
    case Some(p) => planPred(hashKey, sortKey, p)
  }

  private def planPred(hk: String, sk: String, p: Pred): Read = p match {
    case Eq(`hk`, v) => Query(v, None, None, None)
    case And(ps) => planAnd(hk, sk, flattenAnd(ps))
    case Or(ps) =>
      val subs = ps.map(planPred(hk, sk, _))
      // Only OR branches that each resolved to a keyed read may fan out into
      // a MultiRead; any branch that fell back to Scan forces a single Scan
      // of the whole disjunction (DynamoFilterBuilder.java OR handling).
      if (subs.forall { case _: Get | _: Query => true; case _ => false }) MultiRead(subs)
      else scanOf(p)
    case single => scanOf(single)
  }

  private def planAnd(hk: String, sk: String, ps: Seq[Pred]): Read = {
    val hashIdx = ps.indexWhere { case Eq(`hk`, _) => true; case _ => false }
    if (hashIdx < 0) {
      // No direct hash equality — but Catalyst factors common conjuncts
      // out of an OR of key equalities: (p=A AND s=1) OR (p=B AND s=1)
      // arrives as s=1 AND (p=A OR p=B). Distribute the And back over the
      // first OR whose every branch carries a hash equality — recovering
      // the MultiRead of keyed reads (the reference's OR-of-keys handling)
      // for the archetypal "these partitions, this time range" query.
      // A ∧ (B ∨ C) ≡ (A∧B) ∨ (A∧C), so this is semantics-preserving
      // (pinned by ReadPlannerProps).
      def hasHashEq(p: Pred): Boolean = p match {
        case Eq(`hk`, _) => true
        case And(inner)  => inner.exists(hasHashEq)
        case _           => false
      }
      val orIdx = ps.indexWhere {
        case Or(branches) => branches.forall(hasHashEq)
        case _            => false
      }
      if (orIdx < 0) scanOf(And(ps)) // truly no keyed shape → Scan
      else {
        val branches = ps(orIdx).asInstanceOf[Or].ps
        val rest = ps.patch(orIdx, Nil, 1)
        val subs = branches.map(b => planPred(hk, sk, And(b +: rest)))
        if (subs.forall { case _: Get | _: Query => true; case _ => false }) MultiRead(subs)
        else scanOf(And(ps))
      }
    } else {
      val h = ps(hashIdx).asInstanceOf[Eq].value
      // Remove exactly ONE hash equality: a second `hk = other` conjunct
      // (contradiction unless equal) must stay behind as a filter, or the
      // read would silently return extra rows.
      val rest = ps.patch(hashIdx, Nil, 1)
      val sortIdx = rest.indexWhere { case Eq(`sk`, _) => true; case _ => false }
      if (sortIdx >= 0) {
        val sv = rest(sortIdx).asInstanceOf[Eq].value
        Get(h, sv, andOpt(rest.patch(sortIdx, Nil, 1)))
      } else {
        val (sortPs, attrPs) = rest.partition {
          case Cmp(`sk`, _, _) | Between(`sk`, _, _) => true
          case _ => false
        }
        // Reconstruct BETWEEN from a `<=`/`>=` pair (BetweenBuilder.java).
        val sortCond = sortPs match {
          case Nil => None
          case Seq(one) => Some(one)
          case Seq(Cmp(f, ">=", lo), Cmp(_, "<=", hi)) => Some(Between(f, lo, hi))
          case Seq(Cmp(f, "<=", hi), Cmp(_, ">=", lo)) => Some(Between(f, lo, hi))
          case many => Some(And(many))
        }
        val (filterable, opaque) = attrPs.partition(isFilterable)
        Query(h, sortCond, andOpt(filterable), andOpt(opaque))
      }
    }
  }

  /** Predicates the store can evaluate server-side: =, <>, <, <=, >, >=,
    * BETWEEN over scalars (DynamoFilterSpec.java:25-46). LIKE/IS NULL etc.
    * stay residual. */
  private def isFilterable(p: Pred): Boolean = p match {
    case _: Eq | _: Ne | _: Cmp | _: Between => true
    case And(ps) => ps.forall(isFilterable)
    case Or(ps)  => ps.forall(isFilterable)
    case _: Opaque => false
  }

  private def scanOf(p: Pred): Scan =
    if (isFilterable(p)) Scan(Some(p), None) else Scan(None, Some(p))

  private def flattenAnd(ps: Seq[Pred]): Seq[Pred] =
    ps.flatMap { case And(inner) => flattenAnd(inner); case other => Seq(other) }

  private def andOpt(ps: Seq[Pred]): Option[Pred] = ps match {
    case Nil => None
    case Seq(one) => Some(one)
    case many => Some(And(many))
  }

  /** Parallelization: number of scan segments for a table, mirroring the
    * reference heuristics (`DynamoGroupScan.java:127-164`; defaults
    * `ParallelScanProperties.java:19-26`). */
  def scanSegments(
      approxRows: Long,
      executors: Int,
      segmentsPerExecutor: Int = 10,
      approxRowsPerExecutor: Long = 1000,
      maxSegments: Int = 1000000): Int = {
    val byRows = math.ceil(approxRows.toDouble / math.max(1, approxRowsPerExecutor)).toInt
    math.max(1, math.min(math.min(byRows, executors * segmentsPerExecutor), maxSegments))
  }
}
