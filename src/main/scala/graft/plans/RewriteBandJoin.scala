package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Abs, Add, Alias, And, AttributeReference, CreateArray, EqualTo, Explode,
  Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan,
  LessThanOrEqual, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{
  Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a band join — either form
  *
  *   A JOIN B ON abs(a.x - b.y) <= tol                    -- symmetric
  *   A JOIN B ON a.x >= b.y - c1 AND a.x <= b.y + c2      -- asymmetric
  *
  * (x, y integral; any orientation of each inequality; strict variants
  * normalized via the integer +1) into the bucketed equi-join the manual
  * `binned_range_join` query builds by hand. Spark plans the naive
  * condition as a broadcast-nested-loop — every left row against every
  * right row, quadratic at scale. The conjuncts are normalized into bounds
  * L ≤ x − y ≤ U; centering the band (y' = y + (L+U)/2, tol = the
  * half-width) makes even a far-offset asymmetric band bucket tightly.
  * Bucketing by w = tol then makes it a hash join: each right row lands in
  * ONE cell (y' div w), each left row probes its cell ±1, and the original
  * predicate stays as the residual filter. Every qualifying pair shares
  * exactly one of the three probed cells (cells are ≥ w wide, so a step of
  * ≤ tol crosses at most one boundary — this holds for the double-width
  * cell 0 that `div`'s truncate-toward-zero produces too), and it shares
  * it exactly ONCE (the right row has a single cell) — so inner-join
  * multiplicity is preserved with no dedup pass. The same decomposition
  * Databricks' range-join hint and postGIS grid joins apply, expressed as
  * a Catalyst rewrite over plain operators: Generate(Explode) on the probe
  * side, a bucket column on the build side, equi-Join, residual.
  *
  * Scope guards: INNER joins only (the replicated probe side would change
  * outer-join multiplicity for unmatched rows); both band operands
  * integral (int/long — float buckets would need epsilon care), each
  * referencing exactly one join side; bounds from integer literals (kept
  * below 2^40 to rule out offset-arithmetic overflow); skips joins already
  * carrying a bucket column (the rewritten join still contains the band
  * conjuncts, and the operator-optimization batch runs to fixpoint).
  *
  * Off by default; enabled per session/query with
  * `SET spark.graft.bandJoinRewrite=true` — same opt-in posture as
  * [[RewriteWindowTopK]]. Queries driving it must pin the rewritten tree
  * as their logical plan (Bridge.ofRows over optimizedPlan): a later
  * .write re-optimizes after the flag is dropped and would silently
  * resurrect the nested loop.
  */
object RewriteBandJoin extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.bandJoinRewrite"
  val BucketName = "__graft_band_bucket"

  /** |L|,|U| cap — far below any Long-overflow regime for offset sums. */
  private val MaxBound = 1L << 40

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** e decomposed as base ± literal offsets → (base, net offset). */
  private def baseOff(e: Expression): (Expression, Long) = e match {
    case Add(b, l, _) if longLit(l).isDefined =>
      val (bb, o) = baseOff(b); (bb, o + longLit(l).get)
    case Add(l, b, _) if longLit(l).isDefined =>
      val (bb, o) = baseOff(b); (bb, o + longLit(l).get)
    case Subtract(b, l, _) if longLit(l).isDefined =>
      val (bb, o) = baseOff(b); (bb, o - longLit(l).get)
    case _ => (e, 0L)
  }

  /** One bound on D = bl − br, with bl from the left side, br from the
    * right: (bl, br, isUpper, bound). */
  private type Bound = (Expression, Expression, Boolean, Long)

  private def sideOf(e: Expression, j: Join): Option[Boolean] =
    if (e.references.isEmpty || !e.deterministic || !integral(e)) None
    else if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None

  /** e1 + adj ≤ e2, oriented onto D = bl − br. */
  private def le(e1: Expression, e2: Expression, adj: Long, j: Join): Option[Bound] = {
    val (b1, o1raw) = baseOff(e1)
    val (b2, o2) = baseOff(e2)
    val o1 = o1raw + adj
    if (math.abs(o1) >= MaxBound || math.abs(o2) >= MaxBound) return None
    (sideOf(b1, j), sideOf(b2, j)) match {
      case (Some(true), Some(false)) => Some((b1, b2, true, o2 - o1)) // D ≤ o2−o1
      case (Some(false), Some(true)) => Some((b2, b1, false, o1 - o2)) // D ≥ o1−o2
      case _ => None
    }
  }

  /** a − b ≤ k, oriented onto D = bl − br. */
  private def diffLe(a: Expression, b: Expression, k: Long, j: Join): Option[Bound] = {
    val (ba, oa) = baseOff(a)
    val (bb, ob) = baseOff(b)
    val bound = k - oa + ob
    if (math.abs(bound) >= MaxBound) return None
    (sideOf(ba, j), sideOf(bb, j)) match {
      case (Some(true), Some(false)) => Some((ba, bb, true, bound)) // D ≤ bound
      case (Some(false), Some(true)) => Some((bb, ba, false, -bound)) // D ≥ −bound
      case _ => None
    }
  }

  private def boundsOf(conjunct: Expression, j: Join): Seq[Bound] = conjunct match {
    case LessThanOrEqual(Abs(Subtract(a, b, _), _), lit) =>
      longLit(lit) match {
        case Some(tol) if tol > 0 && tol < MaxBound =>
          (le(a, b, -tol, j) ++ le(b, a, -tol, j)).toSeq // |a−b| ≤ tol → both bounds
        case _ => Nil
      }
    // difference-vs-literal forms: (a − b) cmp k and mirrored — the generic
    // cases below can't split a cross-side Subtract
    case LessThanOrEqual(Subtract(a, b, _), l) if longLit(l).isDefined =>
      diffLe(a, b, longLit(l).get, j).toSeq
    case GreaterThanOrEqual(Subtract(a, b, _), l) if longLit(l).isDefined =>
      diffLe(b, a, -longLit(l).get, j).toSeq // a−b ≥ k ⟺ b−a ≤ −k
    case LessThan(Subtract(a, b, _), l) if longLit(l).isDefined =>
      diffLe(a, b, longLit(l).get - 1, j).toSeq
    case GreaterThan(Subtract(a, b, _), l) if longLit(l).isDefined =>
      diffLe(b, a, -longLit(l).get - 1, j).toSeq // a−b > k ⟺ b−a ≤ −k−1
    case LessThanOrEqual(l, Subtract(a, b, _)) if longLit(l).isDefined =>
      diffLe(b, a, -longLit(l).get, j).toSeq // k ≤ a−b
    case GreaterThanOrEqual(l, Subtract(a, b, _)) if longLit(l).isDefined =>
      diffLe(a, b, longLit(l).get, j).toSeq
    case LessThan(l, Subtract(a, b, _)) if longLit(l).isDefined =>
      diffLe(b, a, -longLit(l).get - 1, j).toSeq // k < a−b ⟺ b−a ≤ −k−1
    case GreaterThan(l, Subtract(a, b, _)) if longLit(l).isDefined =>
      diffLe(a, b, longLit(l).get - 1, j).toSeq
    case LessThanOrEqual(a, b) => le(a, b, 0, j).toSeq
    case GreaterThanOrEqual(a, b) => le(b, a, 0, j).toSeq
    case LessThan(a, b) => le(a, b, 1, j).toSeq // integral: a < b ⟺ a+1 ≤ b
    case GreaterThan(a, b) => le(b, a, 1, j).toSeq
    case _ => Nil
  }

  /** First (bl, br) pair carrying both a lower and an upper bound. */
  private def findBand(cond: Expression, j: Join): Option[(Expression, Expression, Long, Long)] = {
    val bounds = splitConjuncts(cond).flatMap(boundsOf(_, j))
    val grouped = bounds.groupBy { case (bl, br, _, _) =>
      (bl.canonicalized, br.canonicalized)
    }
    grouped.values.toSeq
      .sortBy(_.map(b => math.abs(b._4)).min) // deterministic pick
      .iterator.flatMap { bs =>
        val uppers = bs.collect { case (_, _, true, u) => u }
        val lowers = bs.collect { case (_, _, false, l) => l }
        if (uppers.isEmpty || lowers.isEmpty) None
        else {
          val (bl, br, _, _) = bs.head
          val (lo, hi) = (lowers.max, uppers.min)
          if (lo <= hi) Some((bl, br, lo, hi)) else None
        }
      }.nextOption()
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, org.apache.spark.sql.catalyst.plans.Inner,
          Some(cond), hint)
          if !left.output.exists(_.name == BucketName) &&
             !right.output.exists(_.name.startsWith(BucketName)) =>
        findBand(cond, j) match {
          case Some((x0, y0, lo, hi)) =>
            // post-analysis, so no implicit coercion: lift int operands to
            // long explicitly before mixing with the long literals
            def asLong(e: Expression): Expression =
              if (e.dataType == LongType) e
              else org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)
            val (x, y) = (asLong(x0), asLong(y0))
            // center the band: y' = y + δ, |x − y'| ≤ w
            val delta = Math.floorDiv(lo + hi, 2)
            val w = math.max(math.max(hi - delta, delta - lo), 1L)
            val wLit = Literal(w, LongType)
            val xdiv = new IntegralDivide(x, wLit)
            val probeCells = CreateArray(Seq(
              new Subtract(xdiv, Literal(1L, LongType)),
              xdiv,
              new Add(xdiv, Literal(1L, LongType))))
            val bucketL =
              AttributeReference(BucketName, LongType, nullable = true)()
            val gen = Generate(Explode(probeCells), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(bucketL),
              child = left)
            val yShift =
              if (delta == 0) y else new Add(y, Literal(delta, LongType))
            val bucketR =
              Alias(new IntegralDivide(yShift, wLit), BucketName + "_r")()
            val rightP = Project(right.output :+ bucketR, right)
            val newCond = And(EqualTo(bucketL, bucketR.toAttribute), cond)
            Project(j.output,
              Join(gen, rightP, org.apache.spark.sql.catalyst.plans.Inner,
                Some(newCond), hint))
          case None => j
        }
    }
  }
}
