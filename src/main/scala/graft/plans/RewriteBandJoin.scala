package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Abs, Add, Alias, And, AttributeReference, CreateArray, EqualTo, Explode,
  Expression, IntegralDivide, LessThanOrEqual, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{
  Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a band join
  *
  *   A JOIN B ON abs(a.x - b.y) <= tol        -- x, y integral
  *
  * into the bucketed equi-join the manual `binned_range_join` query builds
  * by hand. Spark plans the naive condition as a broadcast-nested-loop —
  * every left row compared against every right row, quadratic at scale.
  * Bucketing by `w = tol` makes it a hash join: each right row lands in ONE
  * cell (`y div w`), each left row probes its cell ±1, and the original
  * predicate stays as the residual filter. Every qualifying pair shares
  * exactly one of the three probed cells (cells are ≥ w wide, so a step of
  * ≤ tol crosses at most one boundary — this holds for the double-width
  * cell 0 that `div`'s truncate-toward-zero produces too), and it shares it
  * exactly ONCE (the right row has a single cell) — so inner-join
  * multiplicity is preserved with no dedup pass. The same decomposition
  * Databricks' range-join hint and postGIS grid joins apply, expressed as a
  * Catalyst rewrite over plain operators: Generate(Explode) on the probe
  * side, a bucket column on the build side, equi-Join, residual.
  *
  * Scope guards: INNER joins only (the replicated probe side would change
  * outer-join multiplicity for unmatched rows); both band operands integral
  * (int/long — float buckets would need epsilon care), each referencing
  * exactly one join side; `tol` a positive integer literal; skips joins
  * already carrying a bucket column (the rewritten join still contains the
  * band conjunct, and the operator-optimization batch runs to fixpoint).
  *
  * Off by default; enabled per session/query with
  * `SET spark.graft.bandJoinRewrite=true` — same opt-in posture as
  * [[RewriteWindowTopK]].
  */
object RewriteBandJoin extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.bandJoinRewrite"
  val BucketName = "__graft_band_bucket"

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

  /** The band conjunct ⇒ (probe-side operand, build-side operand, tol),
    * operands oriented left/right. */
  private def bandOf(conjunct: Expression, join: Join): Option[(Expression, Expression, Long)] =
    conjunct match {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), lit) =>
        longLit(lit) match {
          case Some(tol) if tol > 0 && integral(a) && integral(b) &&
              a.deterministic && b.deterministic =>
            if (a.references.subsetOf(join.left.outputSet) &&
                b.references.subsetOf(join.right.outputSet)) Some((a, b, tol))
            else if (b.references.subsetOf(join.left.outputSet) &&
                a.references.subsetOf(join.right.outputSet)) Some((b, a, tol))
            else None
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, org.apache.spark.sql.catalyst.plans.Inner,
          Some(cond), hint)
          if !left.output.exists(_.name == BucketName) &&
             !right.output.exists(_.name.startsWith(BucketName)) =>
        splitConjuncts(cond).iterator.flatMap(bandOf(_, j)).nextOption() match {
          case Some((x, y, tol)) =>
            val w = Literal(tol, LongType)
            val xdiv = new IntegralDivide(x, w)
            val probeCells = CreateArray(Seq(
              new Subtract(xdiv, Literal(1L, LongType)),
              xdiv,
              new Add(xdiv, Literal(1L, LongType))))
            val bucketL =
              AttributeReference(BucketName, LongType, nullable = true)()
            val gen = Generate(Explode(probeCells), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(bucketL),
              child = left)
            val bucketR = Alias(new IntegralDivide(y, w), BucketName + "_r")()
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
