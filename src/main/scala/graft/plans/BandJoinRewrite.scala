package graft.plans

import graft.functions.{GraftBandBucket, GraftBandJoin}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule (preference-ladder item (c), SURVEY.md §2): rewrites
  * any INNER join whose condition carries a [[GraftBandJoin]] marker
  * conjunct from the plan Catalyst would otherwise pick — a
  * BroadcastNestedLoopJoin evaluating the band predicate over
  * O(|L|·|R|) pairs, with one whole side broadcast to every executor —
  * into the linear bucketed equi-join of
  * [[graft.operators.Temporal.bandJoinBackward]]:
  *
  *   - probe side (the one holding the marker's `leftTime`) explodes
  *     each row into its own time bucket and the previous one
  *     (bucket width = the band, so a backward band spans ≤ 2 buckets);
  *   - build side projects its single bucket id;
  *   - hash equi-join on the bucket, then the ORIGINAL condition —
  *     marker included — reruns as a residual filter.
  *
  * Row traffic through the exchange is 2·|L| + |R| instead of a
  * full-side broadcast; each qualifying pair matches in exactly one
  * probed bucket, so no dedup is needed. Because the residual filter
  * re-applies the exact predicate, the rewrite is semantics-preserving
  * by construction: it can only ever change the PLAN. Registered via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`) or per-session
  * with `spark.experimental.extraOptimizations`.
  *
  * The rule deliberately leaves non-inner joins and data-dependent
  * bands (non-foldable `bandSeconds`, rejected at analysis anyway) to
  * the generic path, and skips band = 0 (bucket width would be zero;
  * Catalyst's BNLJ is fine for a degenerate exact-instant band).
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // JoinHint.NONE only: an explicit user hint (/*+ MERGE */ etc.)
    // names a strategy for THIS join; the rewrite replaces it with a
    // structurally different join the hint can't transfer to, so the
    // user's override wins and the marker just evaluates generically
    case j @ Join(l, r, Inner, Some(cond), JoinHint.NONE) =>
      val conjuncts = splitConjunctivePredicates(cond)
      conjuncts.collectFirst {
        case m: GraftBandJoin
        if m.bandMicros > 0 && probeBuild(m, l, r).isDefined => m
      } match {
        case Some(m) => rewrite(j, m, conjuncts)
        case None    => j
      }
  }

  /** (probe, build) = (side holding leftTime, side holding rightTime),
    * in either orientation across the join. */
  private def probeBuild(m: GraftBandJoin, l: LogicalPlan,
                         r: LogicalPlan): Option[(LogicalPlan, LogicalPlan)] =
    if (m.first.references.subsetOf(l.outputSet) &&
        m.second.references.subsetOf(r.outputSet)) Some((l, r))
    else if (m.first.references.subsetOf(r.outputSet) &&
             m.second.references.subsetOf(l.outputSet)) Some((r, l))
    else None

  private def rewrite(j: Join, m: GraftBandJoin,
                      conjuncts: Seq[Expression]): LogicalPlan = {
    val Some((probe, build)) = probeBuild(m, j.left, j.right)
    val w = m.bandMicros
    val pb = GraftBandBucket(m.first, w)
    val arr = CreateArray(Seq(pb, Subtract(pb, Literal(1L))))
    val gen = Explode(arr)
    val elem = gen.elementSchema.head
    val bucket = AttributeReference("__graft_bucket", LongType, elem.nullable)()
    val probed = Generate(gen, Nil, outer = false, None, Seq(bucket), probe)
    val rb = Alias(GraftBandBucket(m.second, w), "__graft_rbucket")()
    val built = Project(build.output :+ rb, build)
    val joined = Join(probed, built, Inner,
      Some(EqualTo(bucket, rb.toAttribute)), JoinHint.NONE)
    // the FULL original condition (marker + every other conjunct) as
    // the residual — exactness and any extra predicates preserved
    Project(j.output, Filter(conjuncts.reduce(And), joined))
  }
}
