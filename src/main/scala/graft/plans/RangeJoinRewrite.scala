package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Optimizer rule: rewrite a pure range-predicate inner join into the
  * bucketed equi-join of `operators/RangeJoin` — automatically.
  *
  * Spark has no native range-join optimization: `P JOIN I ON t >= lo AND
  * t <= hi` has no equi-key, so Catalyst plans a BroadcastNestedLoopJoin,
  * O(|P|·|I|) — the cartesian failure mode. `RangeJoin.pointInInterval`
  * is the hand-bucketed escape hatch; this rule applies the SAME rewrite
  * at the plan level, so users can write the natural join and still get
  * the linear plan:
  *
  *   point side  -> project  bin(t) = t - pmod(t, W)
  *   interval side -> generate explode(sequence(bin(lo), bin(hi), W))
  *   join on bin equality AND the original condition (kept verbatim as
  *   the residual filter — strict/inclusive bounds, extra conjuncts all
  *   preserved, so the rewrite is correctness-neutral by construction:
  *   each matching (point, interval) pair meets in exactly ONE bin, the
  *   one containing t).
  *
  * Fires only when ALL of the following hold (conservative by design):
  *  - inner join with a conjunctive condition containing a lower bound
  *    (`t > lo` / `t >= lo`) AND an upper bound (`t < hi` / `t <= hi`)
  *    on the SAME point-side expression `t`, with `lo`/`hi` both from
  *    the other side;
  *  - `t`, `lo`, `hi` are integer-typed (the engine's epoch-seconds
  *    convention; temporal types are cast upstream);
  *  - no equi-conjunct already joins the two sides (then Spark already
  *    plans a hash/sort-merge join and bucketing would only amplify
  *    rows) — this also makes the rule idempotent: its own output joins
  *    on bin equality;
  *  - all involved expressions are deterministic.
  *
  * Bin width comes from `spark.graft.rangeJoin.binWidth` (units of the
  * join columns; default 3600 — one hour of epoch seconds). Size it near
  * the typical interval length: amplification = length/W + 1. Degenerate
  * intervals (hi < lo) produce an empty bin array, not an error.
  *
  * Installed cluster-wide via `graft.functions.GraftExtensions`
  * (`injectOptimizerRule`) or per-session with [[ensureInstalled]].
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthConf = "spark.graft.rangeJoin.binWidth"

  /** Attach to an existing session (idempotent). */
  def ensureInstalled(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    }

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binWidth =
      try conf.getConfString(BinWidthConf, "3600").toLong
      catch { case _: NumberFormatException => 3600L }
    if (binWidth <= 0) return plan

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && cond.deterministic =>
        val conjuncts = splitConjunctivePredicates(cond)

        def sideOf(e: Expression): Option[Boolean] = {
          val refs = e.references
          if (refs.isEmpty) None
          else if (refs.subsetOf(left.outputSet)) Some(true)
          else if (refs.subsetOf(right.outputSet)) Some(false)
          else None
        }

        // an existing cross-side equi-conjunct → hash join territory
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (sideOf(a), sideOf(b)) match {
              case (Some(x), Some(y)) => x != y
              case _ => false
            }
          case _ => false
        }

        // (t, bound, tFromLeft) for every cross-side inequality, split by
        // direction; both spellings of each bound are normalized
        def bound(t: Expression, b: Expression): Option[(Expression, Expression, Boolean)] =
          (sideOf(t), sideOf(b)) match {
            case (Some(x), Some(y)) if x != y &&
                isIntegral(t) && isIntegral(b) &&
                t.deterministic && b.deterministic =>
              Some((t, b, x))
            case _ => None
          }
        val lowers = conjuncts.flatMap {
          case GreaterThanOrEqual(t, lo) => bound(t, lo)
          case GreaterThan(t, lo)        => bound(t, lo)
          case LessThanOrEqual(lo, t)    => bound(t, lo)
          case LessThan(lo, t)           => bound(t, lo)
          case _ => None
        }
        val uppers = conjuncts.flatMap {
          case LessThanOrEqual(t, hi)    => bound(t, hi)
          case LessThan(t, hi)           => bound(t, hi)
          case GreaterThanOrEqual(hi, t) => bound(t, hi)
          case GreaterThan(hi, t)        => bound(t, hi)
          case _ => None
        }
        val range = if (hasEqui) None else lowers.view.flatMap {
          case (t, lo, tLeft) => uppers.collectFirst {
            case (t2, hi, tLeft2) if t.semanticEquals(t2) && tLeft == tLeft2 =>
              (t, lo, hi, tLeft)
          }
        }.headOption

        range match {
          case None => j
          case Some((t, lo, hi, tFromLeft)) =>
            val w = Literal(binWidth, LongType)
            def binOf(x: Expression): Expression = {
              val xl = asLong(x)
              Subtract(xl, Pmod(xl, w))
            }
            val (pointPlan, intervalPlan) =
              if (tFromLeft) (left, right) else (right, left)

            val pBin = Alias(binOf(t), "__graft_bin_p")()
            val pointProj = Project(pointPlan.output :+ pBin, pointPlan)

            val emptyBins =
              Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false))
            val binLo = binOf(lo)
            val binHi = binOf(hi)
            val seq = If(LessThanOrEqual(binLo, binHi),
              Sequence(binLo, binHi, Some(w), Some(conf.sessionLocalTimeZone)),
              emptyBins)
            val iBin = AttributeReference("__graft_bin_i", LongType, nullable = false)()
            val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(iBin),
              child = intervalPlan)

            val newCond = And(EqualTo(pBin.toAttribute, iBin), cond)
            val rewritten =
              if (tFromLeft) Join(pointProj, gen, Inner, Some(newCond), hint)
              else Join(gen, pointProj, Inner, Some(newCond), hint)
            Project(j.output, rewritten)
        }
    }
  }
}
