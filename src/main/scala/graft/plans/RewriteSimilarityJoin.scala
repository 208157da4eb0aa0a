package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.functions.{CosineSimilarity, LshFunctions}

/** Opt-in optimizer rule (SURVEY.md §4.2's "future rule", delivered):
  * rewrites a brute-force similarity join
  *
  * {{{ A CROSS JOIN B WHERE cosine_sim(A.va, B.vb) >= τ  ... }}}
  *
  * into an LSH-banded candidate equi-join: both sides are exploded to
  * SimHash band keys, joined on key equality, the ORIGINAL predicate
  * re-applied exactly, and the pair multiplicity restored with a
  * group-by-all-columns dedup. The O(|A|·|B|) cross product becomes
  * bucket-sized work — the difference between impossible and routine at
  * 100 TB.
  *
  * This is an APPROXIMATE rewrite: a qualifying pair whose vectors share
  * no band key is lost (recall < 1, higher τ → higher recall; identical
  * vectors always share all bands). It therefore NEVER fires by default —
  * it must be enabled explicitly:
  *
  *  - `spark.graft.similarityJoin.rewrite` = true   (default false)
  *  - `spark.graft.similarityJoin.bits`    = 16     (hyperplane count)
  *  - `spark.graft.similarityJoin.bands`   = 4      (bits must divide)
  *  - `spark.graft.similarityJoin.dim`     = 64     (vector dimension —
  *      needed statically because the plane matrix is folded as a literal)
  *
  * Matched shape: an Inner/Cross Join whose condition (where predicate
  * pushdown lands the filter) has a conjunct `cosine_sim(x, y) >= lit` /
  * `> lit` (optionally `round`ed) with x and y each referencing exactly
  * one side — and NO cross-side equality conjunct (such a join already
  * has a hash key; the rewrite would only add work). Everything else is
  * left untouched. Note the dedup also collapses duplicate input ROWS on
  * either side (a cross join of duplicates emits multiplicity);
  * similarity-join inputs are keyed in practice, and the exactness of the
  * re-applied predicate is unaffected.
  */
case class RewriteSimilarityJoin() extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.similarityJoin.rewrite", "false").toBoolean

  /** Unwrap `cosine_sim(...)` possibly inside `round(..., s)`. */
  private def asCosine(e: Expression): Option[CosineSimilarity] = e match {
    case cs: CosineSimilarity => Some(cs)
    case Round(cs: CosineSimilarity, _, _) => Some(cs)
    case _ => None
  }

  /** A conjunct of the form cosine >= τ / cosine > τ (literal threshold). */
  private def thresholdCosine(e: Expression): Option[CosineSimilarity] = e match {
    case GreaterThanOrEqual(c, Literal(_, DoubleType)) => asCosine(c)
    case GreaterThan(c, Literal(_, DoubleType)) => asCosine(c)
    case _ => None
  }

  /** Band-key expressions built from RESOLVED Catalyst nodes only — the
    * rule runs post-analysis, so Column-API trees (unresolved functions,
    * unbound lambdas) cannot be injected. The constant plane matrix is
    * unrolled instead: per plane a sign-folded Add chain (same ±1
    * Rademacher planes as [[LshFunctions.simhashPlanes]]), per band a
    * Concat of its sign bits with the band index as prefix. */
  private def bandKeysFor(vec: Expression, bits: Int, bands: Int, dim: Int): Expression = {
    val planes = LshFunctions.simhashPlanes(bits, dim)
    val r = bits / bands
    val bitExprs: Seq[Expression] = planes.map { p =>
      val terms: Seq[Expression] = (0 until dim).map { i =>
        val el: Expression = GetArrayItem(vec, Literal(i))
        if (p(i) > 0) el else UnaryMinus(el)
      }
      val dot = terms.reduceLeft[Expression]((a, b) => Add(a, b))
      If(GreaterThanOrEqual(dot, Literal(0.0)), Literal("1"), Literal("0"))
    }
    CreateArray((0 until bands).map { b =>
      Concat(Literal(s"$b:") +: bitExprs.slice(b * r, b * r + r))
    })
  }

  /** Explode `vec`'s band keys under `child`, returning (plan, key attr). */
  private def withBandKeys(child: LogicalPlan, vec: Expression,
                           bits: Int, bands: Int, dim: Int,
                           tag: String): (LogicalPlan, Attribute) = {
    val gen = Explode(bandKeysFor(vec, bits, bands, dim))
    val keyAttr = AttributeReference(s"${KeyPrefix}_$tag", StringType,
      nullable = gen.elementSchema.head.nullable)()
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(keyAttr), child), keyAttr)
  }

  private val KeyPrefix = "__graft_band_key"

  /** Already-rewritten subtrees carry the band-key attrs in their child
    * outputs — the guard that keeps the rule from firing on its own
    * output when predicate pushdown folds the exact filter back into the
    * candidate join's condition. */
  private def alreadyRewritten(left: LogicalPlan, right: LogicalPlan): Boolean =
    left.output.exists(_.name.startsWith(KeyPrefix)) ||
      right.output.exists(_.name.startsWith(KeyPrefix))

  /** A cross-side equality conjunct means the join already has a hash-join
    * key — its candidate space is not the cross product, so the LSH
    * rewrite would only add work. Leave such joins alone. */
  private def hasEquiKey(conjuncts: Seq[Expression],
                         left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
          (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val bits = conf.getConfString("spark.graft.similarityJoin.bits", "16").toInt
    val bands = conf.getConfString("spark.graft.similarityJoin.bands", "4").toInt
    val dim = conf.getConfString("spark.graft.similarityJoin.dim", "64").toInt

    // By the time extended optimizer rules run, PushPredicateThroughJoin
    // has folded the filter into the join condition, so the matched shape
    // is the Join itself with the cosine threshold among its conjuncts.
    // the conjunct the rewrite keys on must itself be cross-side (one vector
    // per child) — picking any threshold-cosine conjunct could select one
    // whose operands straddle sides and bind the Generate to wrong attrs
    def crossSideCosine(cond: Expression, left: LogicalPlan,
                        right: LogicalPlan): Option[CosineSimilarity] =
      splitConjunctivePredicates(cond).iterator
        .flatMap(thresholdCosine(_))
        .find(cs =>
          (cs.left.references.subsetOf(left.outputSet) &&
            cs.right.references.subsetOf(right.outputSet)) ||
          (cs.left.references.subsetOf(right.outputSet) &&
            cs.right.references.subsetOf(left.outputSet)))

    plan.transform {
      case j @ Join(left, right, Inner | Cross, Some(cond), hint)
          if !alreadyRewritten(left, right) &&
            !hasEquiKey(splitConjunctivePredicates(cond), left, right) &&
            crossSideCosine(cond, left, right).isDefined =>
        val cs = crossSideCosine(cond, left, right).get
        val (leftVec, rightVec) =
          if (cs.left.references.subsetOf(left.outputSet)) (cs.left, cs.right)
          else (cs.right, cs.left)

        val (leftGen, lKey) = withBandKeys(left, leftVec, bits, bands, dim, "l")
        val (rightGen, rKey) = withBandKeys(right, rightVec, bits, bands, dim, "r")
        val candidateJoin = Join(leftGen, rightGen, Inner,
          Some(EqualTo(lKey, rKey)), hint)
        val exact = Filter(cond, candidateJoin)
        // one row per qualifying pair, as the original join emitted; also
        // drops the internal key columns, restoring the original output
        val out = j.output
        Aggregate(out, out, Project(out, exact))
    }
  }
}
