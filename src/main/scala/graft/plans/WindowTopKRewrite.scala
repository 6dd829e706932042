package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule (the last extension point in the builder-prompt tour:
  * expression → aggregator → strategy/exec → RULE): rewrites the
  * canonical window-top-N idiom
  *
  *   Filter(rn <= k, Window(row_number over (partition p order s), p, s))
  *
  * into the bounded-heap [[TopKPerKey]] logical operator, so a user who
  * writes PLAIN window SQL gets the O(n log k) heap exec instead of a
  * full per-partition sort. Spark's own `InferWindowGroupLimit` only
  * PRUNES rows below the window (each partition still sorts the
  * survivors and runs WindowExec); this rule replaces the
  * sort+window+filter stack outright — when it fires on top of an
  * inferred [[WindowGroupLimit]], the limit node is stripped too (the
  * heap subsumes its pruning).
  *
  * Guards, in order of importance:
  *  - only `row_number` (rank/dense_rank admit >k rows on ties — a
  *    heap of k would drop tied rows);
  *  - single window expression (other functions over the same spec
  *    would be lost);
  *  - k in [1, MaxK]: the exec keeps O(#keys·k) rows in memory per
  *    partition, so a huge literal k must NOT silently become a
  *    memory commitment — past the bound the sort-based plan is the
  *    right one;
  *  - the rank comparison must be against a foldable integer literal
  *    (possibly through the analyzer's Cast), in either operand order;
  *    non-rank conjuncts survive as a residual Filter above.
  *
  * Tie semantics match the window form: both assign arbitrary order
  * among order-equal rows, so results are deterministic exactly when
  * the declared order is total — the same contract row_number already
  * has. Equality with the un-rewritten plan is asserted in
  * ExtensionsSpec across ties-free inputs, and the whole oracle
  * surface re-grades under the rule (it is injected session-wide). */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val MaxK = 10000

  private def attrOf(e: Expression): Option[Attribute] = e match {
    case a: Attribute => Some(a)
    case c: Cast => attrOf(c.child)
    case _ => None
  }
  private def intLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case c: Cast => intLit(c.child)
    case _ => None
  }

  /** The per-key row limit a predicate implies for `rn`, if any. */
  private def asLimit(cond: Expression, rn: Attribute): Option[Int] = {
    val k: Option[Long] = cond match {
      case LessThanOrEqual(l, r) =>
        for (a <- attrOf(l); v <- intLit(r) if a.semanticEquals(rn)) yield v
      case LessThan(l, r) =>
        for (a <- attrOf(l); v <- intLit(r) if a.semanticEquals(rn)) yield v - 1
      case GreaterThanOrEqual(l, r) =>
        for (v <- intLit(l); a <- attrOf(r) if a.semanticEquals(rn)) yield v
      case GreaterThan(l, r) =>
        for (v <- intLit(l); a <- attrOf(r) if a.semanticEquals(rn)) yield v - 1
      case EqualTo(l, r) =>
        for (a <- attrOf(l); v <- intLit(r) if a.semanticEquals(rn) && v == 1L) yield 1L
      case _ => None
    }
    k.filter(v => v >= 1 && v <= MaxK).map(_.toInt)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, Window(
          Seq(alias @ Alias(WindowExpression(RowNumber(), WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          partitionSpec, orderSpec, wChild, _))
        if orderSpec.nonEmpty => {
      val rn = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (rankConjuncts, rest) = conjuncts.partition(c => asLimit(c, rn).isDefined)
      if (rankConjuncts.isEmpty)
        // no rank bound to rewrite: return the MATCHED node untouched
        // (rebuilding it would silently drop the Window constructor
        // fields the pattern doesn't bind)
        f
      else {
        val k = rankConjuncts.flatMap(asLimit(_, rn)).min
        // an inferred WindowGroupLimit below the window is subsumed by
        // the heap — keep its child, drop its partial sort+prune pass
        val base = wChild match {
          case WindowGroupLimit(_, _, _, _, inner) => inner
          case other => other
        }
        val rankLong = AttributeReference("__rn_heap", LongType, nullable = false)()
        val topk = TopKPerKey(partitionSpec, orderSpec, k, rankLong, base)
        // restore the original rn attribute (name, type, exprId) so
        // every downstream reference keeps resolving
        val restored: LogicalPlan = Project(
          base.output :+ Alias(Cast(rankLong, IntegerType), alias.name)(exprId = alias.exprId),
          topk)
        if (rest.isEmpty) restored
        else Filter(rest.reduce(And), restored)
      }
    }
  }
}
