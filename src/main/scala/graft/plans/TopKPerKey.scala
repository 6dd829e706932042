package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator extension point (builder-prompt preference order (c)):
  * a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` for per-key
  * top-k — an operator Spark's DataFrame API only expresses as
  * window + `row_number` + filter, whose physical plan SORTS every
  * partition fully. This exec keeps one bounded k-heap per key instead:
  * shuffle on the keys (declared via `requiredChildDistribution`, so
  * Catalyst inserts the Exchange), then a single O(n log k) pass with
  * O(#keys · k) memory and no sort of the non-top rows.
  *
  * Output = child columns + `rn` (1-based rank in the declared order).
  * Equality with the window form is asserted in ExtensionsSpec; ties
  * must be broken by the order columns for determinism, exactly as the
  * window form requires. */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      rankAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rn is GENERATED here, not consumed from the child — without this,
  // CheckAnalysis reports it as a missing input attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  // keys.isEmpty = GLOBAL top-k: every row must reach one partition or
  // each partition would keep its own k-heap and emit k rows apiece
  // (silently wrong). AllTuples makes Catalyst plan the single-partition
  // exchange; the k-bounded heap keeps memory at O(k) there.
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (ks, ord, kk) = (keys, order, k)
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(ks, childOutput)
      val rowOrdering = GenerateOrdering.generate(ord, childOutput)
      // max-heap under the sort order: head = current WORST of the kept k
      val heaps = new scala.collection.mutable.HashMap[
        UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrdering))
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (rowOrdering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val joined = new JoinedRow
      // parents expect UnsafeRow output; project the joined row through
      // the output schema (buffer reused — rows are consumed streaming)
      val outProj = UnsafeProjection.create(childOutput :+ rankAttr, childOutput :+ rankAttr)
      heaps.valuesIterator.flatMap { heap =>
        // dequeueAll yields worst-first → reverse for rank order
        val best: Seq[InternalRow] = heap.dequeueAll.reverse
        best.iterator.zipWithIndex.map { pair =>
          outProj(joined(pair._1, InternalRow((pair._2 + 1).toLong))): InternalRow
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Per-key top-k through the custom operator. `orderSpec` is
    * (column, ascending); include a tiebreak column for determinism. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n in ${child.output}"))
    val order = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending) }
    val rankAttr = AttributeReference("rn", LongType, nullable = false)()
    GraftBridge.ofRows(df.sparkSession,
      TopKPerKey(keyCols.map(attr), order, k, rankAttr, child))
  }
}
