package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{graftbridge => bridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator extension (preference-ladder item (c), SURVEY.md §2
  * round-3 note): top-k rows per group as a first-class operator —
  * logical node + planner [[SparkStrategy]] + two-phase physical
  * [[TopKPerGroupExec]] — semantically `row_number() OVER (PARTITION BY
  * groups ORDER BY order) <= k` under a TOTAL order.
  *
  * Why Spark's built-ins genuinely can't express the efficient shape:
  * the window plan shuffles EVERY input row on the group key and sorts
  * full partitions before discarding all but k per group; at 100 TB the
  * exchange carries the whole table to keep ~k·|groups| rows. No
  * composition of groupBy/join/window prunes before the shuffle without
  * changing semantics (`max_by(..., k)`-style collects build full
  * per-group arrays in agg state — same traffic, worse memory). The
  * fix needs a map-side partial with operator state — exactly what a
  * custom physical operator is for:
  *
  *   - PARTIAL exec (before any exchange): one pass per input
  *     partition keeping a bounded heap of k rows per group seen in
  *     that partition — at most k·|groups local to the partition| rows
  *     survive;
  *   - the planner inserts the hash exchange on the group key via
  *     `requiredChildDistribution` (the standard EnsureRequirements
  *     seam — no hand-scheduled shuffle);
  *   - FINAL exec merges the partial winners with the same heaps.
  *
  * Exchange traffic is Σ_p min(rows_p(g), k) per group g — bounded by
  * `maps × groups × k`, independent of |input|. The heap comparator is
  * codegen'd from the exact [[SortOrder]]s (GenerateOrdering), so
  * null/NaN placement is bit-identical to the window operator the
  * semantics are defined by; ties beyond a total order are REJECTED by
  * contract (caller supplies a tie-breaking key, same caveat
  * `q_window_topk` documents). Operator state is one (group → k rows)
  * heap map per task — the same bound a partial HashAggregate carries;
  * k·|groups| must fit a task, which is the operator's documented
  * contract (top-k-per-category shapes), not a silent assumption.
  *
  * The exec nodes don't implement whole-stage codegen (they sit at
  * stage boundaries where the exchange already breaks the span; the
  * inner loop is the codegen'd comparator + projection).
  */
final case class TopKPerGroup(groupExprs: Seq[Expression],
                              order: Seq[SortOrder], k: Int,
                              child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroup = copy(child = newChild)
}

final case class TopKPerGroupExec(groupExprs: Seq[Expression],
                                  order: Seq[SortOrder], k: Int,
                                  partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    // groupExprs can be empty (global top-k): AllTuples via single partition
    else if (groupExprs.isEmpty) Seq(org.apache.spark.sql.catalyst.plans.physical.AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val groups = groupExprs
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groups, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap on sort position: peek() = current worst kept row
      val heapOrd = ord.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit.min(16), heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        h.iterator().asScala.map { r => numOutputRows += 1; r }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as partial-exec → (exchange via required
  * distribution) → final-exec. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groups, order, k, child) =>
      val partial = TopKPerGroupExec(groups, order, k, partial = true, planLater(child))
      TopKPerGroupExec(groups, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. */
object TopK {

  /** Top `k` rows per group, i.e. `row_number() OVER (PARTITION BY
    * groupCols ORDER BY orderCols) <= k` — `orderCols` MUST be a total
    * order (append a unique tie-break key) or which tied row survives
    * is undefined, exactly the window operator's caveat. Registers
    * [[TopKStrategy]] on the DataFrame's session if absent. Output row
    * order is undefined (set semantics) — order explicitly downstream.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val plan = bridge.analyzed(df)
    val out = plan.output
    // resolve with the session's resolver (case-insensitive unless
    // spark.sql.caseSensitive) — same inputs groupBy/window accept
    val resolver = spark.sessionState.conf.resolver
    def byName(name: String): Attribute = {
      val hits = out.filter(a => resolver(a.name, name))
      if (hits.size != 1) throw new IllegalArgumentException(
        s"column $name ${if (hits.isEmpty) "not in" else "ambiguous in"} " +
          out.map(_.name).mkString(", "))
      hits.head
    }
    val groups = groupCols.map(byName)
    val order = orderCols.map { c =>
      // convertedExpression, not expression: the lazy ColumnNodeExpression
      // wrapper is not a real catalyst tree (the SortOrder match below
      // would miss, silently dropping .desc) and is not serializable
      val resolved = bridge.convertedExpression(c).transformUp {
        case u: UnresolvedAttribute => byName(u.nameParts.last)
      }
      resolved match {
        case s: SortOrder => s
        case e            => SortOrder(e, Ascending)
      }
    }
    bridge.ofRows(spark, TopKPerGroup(groups, order, k, plan))
  }

  /** Idempotently add [[TopKStrategy]] to the session's planner. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
}
