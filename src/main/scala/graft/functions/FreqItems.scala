package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst AGGREGATE function (the ladder axis Expression /
  * Rule / Strategy don't cover): Misra-Gries frequent-items sketch —
  * `graft_freq_items(col, k)` returns the sketch's candidate items
  * (sorted `array<string>`, ≤ k of them).
  *
  * Guarantee (Misra & Gries 1982; merge step per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): every item whose true frequency
  * exceeds n/(k+1) of the n aggregated rows IS in the output,
  * regardless of row order or how Spark splits/merges partial
  * buffers. Items below the bound may appear or not depending on
  * order (same determinism class as `collect_list`/`first`) — so the
  * consuming query must treat the output as a CANDIDATE set and
  * exact-recount, which makes the end result exact and deterministic
  * (the pattern [[graft.operators.TextAnalysis.frequentTerms]] wires
  * up, mirroring the engine's dedup sketches: sketch proposes, exact
  * pass verifies).
  *
  * Why an aggregate and not groupBy(token).count(): at corpus scale
  * the token key space is unbounded (trillions of distinct n-grams) —
  * a full groupBy shuffles and materializes ALL of them to answer a
  * question about the top handful. The sketch carries O(k) state per
  * partial buffer through the ordinary partial/final HashAggregate
  * machinery (map-side combine included), so heavy-hitter mining is
  * one narrow pass + a k-sized merge, independent of |vocabulary|.
  *
  * Buffer ops: update is O(1) amortized (the decrement-all overflow
  * step is O(k) but paid at most once per k updates); merge adds
  * counts then subtracts the (k+1)-th largest count from all (the
  * mergeable-summaries offset trick), keeping ≤ k survivors.
  */
final case class FreqItemsSketch(child: Expression, k: Int,
                                 mutableAggBufferOffset: Int = 0,
                                 inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), "k must be in [1, 2^20]")

  override def prettyName: String = "graft_freq_items"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    new mutable.HashMap[UTF8String, Long]()

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k =>
          // clone: the UTF8String points into a reused unsafe row buffer
          buf.update(s.clone(), 1L)
        case None =>
          // full and unseen: decrement every counter (the classic MG
          // step — "spend" one occurrence of each tracked item and
          // this one), dropping zeros
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
                     b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (s, c) => b1.update(s, b1.getOrElse(s, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything: at most k
      // items stay strictly positive, and the n/(k+1) error bound is
      // preserved (mergeable-summaries offset argument)
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (k + 1))
      b1.mapValuesInPlace((_, c) => c - d)
      b1.filterInPlace((_, c) => c > 0L)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val items = buf.keysIterator.toArray
    java.util.Arrays.sort(items, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(items.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val bytes = s.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.HashMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsSketch =
    copy(child = newChild)
}

object FreqItemsSketch {
  /** (identifier, info, builder) triple for FunctionRegistry /
    * SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_freq_items"),
    new ExpressionInfo(classOf[FreqItemsSketch].getName, "graft_freq_items"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_freq_items takes exactly 2 arguments")
      val k = args(1) match {
        case e if e.foldable && e.dataType == IntegerType =>
          e.eval().asInstanceOf[Int]
        case _ => throw new IllegalArgumentException(
          "graft_freq_items k must be a constant INT")
      }
      FreqItemsSketch(args.head, k)
    })
}
