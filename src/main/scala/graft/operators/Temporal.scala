package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for, composed from
  * shuffle-friendly primitives (SURVEY.md §2 round-3 extensions).
  *
  * Both operators exist because the naive plans are scale-killers: a
  * bare `a.ts BETWEEN b.ts - X AND b.ts` theta join compiles to
  * BroadcastNestedLoopJoin (O(|L|·|R|) comparisons, driver-sized
  * broadcast), and per-key "latest row at or before t" via a range
  * join explodes on hot keys. Each gets the standard distributed
  * re-expression instead: one hash shuffle, linear row traffic.
  */
object Temporal {

  /** Backward as-of join: for each left row, the single right row with
    * the greatest `rightTime <= leftTime` among rows sharing the join
    * key — the union-marker + running-`last` technique:
    *
    *   1. union both sides into one stream tagged `__side` (right=0,
    *      left=1), right payload columns null on left rows;
    *   2. one window over (key) ordered by (time, side) with an
    *      unbounded-preceding running `last(payload, ignoreNulls)`;
    *   3. keep the left rows — each has inherited the payload of the
    *      latest right row at or before its timestamp (a right row AT
    *      the left timestamp sorts first, so `>=` semantics).
    *
    * One shuffle on the key, no per-key materialization beyond the
    * sort — the shape that survives hot keys at corpus scale. Rows
    * with no earlier right row keep null payloads (left-outer
    * semantics). Right-side ties on (key, time) must be pre-broken by
    * the caller (e.g. keep max surrogate key per (key, time)):
    * within-tie window order is not deterministic, same caveat DuckDB's
    * ASOF JOIN carries.
    *
    * @param rightPayload right columns to carry onto left rows; output
    *   = all left columns + these (nulls where no match).
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
                       leftKey: String, leftTime: String,
                       rightKey: String, rightTime: String,
                       rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val leftCols = left.columns.toSeq
    // ONE struct carries the whole payload so inheritance is row-atomic:
    // a per-column `last(ignoreNulls)` would let a legitimately-NULL
    // payload value fall through to an OLDER right row, stitching
    // together a right row that never existed. The struct is non-null
    // on every right row (even all-null fields), null only on the
    // interleaved left rows, so ignoreNulls skips exactly those.
    val pType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))
    val r = right.select(
      (col(rightKey).as("__k") :: col(rightTime).as("__t") ::
        lit(0).as("__side") :: struct(rightPayload.map(col): _*).as("__p") :: Nil) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      (col(leftKey).as("__k") :: col(leftTime).as("__t") ::
        lit(1).as("__side") :: lit(null).cast(pType).as("__p") :: Nil) ++
        leftCols.map(col): _*)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .select(col("__side") +:
        last(col("__p"), ignoreNulls = true).over(w).as("__pp") +:
        leftCols.map(col): _*)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__pp").getField(c).as(c)): _*)
  }

  /** Gap-based sessionization: assign each row a per-key `session_idx`
    * (1-based) that increments whenever the gap to the key's previous
    * row exceeds `gapSeconds` — the batch mirror of the streaming
    * `flatMapGroupsWithState` sessionizer in [[graft.streaming.Streaming]],
    * expressed as the classic two-window composition (lag to mark
    * session starts, running sum to number them). ONE shuffle on the
    * key; both windows share the same (key, time, tieBreak) sort so
    * Catalyst plans a single exchange+sort pair. Per-key state is the
    * window sort, not a collect — hot users cost a bigger sort
    * partition, never a driver round-trip.
    *
    * The gap compares `unix_micros`, exactly — no second-truncation —
    * so an engine mirroring the definition (e.g. DuckDB `epoch_us`)
    * reproduces session boundaries bit-for-bit. `tieBreak` must make
    * (key, time, tieBreak) a total order (a unique row id) or lag is
    * nondeterministic under ties — same caveat every windowed lag
    * carries.
    */
  def sessionize(events: DataFrame, key: String, time: String,
                 gapSeconds: Long, tieBreak: String): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w = Window.partitionBy(key).orderBy(col(time), col(tieBreak))
    // cast covers TIMESTAMP_NTZ inputs (parquet NTZ columns): with the
    // session zone pinned to UTC the cast is a metadata relabel, and
    // unix_micros only accepts TIMESTAMP
    val micros = unix_micros(col(time).cast("timestamp"))
    val prev = lag(micros, 1).over(w)
    val isNew = when(prev.isNull ||
      micros - prev > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_idx", sum(col("__new")).over(w))
      .drop("__new")
  }

  /** Pure (equi-key-free) backward time-band join: all (left, right)
    * pairs with `rightTime` in `[leftTime - bandSeconds, leftTime]`,
    * re-expressed as a bucketed equi-join: both sides bucket their
    * epoch seconds at `bandSeconds` width; a band window of length
    * `bandSeconds` spans at most two buckets, so each left row probes
    * its own bucket and the previous one (posexplode of a 2-array) and
    * the exact band predicate runs as a residual filter after the hash
    * join. Row traffic through the exchange is 2·|L| + |R| — the
    * linear shape — where Catalyst's own plan for the bare theta join
    * is a BroadcastNestedLoopJoin. Each qualifying pair matches in
    * exactly one probed bucket, so no dedup is needed.
    *
    * Inner-join semantics; callers wanting left-outer counts aggregate
    * and re-join (see SparkEntry q_join_range). Column sets of the two
    * inputs must be disjoint.
    */
  def bandJoinBackward(left: DataFrame, right: DataFrame,
                       leftTime: String, rightTime: String,
                       bandSeconds: Long): DataFrame = {
    require(bandSeconds > 0, "bandSeconds must be positive")
    val lb = floor(unix_timestamp(col(leftTime)) / bandSeconds)
    val l = left
      .select(col("*"), explode(array(lb, lb - 1)).as("__bucket"))
    val r = right
      .withColumn("__bucket", floor(unix_timestamp(col(rightTime)) / bandSeconds))
    l.join(r, "__bucket")
      .filter(col(rightTime) >= col(leftTime) - expr(s"INTERVAL $bandSeconds SECOND") &&
        col(rightTime) <= col(leftTime))
      .drop("__bucket")
  }
}
