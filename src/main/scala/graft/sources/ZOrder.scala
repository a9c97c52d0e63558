package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton space-filling-curve) data layout — the multi-column
  * data-skipping move for huge scans (Delta's `OPTIMIZE ZORDER BY`,
  * Iceberg's z-order rewrite strategy; public technique).
  *
  * A table range-sorted by ONE column skips beautifully on that column
  * and not at all on any other: every file spans the full range of the
  * second column, so its parquet min/max stats never exclude anything.
  * Interleaving the bits of several columns' normalized ranks into one
  * sort key makes each output file cover a compact RECTANGLE of the
  * value space — min/max stats are tight on EVERY participating
  * column, and the parquet reader's predicate pushdown skips row
  * groups for selective filters on any of them. That skipping is the
  * difference between "scan 100 TB" and "scan the 2% of files whose
  * stats overlap the predicate".
  *
  * Mechanics (all Column expressions — codegen'd, one pass + one tiny
  * stats aggregate):
  *  1. per column: min/max in one aggregate over the input (collected —
  *     2 numbers per column);
  *  2. normalize each value to a `Bits`-bit rank
  *     `(v - min) / (max - min) * (2^Bits - 1)` (nulls rank 0);
  *  3. interleave the rank bits round-robin into the z-value;
  *  4. `repartitionByRange(nFiles, z)` + sort within partitions by z —
  *     range partitioning makes FILES carve the curve into contiguous
  *     segments (compact rectangles), the property the stats need.
  *
  * ZOrderSpec measures the payoff on the executed plan's scan metrics:
  * a selective filter on the SECOND column reads an order of magnitude
  * fewer rows from the z-ordered layout than from a single-column
  * sort, and the q_layout_zorder driver query proves values are
  * untouched (layout is value-transparent, so DuckDB aggregates the
  * original table). */
object ZOrder {

  val Bits = 16

  /** The interleaved z-value of `cols` (numeric columns), given their
    * (min, max) stats. Exposed for tests. */
  def zvalue(cols: Seq[Column], stats: Seq[(Double, Double)]): Column = {
    require(cols.nonEmpty && cols.size == stats.size)
    val ranks = cols.zip(stats).map { case (c, (mn, mx)) =>
      val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
      val scaled = (c.cast("double") - lit(mn)) / lit(span) * lit((1 << Bits) - 1)
      coalesce(round(scaled).cast("long"), lit(0L))
    }
    // round-robin bit interleave: bit i of column j lands at position
    // i * nCols + j — 16×nCols shift/mask terms, all codegen-friendly
    val n = cols.size
    val terms = for {
      i <- 0 until Bits
      j <- 0 until n
    } yield shiftleft(shiftright(ranks(j), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` as a z-ordered parquet table under `path`: `nFiles`
    * files, each a contiguous z-range (a compact rectangle of the
    * `cols` value space). One stats aggregate + one range shuffle —
    * the same cost class as a plain global sort, which is what this
    * replaces in a maintenance rewrite. */
  def write(df: DataFrame, path: String, cols: Seq[String],
            nFiles: Int = 64): Unit = {
    val stats = columnStats(df, cols)
    df.withColumn("__z", zvalue(cols.map(col), stats))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** (min, max) per column, one aggregate pass, collected (2×|cols|
    * numbers — bounded regardless of table size). An empty input or an
    * all-null column aggregates to SQL NULL; it degrades to the (0,0)
    * range — zvalue already coalesces row-level nulls to the range
    * floor, so the rewrite of a degenerate table still succeeds
    * (single z-bucket) instead of NPEing on getDouble. */
  def columnStats(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def at(i: Int) = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
    cols.indices.map(i => (at(2 * i), at(2 * i + 1)))
  }
}
