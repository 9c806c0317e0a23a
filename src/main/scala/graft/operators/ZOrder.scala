package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional data layout.
  *
  * A table range-partitioned and sorted by the interleaved z-value keeps
  * BOTH dimensions locally clustered inside every file, so parquet
  * row-group/file min-max statistics prune 2-D box predicates — the
  * data-skipping layout Delta/Iceberg expose as `OPTIMIZE ZORDER BY`,
  * expressed here with nothing but built-in bit arithmetic (one codegen
  * projection, no UDF, no custom expression). At 100 TB the layout pass is
  * the standard `repartitionByRange(zval).sortWithinPartitions(zval)`
  * write; ZOrderSpec measures the actual skipping win (per-file bounding
  * AREA of the two dims) against a single-column sort.
  *
  * Both dims are pre-squashed to 16 bits by the CALLER (the interleave
  * assumes 0 <= x,y < 2^16); the 32-bit z-value is exact in a long.
  */
object ZOrder {

  /** Interleave two 16-bit dims: bit i of x lands at 2i, of y at 2i+1. */
  def zval16(x: Column, y: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1)
    }

  /** The identical interleave as ANSI SQL over integer columns `x`,`y` —
    * one generated 32-term sum, for the DuckDB oracle. */
  def oracleSql(x: String, y: String): String =
    (0 until 16).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")
}
