package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, TimestampType}

/** Column-level data-quality profiling (deequ/Great-Expectations shape):
  * per column, row count, null count, exact distinct count, and min/max —
  * the validation pass an ETL pipeline runs against a landed table before
  * trusting it (the reference trusts its source blindly; this is the
  * guard it lacks).
  */
object Profile {

  /** One profile row per requested column, from ONE scan of the input:
    * all per-column metrics compute in a single `agg` (Catalyst plans the
    * multiple exact `countDistinct`s as one Expand — input rows replicate
    * ×|cols|, still one pass over storage), then a row-local
    * explode turns the 1×(4·|cols|) metric row into |cols| rows.
    *
    * At extreme scale swap `countDistinct` for `approx_count_distinct`
    * to drop the Expand (HLL partials merge without replication); kept
    * exact here because exactness is what the DuckDB oracle can check.
    *
    * min/max compute on the TYPED column (lexicographic string min would
    * order "100" < "99"), then canonicalize to strings so one schema fits
    * every column: dates/timestamps render ISO, doubles through
    * DECIMAL(18,2) (both engines print decimals identically; raw
    * double→string flips to scientific notation at different thresholds).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def canon(e: org.apache.spark.sql.Column, c: String) =
      df.schema(c).dataType match {
        case DoubleType => e.cast("decimal(18,2)").cast("string")
        case TimestampType | DateType => e.cast("string")
        case _ => e.cast("string")
      }
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"__${c}_nulls"),
        countDistinct(col(c)).as(s"__${c}_distinct"),
        canon(min(col(c)), c).as(s"__${c}_min"),
        canon(max(col(c)), c).as(s"__${c}_max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__${c}_nulls").as("n_null"),
        col(s"__${c}_distinct").as("n_distinct"),
        col(s"__${c}_min").as("min_str"),
        col(s"__${c}_max").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("m")).select(col("m.*"))
  }
}
