package graft.incremental

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The reference's `etl_watermarks` control-table CONTRACT: one
  * `last_successful_update_timestamp` per process name, read before a
  * run and advanced only after success
  * (etl_script_incremental_pandas.py:58-66,89-96,274-284).
  *
  * Storage-wise the watermark is no longer a separate table: it rides
  * the summary commit as the [[SnapshotTable]] application tag
  * ([[IncrementalWeeklySummary.watermark]]), so summary and watermark
  * advance in ONE atomic manifest — the reference's single-transaction
  * commit (etl:272). This object keeps the shared constants: the
  * bootstrap value and the row schema the catalog view and the JDBC
  * rollup sync expose ([[IncrementalWeeklySummary.watermarkFrame]]).
  */
object Watermarks {

  /** etl_script_incremental_pandas.py:10 */
  val DefaultStart: Timestamp = Timestamp.valueOf("1900-01-01 00:00:00")

  val schema: StructType = StructType(Seq(
    StructField("process_name", StringType, nullable = false),
    StructField("last_successful_update_timestamp", TimestampType, nullable = true)))
}
