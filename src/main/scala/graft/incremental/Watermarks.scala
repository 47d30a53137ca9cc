package graft.incremental

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** The reference's `etl_watermarks` control table: one
  * `last_successful_update_timestamp` per process name, read before a run
  * and advanced only after success
  * (etl_script_incremental_pandas.py:58-66,89-96,274-284).
  */
object Watermarks {

  /** etl_script_incremental_pandas.py:10 */
  val DefaultStart: Timestamp = Timestamp.valueOf("1900-01-01 00:00:00")

  val schema: StructType = StructType(Seq(
    StructField("process_name", StringType, nullable = false),
    StructField("last_successful_update_timestamp", TimestampType, nullable = true)))

  /** Watermark for `process`, or [[DefaultStart]] when absent/null
    * (etl:95). */
  def read(spark: SparkSession, store: StateStore, process: String): Timestamp = {
    val rows = store.read(schema)
      .filter(col("process_name") === process)
      .select(col("last_successful_update_timestamp"))
      .limit(1).collect()
    rows.headOption.map(_.getTimestamp(0)).filter(_ != null).getOrElse(DefaultStart)
  }

  /** Keyed upsert of one watermark row — the reference's
    * `INSERT … ON CONFLICT (process_name) DO UPDATE` (etl:204-212) as
    * filter-out-then-union over the (single-digit-row) state table. */
  def write(spark: SparkSession, store: StateStore, process: String, ts: Timestamp): Unit = {
    import scala.jdk.CollectionConverters._
    val newRow = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(process, ts)).asJava, schema)
    val kept = store.read(schema).filter(col("process_name") =!= lit(process))
    store.overwrite(kept.unionByName(newRow))
  }
}
