package graft.incremental

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Append-only audit log of incremental runs — the durable form of the
  * reference's step-by-step stdout log (etl_script_incremental_pandas.py
  * prints each phase; a scheduled production job needs the history
  * queryable, not scrolled away). One row per run, written with plain
  * parquet APPEND: an audit log is immutable history, so the
  * manifest/commit machinery of [[SnapshotTable]] (built for mutable
  * state) is deliberately NOT used — append never rewrites existing
  * files, and a duplicate row from a retried run is harmless (the
  * run_ts + watermark pair identifies it). */
object RunLog {

  val schema: StructType = StructType(Seq(
    StructField("run_ts", TimestampType, nullable = false),
    StructField("previous_watermark", TimestampType, nullable = true),
    StructField("new_watermark", TimestampType, nullable = true),
    StructField("delta_rows", LongType, nullable = false),
    StructField("affected_weeks", LongType, nullable = false),
    StructField("processed", BooleanType, nullable = false)))

  def append(spark: SparkSession, stateDir: String, report: RunReport,
      runTs: Timestamp = new Timestamp(System.currentTimeMillis())): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(Seq(org.apache.spark.sql.Row(
      runTs, report.previousWatermark, report.newWatermark,
      report.deltaRows, report.affectedWeeks, report.processed)).asJava, schema)
      .coalesce(1)
      .write.mode("append").parquet(s"$stateDir/run_log")
  }

  def read(spark: SparkSession, stateDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/run_log")
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.schema(schema).parquet(p.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
