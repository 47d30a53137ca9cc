package graft

import org.apache.spark.sql.SparkSession

import graft.incremental.{ConsistencyMode, IncrementalWeeklySummary}

/** Direct-run entry for the incremental pipeline — the analog of the
  * reference's `python etl_script_incremental_pandas.py` path
  * (etl_script_incremental_pandas.py:300-342): one incremental run of the
  * weekly summary over the rental view of `sfDir`, with parquet state in
  * `stateDir`. Re-running with unchanged input is an idempotent no-op
  * that only advances the watermark (etl:202-213).
  *
  * Usage: runMain graft.IncrementalRun <sfDir> <stateDir> [faithful|strict]
  */
object IncrementalRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val stateDir = args(1)
    val mode =
      if (args.length > 2 && args(2) == "strict") ConsistencyMode.Strict
      else ConsistencyMode.Faithful
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = IncrementalWeeklySummary.run(
      spark, Tables.rental(spark, sfDir), stateDir, mode)
    println(s"[incremental] watermark ${report.previousWatermark} -> ${report.newWatermark}; " +
      s"deltaRows=${report.deltaRows} affectedWeeks=${report.affectedWeeks} processed=${report.processed}")
    spark.stop()
  }
}
