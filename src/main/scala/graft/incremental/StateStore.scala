package graft.incremental

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet-backed mutable state table with write-then-swap commit.
  *
  * The reference keeps its mutable state (`weekly_rental_summary`,
  * `etl_watermarks`) in Postgres and relies on transactional
  * commit/rollback (etl_script_incremental_pandas.py:272,288-292).
  * Parquet has no MERGE/transaction, so each state rewrite goes to a
  * temp directory first and is then swapped in via two FileSystem
  * renames (SURVEY.md S7): a failure anywhere before the swap leaves
  * the previous state fully intact — the analog of the reference's
  * rollback. (The tiny window between the two renames is the residual
  * non-atomicity; a re-run is idempotent, matching README.md:106-116.)
  *
  * Uses the Hadoop FileSystem API, so the same code works on HDFS/S3A
  * (where rename is a move, not a copy) as on local files.
  */
final class StateStore(spark: SparkSession, path: String) {
  private val hPath = new Path(path)
  private def fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(hPath)

  /** Current state, or an empty frame with `schema` if never written. */
  def read(schema: StructType): DataFrame =
    if (exists) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Materialize `df` as the new state. `df` may read from the current
    * state path: it is fully written to the temp dir (i.e. the old files
    * are consumed) before anything is moved. */
  def overwrite(df: DataFrame): Unit = {
    val tmp = new Path(path + ".tmp")
    val trash = new Path(path + ".old")
    fs.delete(tmp, true)
    fs.delete(trash, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(hPath) && !fs.rename(hPath, trash))
      throw new java.io.IOException(s"state swap: could not retire $hPath")
    if (!fs.rename(tmp, hPath))
      throw new java.io.IOException(s"state swap: could not commit $tmp")
    fs.delete(trash, true)
  }
}
