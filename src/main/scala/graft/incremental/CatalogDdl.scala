package graft.incremental

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** The reference's `CREATE TABLE IF NOT EXISTS` bootstrap
  * (etl_script_incremental_pandas.py:43-66) as real session-catalog DDL
  * (SURVEY.md S4). The parquet state directories stay the storage of
  * record (StateStore owns commit/rollback); this registers them as
  * EXTERNAL catalog tables so the state is queryable by name through
  * `spark.sql("SELECT … FROM weekly_rental_summary")` — the API shape a
  * reference user expects — without copying any data. Idempotent by the
  * same `IF NOT EXISTS` contract as the reference; at scale the catalog
  * write is metadata-only, so registration cost is independent of table
  * size. */
object CatalogDdl {

  /** External-table DDL over an existing parquet location. */
  def createTableSql(table: String, schema: StructType, location: String): String =
    s"CREATE TABLE IF NOT EXISTS `$table` (${schema.toDDL}) " +
      s"USING parquet LOCATION '${location.replace("'", "''")}'"

  /** Register both state tables of the incremental pipeline. Call after
    * a run (or anytime): `IF NOT EXISTS` makes re-registration a no-op,
    * and the refresh drops any stale file listing a previous query of
    * the same session may have cached across a StateStore swap. */
  def registerStateTables(spark: SparkSession, stateDir: String): Unit = {
    spark.sql(createTableSql("weekly_rental_summary",
      IncrementalWeeklySummary.summarySchema, s"$stateDir/weekly_rental_summary"))
    spark.sql(createTableSql("etl_watermarks",
      Watermarks.schema, s"$stateDir/etl_watermarks"))
    spark.catalog.refreshTable("weekly_rental_summary")
    spark.catalog.refreshTable("etl_watermarks")
  }
}
