package graft.sources

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Keyed upsert over JDBC — the writer half of the reference's rollup
  * load (etl_script_incremental_pandas.py:249-267 upserts the weekly
  * summary, :276-284 the watermark, both `INSERT … ON CONFLICT (key)
  * DO UPDATE`). [[graft.sources.Sources.cdcJdbc]] is the read half;
  * this is the symmetric sink, so a user of the reference can point
  * both ends of the pipeline at real databases.
  *
  * Scale shape: the frame is repartitioned ON THE KEY COLUMNS before
  * the write, so every key lands in exactly one task — concurrent
  * executors never upsert the same row, which is what turns
  * `ON CONFLICT` under row-level locking into deadlock roulette. Each
  * partition opens one connection, writes in `batchSize` batches on a
  * single transaction, and commits once — a partition retry replays
  * its whole slice, and the upsert is idempotent, so at-least-once
  * task semantics still yield exactly-once table state (same argument
  * as the reference's re-runnable upsert).
  *
  * Dialects: Postgres gets the reference's literal `INSERT … ON
  * CONFLICT DO UPDATE`; engines with a VALUES-sourced `MERGE INTO`
  * (H2 2.x, SQL Server, Oracle) get the ANSI batch shape, with
  * parameters wrapped as `CAST(? AS <type>)` from the Spark schema so
  * the engine can type the derived table; everything else — including
  * Derby, whose MERGE source must be a base table or table function —
  * gets the universal update-then-insert pair. The contract test
  * (JdbcUpsertSpec) runs against embedded Derby — the one database on
  * Spark's own classpath — and asserts table state equals
  * [[graft.incremental.Upsert.merge]] folded over the same batches.
  */
object JdbcUpsert {

  sealed trait Dialect
  /** `INSERT … ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c`. */
  case object PostgresOnConflict extends Dialect
  /** ANSI `MERGE INTO … USING (VALUES …)` — one round trip per batch
    * (H2 2.x, SQL Server, Oracle). NOT Derby: its MERGE source must be
    * a base table or table function (ERROR 42XAL). */
  case object AnsiMerge extends Dialect
  /** `UPDATE … WHERE key`; on zero rows, `INSERT` — the lowest-common-
    * denominator upsert that every JDBC database executes. Two round
    * trips per new key, so it's the correctness fallback, not the
    * throughput path; the single-writer-per-key repartition makes the
    * update-then-insert pair race-free within a key. */
  case object UpdateInsert extends Dialect

  def dialectFor(url: String): Dialect =
    if (url.startsWith("jdbc:postgresql")) PostgresOnConflict
    else if (url.startsWith("jdbc:h2") || url.startsWith("jdbc:sqlserver")
      || url.startsWith("jdbc:oracle")) AnsiMerge
    else UpdateInsert

  /** `"ident"` — double-quote (ANSI) so mixed-case reference columns
    * like `"OutstandingRentals"` round-trip in both dialects. */
  private def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  /** Spark type → java.sql.Types code, for portable setNull. */
  private[sources] def jdbcTypeCode(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType => java.sql.Types.SMALLINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.REAL
    case BooleanType => java.sql.Types.BOOLEAN
    case DateType => java.sql.Types.DATE
    case TimestampType | TimestampNTZType => java.sql.Types.TIMESTAMP
    case _: DecimalType => java.sql.Types.DECIMAL
    case _ => java.sql.Types.VARCHAR
  }

  /** Spark type → ANSI SQL type for CAST/DDL (Derby-compatible names). */
  private[sources] def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => "VARCHAR(32672)" // Derby's max VARCHAR width
    case other =>
      throw new IllegalArgumentException(s"no JDBC mapping for $other")
  }

  /** The per-row upsert statement — public so callers (and the contract
    * spec) can inspect exactly what runs against their database. */
  def upsertSql(
      dialect: Dialect, table: String, schema: StructType,
      keys: Seq[String]): String = {
    val cols = schema.fields.map(_.name).toSeq
    val nonKeys = cols.filterNot(keys.contains)
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"keys $keys must be columns of $cols")
    dialect match {
      case PostgresOnConflict =>
        val conflict =
          if (nonKeys.isEmpty) "DO NOTHING"
          else "DO UPDATE SET " +
            nonKeys.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
        s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
          s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
          s"ON CONFLICT (${keys.map(q).mkString(", ")}) $conflict"
      case AnsiMerge =>
        val params = schema.fields
          .map(f => s"CAST(? AS ${sqlType(f.dataType)})").mkString(", ")
        val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
        val update =
          if (nonKeys.isEmpty) ""
          else "WHEN MATCHED THEN UPDATE SET " +
            nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ") + " "
        s"MERGE INTO ${q(table)} t " +
          s"USING (VALUES ($params)) s (${cols.map(q).mkString(", ")}) " +
          s"ON ($on) $update" +
          s"WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")}) " +
          s"VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})"
      case UpdateInsert => // the INSERT half; see updateSql for the UPDATE
        s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
          s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    }
  }

  /** The UPDATE half of [[UpdateInsert]]: parameters bind non-key
    * columns first (SET order), then key columns (WHERE order). */
  def updateSql(table: String, schema: StructType, keys: Seq[String]): String = {
    val nonKeys = schema.fields.map(_.name).toSeq.filterNot(keys.contains)
    s"UPDATE ${q(table)} SET " +
      nonKeys.map(c => s"${q(c)} = ?").mkString(", ") +
      s" WHERE " + keys.map(k => s"${q(k)} = ?").mkString(" AND ")
  }

  /** `CREATE TABLE` if absent (reference etl:43-66) — Derby has no
    * `IF NOT EXISTS`, so the portable form is create-and-swallow the
    * already-exists SQLState (`X0Y32` Derby, `42P07` Postgres). */
  def createTableIfAbsent(conn: Connection, table: String,
      schema: StructType, keys: Seq[String]): Unit = {
    val cols = schema.fields.map { f =>
      val notNull = if (keys.contains(f.name) || !f.nullable) " NOT NULL" else ""
      s"${q(f.name)} ${sqlType(f.dataType)}$notNull"
    }
    val pk =
      if (keys.isEmpty) "" else s", PRIMARY KEY (${keys.map(q).mkString(", ")})"
    val st = conn.createStatement()
    try st.execute(s"CREATE TABLE ${q(table)} (${cols.mkString(", ")}$pk)")
    catch {
      case e: SQLException
        if e.getSQLState == "X0Y32" || e.getSQLState == "42P07" => () // exists
    } finally st.close()
  }

  /** Upsert `df` into `table` keyed on `keys`. Rows of `df` must be
    * key-unique (enforced by repartition + documented contract — the
    * last writer within a key would otherwise be nondeterministic,
    * exactly as it is in the reference's loop). */
  /** Bind `v` (external Row value) at `pos`. External temporal classes
    * depend on session config (java.time vs java.sql) — dispatch on the
    * value, not the schema type. */
  private def bind(ps: java.sql.PreparedStatement, pos: Int, v: Any,
      dt: DataType): Unit = v match {
    case null => ps.setNull(pos, jdbcTypeCode(dt))
    case t: java.time.LocalDateTime => ps.setTimestamp(pos, java.sql.Timestamp.valueOf(t))
    case t: java.time.Instant => ps.setTimestamp(pos, java.sql.Timestamp.from(t))
    case d: java.time.LocalDate => ps.setDate(pos, java.sql.Date.valueOf(d))
    case _ => ps.setObject(pos, v)
  }

  def upsert(
      df: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      connectionProperties: java.util.Properties = new java.util.Properties(),
      batchSize: Int = 1000,
      dialectOverride: Option[Dialect] = None): Unit = {
    val schema = df.schema
    val dialect = dialectOverride.getOrElse(dialectFor(url))
    val sql = upsertSql(dialect, table, schema, keys)
    val updSql = updateSql(table, schema, keys)
    val fieldNames = schema.fields.map(_.name).toSeq
    val types = schema.fields.map(_.dataType)
    val keyIdx = keys.map(fieldNames.indexOf).toArray
    val nonKeyIdx = fieldNames.indices.filterNot(keyIdx.contains).toArray
    val twoStep = dialect == UpdateInsert && nonKeyIdx.nonEmpty
    // Copy Properties to a plain Map so the closure captures only
    // simple Scala values.
    val props: Map[String, String] = {
      import scala.jdk.CollectionConverters._
      connectionProperties.asScala.toMap.map { case (k, v) => (k.toString, v.toString) }
    }
    import org.apache.spark.sql.functions.col
    df.repartition(keys.map(col): _*).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val p = new java.util.Properties()
          props.foreach { case (k, v) => p.setProperty(k, v) }
          val conn = DriverManager.getConnection(url, p)
          try {
            conn.setAutoCommit(false)
            val ins = conn.prepareStatement(sql)
            val upd = if (twoStep) conn.prepareStatement(updSql) else null
            var pending = 0
            rows.foreach { row =>
              if (twoStep) {
                // UPDATE first (non-keys in SET order, keys in WHERE
                // order); INSERT only when no row matched.
                var pos = 1
                nonKeyIdx.foreach { i => bind(upd, pos, row.get(i), types(i)); pos += 1 }
                keyIdx.foreach { i => bind(upd, pos, row.get(i), types(i)); pos += 1 }
                if (upd.executeUpdate() == 0) {
                  fieldNames.indices.foreach(i => bind(ins, i + 1, row.get(i), types(i)))
                  ins.executeUpdate()
                }
              } else if (dialect == UpdateInsert) {
                // all columns are keys: insert, ignore duplicate-key
                fieldNames.indices.foreach(i => bind(ins, i + 1, row.get(i), types(i)))
                try ins.executeUpdate()
                catch { case _: java.sql.SQLIntegrityConstraintViolationException => () }
              } else {
                fieldNames.indices.foreach(i => bind(ins, i + 1, row.get(i), types(i)))
                ins.addBatch()
                pending += 1
                if (pending >= batchSize) { ins.executeBatch(); pending = 0 }
              }
            }
            if (pending > 0) ins.executeBatch()
            if (upd != null) upd.close()
            ins.close()
            conn.commit()
          } catch {
            case e: Throwable => conn.rollback(); throw e
          } finally conn.close()
        }
    }
  }
}
