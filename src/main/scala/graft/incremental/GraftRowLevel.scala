package graft.incremental

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Row-level SQL DML (`MERGE INTO`, `UPDATE`, arbitrary-predicate
  * `DELETE FROM`) for snapshot tables — the DSv2 `SupportsDelta` rung,
  * mapped onto the table's own ATOMIC feed-application primitive:
  *
  *   - Spark's rewrite rules (RewriteMergeIntoTable / RewriteUpdateTable
  *     / RewriteDeleteFromTable) turn the statement into a DELTA of row
  *     actions against this operation's scan (the same masked,
  *     manifest-pruned scan every route uses);
  *   - updates are REPRESENTED AS DELETE+INSERT
  *     ([[GraftRowLevelOperation.representUpdateAsDeleteAndInsert]]), so
  *     the whole delta is exactly the shape
  *     [[graft.incremental.SnapshotTable.applyDelta]] commits atomically
  *     (a same-key delete+insert collapses to the upsert — upsert-wins
  *     overlap — and a key-CHANGING update is naturally a delete of the
  *     old id plus an insert of the new row);
  *   - executors STAGE their action rows as parquet under the table's
  *     `.rlo-stage/` (Spark's own `ParquetWriteSupport`, one upsert and
  *     one delete-key file per task, created lazily); the driver commit
  *     reads ONLY the files named in the committed tasks' messages
  *     (speculative/failed attempts' debris dies with the staging dir)
  *     and applies ONE `applyDelta` — so the DML statement inherits the
  *     commit protocol's atomicity, file-grain pruning, and (on a
  *     `deleteVectorMaxRows` handle) merge-on-read deletes verbatim.
  *
  * Translatable single-table DELETEs never reach this path: Spark's
  * `OptimizeMetadataOnlyDeleteFromTable` swaps the rewritten plan back
  * to the `SupportsDelete` metadata delete when `canDeleteWhere`
  * accepts, so `DELETE FROM t WHERE k <= 5` stays a driver-side
  * file-pruned delete and only predicates the exact translation cannot
  * express (e.g. `k % 2 = 0`) pay the scan-and-stage route. */
final class GraftRowLevelOperation(dir: String, key: String,
    op: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {

  private val tbl: SnapshotTable = new SnapshotTable(SparkSession.active, dir, key)

  /** STATEMENT-GRAIN optimistic concurrency: the manifest version is
    * resolved ONCE, when the operation is built (analysis time) — the
    * scan below is pinned to it, and the commit passes it as
    * `applyDelta`'s `expectedVersion`. So the matched/not-matched
    * decisions a MERGE computes are guaranteed to be applied onto the
    * exact snapshot they were derived from; a writer landing anywhere
    * between resolve and commit fails THIS statement with the commit
    * protocol's own ConcurrentModificationException (retry-able by the
    * user) instead of being silently clobbered — the same lost-update
    * discipline every Scala-API mutation already has. */
  private val pinnedVersion: Long = tbl.currentVersion.getOrElse(
    throw new IllegalStateException(
      s"no snapshot table at $dir — nothing for $op to act on"))

  override def command(): RowLevelOperation.Command = op

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tbl, Some(pinnedVersion), tbl.schemaAt(Some(pinnedVersion)))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder = {
    // a DELETE-only statement writes no data rows, so info.schema() is
    // empty — the applyDelta upsert side must still carry the TABLE
    // schema (its evolution check is per-column)
    val tableSchema = tbl.schemaAt(Some(pinnedVersion))
    val rowSchema = if (info.schema().isEmpty) tableSchema else info.schema()
    val idSchema = info.rowIdSchema().orElse(
      StructType(Seq(tableSchema(key))))
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(dir, key, rowSchema, idSchema, pinnedVersion)
    }
  }

  override def rowId(): Array[NamedReference] = Array(Expressions.column(key))

  /** Updates arrive as delete(old id) + insert(new row): exactly
    * applyDelta's vocabulary, and the only representation that keeps a
    * key-changing UPDATE correct. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def description(): String = s"graft-snapshot $op on $dir"
}

/** The delta write: executors stage, the driver applies ONE atomic
  * [[graft.incremental.SnapshotTable.applyDelta]], CAS-pinned to the
  * statement's resolved version. */
private[graft] final class GraftDeltaWrite(dir: String, key: String,
    rowSchema: StructType, idSchema: StructType,
    expectedVersion: Long) extends DeltaWrite {

  private val stageDir = s"$dir/.rlo-stage/${UUID.randomUUID()}"

  /** Captured ON THE DRIVER at write build: the session's Hadoop conf
    * (fs.defaultFS, object-store credentials — an executor-built
    * `new Configuration(false)` would lose them and stage to the wrong
    * or an unreachable filesystem on any non-local table) with the
    * session's ACTUAL parquet-write SQLConf values layered on top, the
    * same population `ParquetFileFormat.prepareWrite` performs. */
  private val writerConf: GraftSerializableConf = {
    import org.apache.spark.sql.internal.SQLConf
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val sql = spark.sessionState.conf
    Seq(
      SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE,
      SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED,
      SQLConf.CASE_SENSITIVE
    ).foreach(e => conf.set(e.key, sql.getConfString(e.key, e.defaultValueString)))
    // staged bytes are read back immediately by this same engine:
    // CORRECTED never throws on ancient timestamps and round-trips
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    new GraftSerializableConf(conf)
  }

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DeltaWriterFactory =
      new GraftDeltaWriterFactory(stageDir, rowSchema.json, idSchema.json,
        writerConf)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val spark = SparkSession.active
      val (upFiles, delFiles) = messages.collect {
        case m: GraftDeltaFiles => m
      }.foldLeft((Seq.empty[String], Seq.empty[String])) { case ((u, d), m) =>
        (u ++ m.upserts, d ++ m.deletes)
      }
      def readStaged(paths: Seq[String], schema: StructType) =
        if (paths.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else spark.read.schema(schema).parquet(paths: _*)
      try {
        GraftDeltaWrite.onBeforeCommit()
        val tbl = new SnapshotTable(spark, dir, key)
        // only files the COMMITTED task attempts named — a speculative
        // duplicate's file sits unreferenced in the staging dir and is
        // removed with it below. expectedVersion = the statement's
        // pinned snapshot: a commit that landed since fails loudly here
        tbl.applyDelta(
          readStaged(upFiles, rowSchema),
          readStaged(delFiles, idSchema).toDF(key),
          expectedVersion = Some(expectedVersion))
      } finally cleanup()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

    private def cleanup(): Unit = {
      val p = new Path(stageDir)
      val fs = p.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      // retire the parent .rlo-stage dir too once empty (best-effort)
      val parent = p.getParent
      if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
        fs.delete(parent, false)
    }
  }

  override def description(): String = s"graft-snapshot delta write to $dir"
}

private[graft] object GraftDeltaWrite {
  /** Test seam: runs on the driver after the tasks' staged files are
    * collected and before the atomic applyDelta — the window a racing
    * writer must land in to prove the statement's CAS pin aborts it
    * loudly instead of losing the race silently. No-op in production. */
  private[graft] var onBeforeCommit: () => Unit = () => ()
}

/** Serializable Hadoop-conf carrier (`Configuration` itself is not
  * Java-serializable): standard write/readFields envelope. */
private[graft] final class GraftSerializableConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Task-side factory: everything it captures must be serializable, so
  * schemas travel as JSON and the Hadoop conf rides its envelope. */
private[graft] final class GraftDeltaWriterFactory(stageDir: String,
    rowSchemaJson: String, idSchemaJson: String,
    conf: GraftSerializableConf) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(stageDir, partitionId, taskId,
      DataType.fromJson(rowSchemaJson).asInstanceOf[StructType],
      DataType.fromJson(idSchemaJson).asInstanceOf[StructType], conf)
}

/** The committed staged files of one task attempt. */
private[graft] final case class GraftDeltaFiles(upserts: Seq[String],
    deletes: Seq[String]) extends WriterCommitMessage

/** One task's delta writer: lazily opens an upsert parquet (full row
  * schema) and a delete-key parquet (row-id schema) under the write's
  * staging dir, via Spark's own `ParquetWriteSupport` — no extra codec
  * machinery, and the staged bytes read back with the exact Spark
  * semantics they were written with. */
private[graft] final class GraftDeltaWriter(stageDir: String,
    partitionId: Int, taskId: Long, rowSchema: StructType,
    idSchema: StructType, shipped: GraftSerializableConf)
    extends DeltaWriter[InternalRow] {

  private var upWriter: ParquetWriter[InternalRow] = null
  private var delWriter: ParquetWriter[InternalRow] = null
  private var upPath: String = null
  private var delPath: String = null

  private def open(schema: StructType, kind: String): (ParquetWriter[InternalRow], String) = {
    val path = s"$stageDir/$kind-$partitionId-$taskId.parquet"
    // the DRIVER-captured session conf (filesystem + credentials +
    // actual parquet-write SQLConf values — see GraftDeltaWrite), cloned
    // per writer because setSchema below is a per-schema mutation
    val conf = new Configuration(shipped.value)
    ParquetWriteSupport.setSchema(schema, conf)
    val ws = new ParquetWriteSupport()
    val builder = new GraftRowParquetBuilder(new Path(path), ws).withConf(conf)
    (builder.build(), path)
  }

  override def insert(row: InternalRow): Unit = {
    if (upWriter == null) {
      val (w, p) = open(rowSchema, "up"); upWriter = w; upPath = p
    }
    upWriter.write(row)
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (delWriter == null) {
      val (w, p) = open(idSchema, "del"); delWriter = w; delPath = p
    }
    delWriter.write(id)
  }

  /** Unreachable under representUpdateAsDeleteAndInsert = true; kept
    * correct anyway. */
  override def update(metadata: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(metadata, id)
    insert(row)
  }

  override def write(row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = {
    if (upWriter != null) upWriter.close()
    if (delWriter != null) delWriter.close()
    GraftDeltaFiles(Option(upPath).toSeq, Option(delPath).toSeq)
  }

  override def abort(): Unit = close()

  override def close(): Unit = {
    if (upWriter != null) { upWriter.close(); upWriter = null }
    if (delWriter != null) { delWriter.close(); delWriter = null }
  }
}

/** Minimal public-API ParquetWriter builder over Spark's own
  * InternalRow WriteSupport. */
private[graft] final class GraftRowParquetBuilder(path: Path,
    ws: ParquetWriteSupport)
    extends ParquetWriter.Builder[InternalRow, GraftRowParquetBuilder](path) {
  override def self(): GraftRowParquetBuilder = this
  override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] = ws
}
