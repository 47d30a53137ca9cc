package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic
import org.apache.spark.sql.connector.read.{Batch, Scan, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.{NoopCache, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The graft catalog's NATIVE columnar read path: Spark's own DSv2
  * [[ParquetScan]] over the manifest's already-pruned live files — the
  * rung above the `V1Scan` bridge, which pays an
  * InternalRow→Row→InternalRow boundary on every `SELECT … FROM
  * graft.\`…\``. Here the vectorized parquet reader serves
  * `ColumnarBatch`es straight into `BatchScanExec` → `ColumnarToRow` →
  * whole-stage codegen, zero row materialization.
  *
  * All graft-specific work happened BEFORE this point, on the driver:
  * manifest file pruning against the pushed source filters
  * (`SnapshotTable.batchScanParts`), logical→physical column-name
  * translation, and byte lengths from the manifest (no listing RPCs).
  * What remains is exactly a parquet scan, so Spark's own scan — split
  * planning, row-group predicate pushdown, vectorized decode, columnar
  * support negotiation — is reused verbatim rather than re-derived.
  * Snapshots carrying deletion vectors never reach this class (their
  * sidecar anti-join needs the masked-relation route).
  *
  * The wrapper exists for ONE reason: a column-mapped table reads
  * PHYSICAL names from its files while the query resolves LOGICAL
  * names. Batch rows are positional, so serving the physical-schema
  * scan under a logical [[readSchema]] is a pure relabeling — the same
  * trick `SnapshotTable.scanOf`'s `toDF` does on the v1 route. */
final class GraftColumnarScan private (inner: ParquetScan,
    logicalRead: StructType, desc: String)
    extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = logicalRead
  override def toBatch: Batch = inner.toBatch
  override def estimateStatistics(): Statistics = inner.estimateStatistics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
  override def description(): String = s"$desc ${inner.description()}"
}

object GraftColumnarScan {
  /** Build the columnar scan. `physData`/`physRead` carry the files'
    * PHYSICAL column names (what parquet holds); `logicalRead` the same
    * positions under the query's logical names; `pushedPhys` the
    * translatable filters already renamed to physical — they feed
    * parquet ROW-GROUP pruning only (file pruning already happened, and
    * Spark re-evaluates every filter on the rows regardless). */
  def apply(spark: SparkSession, root: Path, files: Seq[FileStatus],
      physData: StructType, physRead: StructType, logicalRead: StructType,
      pushedPhys: Array[Filter], desc: String): Scan = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val inner = ParquetScan(cs, cs.sessionState.newHadoopConf(),
      new GraftStaticFileIndex(cs, root, files),
      physData, physRead, StructType(Nil), pushedPhys,
      CaseInsensitiveStringMap.empty())
    new GraftColumnarScan(inner, logicalRead, desc)
  }
}

/** A [[PartitioningAwareFileIndex]] over a FIXED, already-pruned file
  * list: the statuses come from manifest arithmetic, partitioning is
  * empty (graft tables cluster by key range, not hive dirs), and
  * refresh is a no-op — the snapshot is immutable by construction. */
private[graft] final class GraftStaticFileIndex(spark: classic.SparkSession,
    root: Path, files: Seq[FileStatus])
    extends PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {
  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
  override def leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = mutable.LinkedHashMap.empty[Path, FileStatus]
    files.foreach(f => m += f.getPath -> f)
    m
  }
  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    files.groupBy(_.getPath.getParent).map { case (d, fs) => d -> fs.toArray }
  // the files' own parent dirs, NOT the table root: an unpartitioned
  // PartitioningAwareFileIndex serves allFiles() by looking each root
  // up in leafDirToChildrenFiles, and graft data files live under
  // data/<commit-uuid>/ subdirectories — a table-root rootPath would
  // resolve to zero files (probed)
  override def rootPaths: Seq[Path] =
    files.map(_.getPath.getParent).distinct
  override def refresh(): Unit = ()
}
