package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1).
  *
  * The reference reads its `rental` source over JDBC with the delta
  * predicate embedded in the SQL string (S1/S2,
  * etl_script_incremental_pandas.py:98,120-125) and upserts into
  * Postgres tables (S5/S6). Here:
  *
  *  - [[cdcJdbc]] reproduces the JDBC shape: the CDC interval travels as
  *    a pushed predicate so only delta rows cross the wire. (No database
  *    ships in this container — the parquet/csv/json paths carry the
  *    tests; the JDBC call is the same public `DataFrameReader` API.)
  *  - [[readTable]] is the format-agnostic batch reader (parquet
  *    default; csv/json with explicit schema — never schema inference in
  *    production paths, it costs a full extra pass at scale).
  *  - [[PartitionedSink]] is the keyed-upsert sink for big outputs:
  *    year-partitioned layout + dynamic partition overwrite, so an
  *    incremental run rewrites only the partitions its delta touches
  *    (contrast a whole-table overwrite commit — right for week-
  *    cardinality state, wrong for fact-sized outputs; the summary
  *    state itself uses [[graft.incremental.SnapshotTable]]'s
  *    file-pruned copy-on-write).
  */
object Sources {

  /** Format-agnostic table reader with explicit schema for text formats. */
  def readTable(
      spark: SparkSession,
      path: String,
      format: String = "parquet",
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(format).options(options)
    val withSchema = schema.fold(r)(r.schema)
    format match {
      case "csv" => withSchema.option("header", "true").load(path)
      case _ => withSchema.load(path)
    }
  }

  /** Result of [[jsonlIngest]]: both splits share ONE cached scan;
    * [[unpersist]] releases it (unpersisting the derived `good`/
    * `quarantine` frames would NOT — their cache entry is the shared
    * parent's). */
  final case class JsonlSplit(
      good: DataFrame, quarantine: DataFrame, private val shared: DataFrame) {
    def unpersist(): Unit = { shared.unpersist(); () }
  }

  /** Fault-tolerant JSONL corpus ingest: explicit schema + PERMISSIVE
    * mode with a `_corrupt_record` capture column, split into
    * good/quarantine — the shape a 100 TB multi-source crawl ingest
    * needs, where FAILFAST means dying at row 10¹² and silently DROPPING
    * malformed rows destroys the audit trail. Good rows lose the capture
    * column; quarantine rows carry the raw line for replay/forensics.
    *
    * The schema is explicit (never inferred): inference is a full extra
    * pass over the data, and a drifting source would silently change the
    * contract downstream. Spark requires the capture column to reach the
    * row before filtering (a plain filter on it alone is disallowed on
    * the un-cached frame), so both splits project THROUGH a scan that
    * selects it explicitly. */
  def jsonlIngest(
      spark: SparkSession,
      path: String,
      schema: StructType): JsonlSplit = {
    val capture = "_corrupt_record"
    val full = spark.read
      .schema(schema.add(capture, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", capture)
      .json(path)
      .cache() // one scan feeds both splits; release via JsonlSplit.unpersist
    JsonlSplit(
      full.filter(col(capture).isNull).drop(capture),
      full.filter(col(capture).isNotNull).select(col(capture).as("raw_line")),
      full)
  }

  /** JDBC CDC extraction — the reference's delta query shape. The
    * `(wm, max]` predicate is passed through `predicates`, which Spark
    * appends to the remote WHERE clause: the filter runs in the source
    * database and partitions the read (one JDBC partition per predicate
    * disjunct). */
  def cdcJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      watermarkCol: String,
      wm: java.sql.Timestamp,
      max: java.sql.Timestamp,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table,
      Array(s"$watermarkCol > '$wm' AND $watermarkCol <= '$max'"), props)

  /** Range-clustered parquet writer: `repartitionByRange` on the
    * cluster key + `sortWithinPartitions` before the write, so every
    * output file covers a DISJOINT key range and carries tight parquet
    * min/max column stats. Selective scans then skip whole files and
    * row groups instead of reading and filtering — the data-layout
    * lever for 1-D predicates at 100 TB (sorted clustering; pair with
    * directory partitioning for the coarse dimension and this for the
    * fine one). `numFiles` pins the range sampling to a deterministic
    * layout; the in-file sort gives row-group-granularity stats too. */
  def clusteredWrite(df: DataFrame, path: String, clusterCol: String,
      numFiles: Int = 8): Unit =
    df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(col(clusterCol))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Z-order (Morton) clustered parquet writer — the 2-D data-layout
    * lever: interleaving the bit-buckets of BOTH cluster keys gives
    * every output file a small bounding box in (colA, colB) space, so
    * predicates on EITHER dimension (or a box on both) skip most
    * files/row groups via parquet min/max stats. Contrast
    * [[clusteredWrite]], which localizes exactly one dimension.
    *
    * Scale shape: one `percentile_approx` pass per dimension gives
    * 2^bits rank boundaries (KB-sized, driver-collected — the only
    * global structure, same argument as the IVF quantizer); bucket
    * assignment + bit interleave are row-local projections; the final
    * `repartitionByRange` on the z-code is the one shuffle. No global
    * sort, no unpartitioned window. */
  def zOrderedWrite(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int = 16, bits: Int = 8): Unit = {
    require(bits >= 1 && bits <= 15, s"bits=$bits out of range")
    val n = 1 << bits
    // rank-normalize each dimension to [0, 2^bits) via approx-quantile
    // boundaries (cast through double: works for numeric + temporal)
    def boundaries(c: String): Array[Double] = {
      val probs = array((1 until n).map(i => lit(i.toDouble / n)): _*)
      df.select(percentile_approx(col(c).cast("double"), probs, lit(10000)))
        .head().getSeq[Double](0).toArray
    }
    def bucket(c: String, bs: Array[Double]) =
      bs.foldLeft(lit(0))((acc, b) =>
        acc + when(col(c).cast("double") > lit(b), 1).otherwise(0))
    // Morton interleave: bit i of A -> bit 2i, bit i of B -> bit 2i+1.
    def interleave(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (0 until bits).foldLeft(lit(0L))((acc, i) =>
        acc
          .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(1).cast("long"), 2 * i))
          .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1).cast("long"), 2 * i + 1)))
    val z = interleave(bucket(colA, boundaries(colA)), bucket(colB, boundaries(colB)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(bytes / targetBytes)` files via a write-then-swap
    * commit (temp dir + two renames) — readers never observe
    * a half-compacted table. Streaming sinks and frequent small
    * upserts accrete kilobyte files whose per-file open/footer cost
    * eventually dominates scans; periodic compaction is the standard
    * maintenance job. Row data is unchanged (asserted by the spec). */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact")
    val trash = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(tmp, true); fs.delete(trash, true)
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (!fs.rename(hPath, trash))
      throw new java.io.IOException(s"compact: could not retire $hPath")
    if (!fs.rename(tmp, hPath))
      throw new java.io.IOException(s"compact: could not commit $tmp")
    fs.delete(trash, true)
  }

  /** Year-partitioned keyed-upsert sink over immutable files. */
  final class PartitionedSink(spark: SparkSession, path: String, keyCol: String,
      partCol: String = "part_year") {

    private def existsDir: Boolean = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }

    def read(): DataFrame = spark.read.parquet(path)

    /** Upsert `incoming` (must carry `keyCol`; `partCol` is derived):
      * rewrites ONLY the partitions the incoming keys touch — surviving
      * rows of touched partitions are unioned back in, and
      * `partitionOverwriteMode=dynamic` leaves every untouched partition
      * byte-identical on disk. */
    def upsert(incoming: DataFrame, deriveYear: String => org.apache.spark.sql.Column =
        c => year(col(c))): Unit = {
      val incomingP = incoming.withColumn(partCol, deriveYear(keyCol))
      val payload =
        if (!existsDir) incomingP
        else {
          val touched = incomingP.select(col(partCol)).distinct()
          val survivors = read()
            .join(broadcast(touched), Seq(partCol), "left_semi")
            .join(incomingP.select(col(keyCol)), Seq(keyCol), "left_anti")
          incomingP.unionByName(survivors)
        }
      payload.write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(path)
    }

    /** Retention: drop whole partitions older than `beforeYear` — a
      * directory delete per expired partition, NO data rewrite (the
      * point of partitioning by the retention dimension: a 100 TB
      * table expires a year in O(partitions) metadata ops). Returns
      * the partition values removed. */
    def expire(beforeYear: Int): Seq[Int] = {
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(hPath)) return Seq.empty
      val prefix = s"$partCol="
      fs.listStatus(hPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
        .flatMap { st =>
          val year = st.getPath.getName.stripPrefix(prefix).toIntOption
          year.filter(_ < beforeYear).map { y => fs.delete(st.getPath, true); y }
        }.sorted
    }
  }
}
