package graft.incremental

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL MAINTENANCE VERBS for the graft catalog — DSv2 stored procedures
  * (`ProcedureCatalog`), so a pure-SQL operator can run the table's
  * lifecycle jobs without a line of Scala:
  * {{{
  *   CALL graft.optimize(`table` => '/data/corpus')            -- compact small files
  *   CALL graft.optimize(`table` => '/data/corpus',
  *                       zorder_by => 'n_chars,lang')          -- multi-dim recluster
  *   CALL graft.vacuum(`table` => '/data/corpus')              -- reclaim orphans
  *   CALL graft.restore(`table` => '/data/corpus', version => 3)
  *   CALL graft.retire(`table` => '/data/corpus', keep_last => 10)
  *   CALL graft.repair_null_keys(`table` => '/data/corpus')    -- legacy migration
  *   CALL graft.collect_stats(`table` => '/data/corpus',
  *                            columns => 'n_chars')            -- stats backfill
  *   CALL graft.history(`table` => '/data/corpus')             -- the commit log
  * }}}
  * Each is a thin veneer over the Scala operation of the same name —
  * ONE implementation per verb, the SQL route adds argument plumbing
  * only — and returns a one-row result (the new version / reclaimed
  * count) through a [[LocalScan]], so `CALL` output is inspectable in
  * plain SQL. All verbs are non-deterministic by nature (they commit)
  * and run eagerly at CALL execution. */
private[graft] object GraftProcedures {

  /** Procedure lookup for [[GraftCatalog.loadProcedure]]; `resolve`
    * maps the `table` argument through the catalog's path rules
    * (absolute, or warehouse-relative). */
  def load(name: String, resolve: String => String): Option[UnboundProcedure] = {
    def handle(path: String): SnapshotTable = {
      val dir = resolve(path)
      val spark = SparkSession.active
      val key = SnapshotTable.keyAt(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no graft snapshot table at $dir"))
      new SnapshotTable(spark, dir, key)
    }
    val table = ProcedureParameter.in("table", StringType)
      .comment("table path (absolute, or warehouse-relative)").build()
    name match {
      case "optimize" => Some(proc(name,
        Array(table,
          ProcedureParameter.in("small_bytes", LongType)
            .defaultValue((32L << 20).toString).build(),
          ProcedureParameter.in("zorder_by", StringType)
            .defaultValue("''").comment("comma-separated columns").build()),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        in => {
          val zorder = Option(in.getUTF8String(2)).map(_.toString).getOrElse("")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          row(handle(in.getUTF8String(0).toString)
            .optimize(in.getLong(1), zorder))
        }))
      case "vacuum" => Some(proc(name,
        Array(table,
          ProcedureParameter.in("grace_ms", LongType)
            .defaultValue("600000").build()),
        StructType(Seq(StructField("deleted_files", LongType, nullable = false))),
        in => row(handle(in.getUTF8String(0).toString)
          .vacuum(in.getLong(1)).size.toLong)))
      case "restore" => Some(proc(name,
        Array(table, ProcedureParameter.in("version", LongType).build()),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        in => row(handle(in.getUTF8String(0).toString).restore(in.getLong(1)))))
      case "retire" => Some(proc(name,
        Array(table, ProcedureParameter.in("keep_last", IntegerType).build()),
        StructType(Seq(StructField("kept", IntegerType, nullable = false))),
        in => // actual versions retained: min(keep_last, history length)
          row(handle(in.getUTF8String(0).toString).retire(in.getInt(1)))))
      case "repair_null_keys" => Some(proc(name,
        Array(table),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        in => row(handle(in.getUTF8String(0).toString).repairNullKeys())))
      case "history" => Some(proc(name,
        Array(table),
        StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("parent", LongType, nullable = false),
          StructField("op", StringType, nullable = false),
          StructField("files", IntegerType, nullable = false),
          StructField("rows", LongType, nullable = false),
          StructField("tag", StringType, nullable = true))),
        in => {
          val h = handle(in.getUTF8String(0).toString)
          h.history.map { case (v, parent, op, files, rows) =>
            new GenericInternalRow(Array[Any](v, parent,
              UTF8String.fromString(op), files, rows,
              h.tagAt(v).map(UTF8String.fromString).orNull)): InternalRow
          }.toArray
        }))
      case "collect_stats" => Some(proc(name,
        Array(table,
          ProcedureParameter.in("columns", StringType)
            .comment("comma-separated columns to backfill skipping stats for").build()),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        in => {
          val cols = Option(in.getUTF8String(1)).map(_.toString).getOrElse("")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          row(handle(in.getUTF8String(0).toString).collectStats(cols))
        }))
      case _ => None
    }
  }

  val names: Seq[String] =
    Seq("optimize", "vacuum", "restore", "retire", "repair_null_keys",
      "collect_stats", "history")

  /** One-value result row — every maintenance verb returns one. */
  private def row(v: Any): Array[InternalRow] =
    Array(new GenericInternalRow(Array(v)))

  private def proc(procName: String, params: Array[ProcedureParameter],
      out: StructType, run: InternalRow => Array[InternalRow])
      : UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft table maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val result = run(input) // eager: a maintenance op commits HERE
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = result
          override def readSchema(): StructType = out
        }).iterator()
      }
    }
}
