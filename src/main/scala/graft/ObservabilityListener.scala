package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{adaptive, QueryExecution}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.QueryExecutionListener

/** Production observability for the engine: a `QueryExecutionListener`
  * that captures, per Dataset action, the execution-level facts an
  * operator dashboard needs — wall time, output rows, bytes/files
  * scanned, shuffle bytes written — straight from the executed plan's
  * `SQLMetric`s (the same numbers the Spark UI shows, no extra
  * instrumentation on the query path).
  *
  * The reference's only observability is stdout prints
  * (`etl_script_incremental_pandas.py` phase logging); [[graft.incremental.RunLog]]
  * durably covers the run-level protocol, and this listener covers the
  * query level. Captures buffer in-process (the listener bus invokes us
  * off the action thread — a concurrent queue, no locks on the query
  * path) and [[GraftQueryMetrics.drainTo]] appends them to a parquet
  * metrics log, same append-only discipline as RunLog.
  *
  * Scale note: cost per action is one walk of the plan tree summing a
  * handful of longs — independent of data size; safe to leave installed
  * on every production session. */
class GraftQueryMetrics extends QueryExecutionListener {

  // No job-description field: QueryExecutionListener callbacks arrive on
  // the listener-bus thread, where the ACTION thread's local properties
  // (setJobDescription) are not visible — reading them here would
  // silently record the wrong (null) value. Callers that need a logical
  // query name should drain per query, as Bench-style harnesses do.
  final case class Captured(
      action: String,
      durationMs: Long,
      outputRows: Option[Long],
      filesRead: Long,
      bytesRead: Long,
      shuffleBytesWritten: Long,
      error: Option[String])

  private val buf = new ConcurrentLinkedQueue[Captured]

  /** Executed so far and not yet drained (oldest first). */
  def captured: Seq[Captured] = {
    val it = buf.iterator(); val b = Seq.newBuilder[Captured]
    while (it.hasNext) b += it.next()
    b.result()
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    buf.add(capture(funcName, qe, durationNs / 1000000L, None))

  override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
    buf.add(capture(funcName, qe, -1L, Some(ex.toString)))

  /** The full executed tree: AdaptiveSparkPlanExec and QueryStageExec
    * hold their materialized plans as fields, not children, so a plain
    * `collect` stops at them — expand through both. */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: adaptive.AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case q: adaptive.QueryStageExec => q +: allNodes(q.plan)
      case n => Seq(n)
    }

  private def capture(funcName: String, qe: QueryExecution, durMs: Long,
      err: Option[String]): Captured =
    try {
      val nodes = allNodes(qe.executedPlan)
      // sum a metric key over every node (AQE-final tree at callback time)
      def total(key: String): Long =
        nodes.flatMap(_.metrics.get(key)).map(_.value).sum
      Captured(
        action = funcName,
        durationMs = durMs,
        // allNodes is pre-order, so the FIRST numOutputRows-bearing node
        // is the one nearest the root — the action's result cardinality
        // (the literal root is often a metric-less wrapper: result query
        // stage, columnar transition, project)
        outputRows = nodes.iterator
          .flatMap(_.metrics.get("numOutputRows").map(_.value)).nextOption(),
        filesRead = total("numFiles"),
        bytesRead = total("filesSize"),
        shuffleBytesWritten = total("shuffleBytesWritten"),
        error = err)
    } catch {
      // a capture must NEVER be lost to a plan-introspection surprise
      // (e.g. an unfinalized adaptive plan on the failure path) — record
      // the action with empty metrics instead
      case t: Throwable => Captured(funcName, durMs, None, 0L, 0L, 0L,
        err.orElse(Some(s"metric capture failed: $t")))
    }

  /** Append everything captured so far to `path` (parquet) and clear the
    * buffer. Append-only like [[graft.incremental.RunLog]]: metrics are
    * immutable history. */
  def drainTo(spark: SparkSession, path: String): Long = {
    import scala.jdk.CollectionConverters._
    var rows = List.empty[org.apache.spark.sql.Row]
    var c = buf.poll()
    while (c != null) {
      rows ::= org.apache.spark.sql.Row(
        new java.sql.Timestamp(System.currentTimeMillis()),
        c.action, c.durationMs,
        c.outputRows.map(Long.box).orNull, c.filesRead, c.bytesRead,
        c.shuffleBytesWritten, c.error.orNull)
      c = buf.poll()
    }
    if (rows.nonEmpty)
      spark.createDataFrame(rows.reverse.asJava, GraftQueryMetrics.schema)
        .coalesce(1).write.mode("append").parquet(path)
    rows.size.toLong
  }
}

object GraftQueryMetrics {

  val schema: StructType = StructType(Seq(
    StructField("logged_at", TimestampType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("output_rows", LongType, nullable = true),
    StructField("files_read", LongType, nullable = false),
    StructField("bytes_read", LongType, nullable = false),
    StructField("shuffle_bytes_written", LongType, nullable = false),
    StructField("error", StringType, nullable = true)))

  /** Install a fresh listener on the session and return it. */
  def register(spark: SparkSession): GraftQueryMetrics = {
    val l = new GraftQueryMetrics
    spark.listenerManager.register(l)
    l
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).parquet(path)
}
