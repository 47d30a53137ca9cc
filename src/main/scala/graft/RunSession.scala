package graft

import org.apache.spark.sql.SparkSession

/** Session acquisition for the embeddable operational mains
  * ([[IncrementalRun]], [[StreamingRun]], [[CorpusRun]], [[ExportRun]],
  * [[IngestRun]]).
  *
  * The mains used to call `SparkSession.builder().config(...).getOrCreate()`
  * even when a session already existed — but `getOrCreate()` applies the
  * builder's RUNTIME SQL configs to the existing session, so embedding a
  * main (Bench timing an operational path, a spec) silently reconfigured
  * the caller: with `SPARK_GRAFT_CPUS` unset, Bench's
  * `spark.sql.shuffle.partitions` dropped from 32 to the mains' default
  * of 4 for every query that ran after the first operational row. Here
  * the existing session is returned UNTOUCHED; only a genuinely fresh
  * run builds (and later stops) its own.
  */
object RunSession {

  /** (session, owned): reuse the active/default session as-is, or build
    * a fresh `local[SPARK_GRAFT_CPUS]` one the caller must stop
    * (`owned = true`). Failure signalling follows ownership too: an
    * embedded main throws instead of `sys.exit`-ing the shared JVM. */
  def obtain(): (SparkSession, Boolean) =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) => (s, false)
      case None =>
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
        val s = SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        (s, true)
    }
}
