package graft

import org.apache.spark.sql.SparkSession

import graft.functions.TextExprs
import graft.plans.{AsOfJoinStrategy, BandJoinRewrite}

/** Library entry point: a SparkSession configured the way every graft
  * operator expects (UTC session time, AQE on, sane local shuffle
  * parallelism) with the graft function registry installed
  * (`vec_dot`, `word_shingles`, `minhash_sig`, `simhash64`) and the
  * graft optimizer rules (band-join rewrite) active.
  *
  * On a cluster, pass the same settings through spark-submit and call
  * [[install]] on the existing session instead — or set
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions`.
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    install(spark)
    spark
  }

  /** Idempotently install graft's custom expressions and optimizer
    * rules on any session. */
  def install(spark: SparkSession): SparkSession = {
    TextExprs.register(spark)
    // the snapshot store's SQL catalog (SELECT/INSERT/DELETE/time
    // travel on graft.`/path` tables) — catalog plugins instantiate
    // lazily from conf, so a runtime set is the supported install hook;
    // never clobber a deployment that bound the name to something else
    if (!spark.conf.getOption("spark.sql.catalog.graft").isDefined)
      spark.conf.set("spark.sql.catalog.graft",
        "graft.incremental.GraftCatalog")
    if (!spark.experimental.extraOptimizations.contains(BandJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandJoinRewrite
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    spark
  }
}
