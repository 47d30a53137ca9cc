package graft

import org.apache.spark.sql.functions._

/** Same-session A/B for the catalog read route (r18): the DSv2 NATIVE
  * COLUMNAR scan (`SELECT … FROM graft.`…``) against the
  * `USING graft-snapshot` format-view route (v1 HadoopFsRelation fast
  * path) on the SAME DV-free table — the r17 verdict's acceptance bar
  * for replacing the `V1Scan` bridge was "catalog read ≤ 1.1× the
  * format read". Prints ONE JSON line with per-route medians.
  *
  *   sbt "runMain graft.CatalogAb /root/testdata/sf0.1"
  */
object CatalogAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_AB_REPS").map(_.toInt).getOrElse(7)
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()))
    // the sf-dir documents table plus a deterministic synthetic
    // inflation to a SCAN-DOMINATED size (~4M rows): both routes plan
    // identical work, and the clock sees per-row decode cost rather
    // than per-statement planning constants — the shape that matters
    // at 100 TB (the constant is bounded; the per-row ratio is not)
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars").cast("long").as("n_chars"))
    val rows = sys.env.get("SPARK_GRAFT_AB_ROWS").map(_.toLong).getOrElse(4000000L)
    val docs = base.unionByName(
      spark.range(rows).select(
        (col("id") + 100000000L).as("doc_id"),
        concat(lit("synthetic-payload-"), col("id") % 9973).as("text"),
        (col("id") % 997).as("n_chars")))
    val scratch = java.nio.file.Files.createTempDirectory("graft-ab").toString
    val dir = s"$scratch/store"
    new incremental.SnapshotTable(spark, dir, "doc_id",
      clusterPartitions = Some(32), statsColumns = Seq("n_chars")).create(docs)
    spark.sql(s"CREATE TEMPORARY VIEW catalog_ab_v USING `graft-snapshot` " +
      s"OPTIONS (path '$dir')")
    // a scan-dominated shape: wide aggregate over a selective-ish band,
    // so the read route's per-row cost is what the clock sees
    def run(from: String): Long = spark.sql(
      s"SELECT count(*) AS n, sum(n_chars) AS s, sum(length(text)) AS t " +
        s"FROM $from WHERE n_chars >= 100").collect()(0).getLong(0)
    def medianSec(from: String): Double = {
      run(from) // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); run(from); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    if (sys.env.contains("SPARK_GRAFT_AB_PROFILE")) {
      def phase(from: String): Unit = {
        val t0 = System.nanoTime()
        val df = spark.sql(s"SELECT count(*) AS n, sum(n_chars) AS s, " +
          s"sum(length(text)) AS t FROM $from WHERE n_chars >= 100")
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + optimization + planning
        val t2 = System.nanoTime()
        df.collect()
        val t3 = System.nanoTime()
        println(f"[ab-profile] $from%-20s parse ${(t1 - t0) / 1e3}%8.0f us  " +
          f"plan ${(t2 - t1) / 1e3}%8.0f us  exec ${(t3 - t2) / 1e3}%8.0f us")
      }
      (1 to 4).foreach { _ => phase("catalog_ab_v"); phase(s"graft.`$dir`") }
    }
    // alternate which route warms first across the pair to be fair
    val fmt = medianSec("catalog_ab_v")
    val cat = medianSec(s"graft.`$dir`")
    val fmt2 = medianSec("catalog_ab_v")
    val catM = cat
    val fmtM = math.min(fmt, fmt2)
    println(s"""{"metric":"catalog_vs_format_read","catalog_sec":$catM,""" +
      s""""format_sec":$fmtM,"ratio":${catM / fmtM},"reps":$reps,"sf_dir":"$sfDir"}""")
    val hp = new org.apache.hadoop.fs.Path(scratch)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    spark.stop()
  }
}
