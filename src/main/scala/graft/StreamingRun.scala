package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.WeeklySummaryStream

/** Direct-run entry for the streaming maintenance path: splits the
  * rental view of `sfDir` into `nSegments` CDC log files by `last_update`
  * order (simulating a growing log), replays them through
  * [[WeeklySummaryStream]] one file per micro-batch, and prints the
  * resulting summary row count + tail.
  *
  * Usage: runMain graft.StreamingRun <sfDir> <workDir> [nSegments]
  */
object StreamingRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val workDir = args(1)
    val nSegments = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val logDir = s"$workDir/log"
    val rental = Tables.rental(spark, sfDir)
      .withColumn("rental_date", col("rental_date").cast("timestamp"))
      .withColumn("return_date", col("return_date").cast("timestamp"))
      .withColumn("last_update", col("last_update").cast("timestamp"))
      .withColumn("seg", ntile(nSegments).over(
        org.apache.spark.sql.expressions.Window.orderBy("last_update", "rental_id")))
    new java.io.File(logDir).mkdirs()
    (1 to nSegments).foreach { i =>
      val tmp = s"$workDir/seg$i"
      rental.filter(col("seg") === i).drop("seg")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$logDir/seg$i.parquet"))
    }

    val q = WeeklySummaryStream.start(
      spark, logDir, s"$workDir/state", s"$workDir/ckpt")
    q.awaitTermination()

    val out = WeeklySummaryStream.summary(spark, s"$workDir/state")
    println(s"[stream] summary weeks=${out.count()}")
    out.orderBy(col("week_beginning").desc).limit(3).collect()
      .foreach(r => println(s"[stream] $r"))
    spark.stop()
  }
}
