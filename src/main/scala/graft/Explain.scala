package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <q1,q2,...> [sfDir]` prints the
  * formatted physical plan of each named [[SparkEntry]] query and its
  * noop-sink wall-clock — the .explain/iterate loop the build brief asks
  * for, as a one-command tool. */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] $name took ${(System.nanoTime() - t0) / 1e9}%.2f s on $sfDir")
    }
    spark.stop()
  }
}
