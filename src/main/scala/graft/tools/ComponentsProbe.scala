package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (optimization round): split d_components wall time into the
  * edge-build phase vs the propagation loop, and report the round count.
  * Usage: ComponentsProbe [sfDir] [reps]
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val edges = graft.queries.Dedup.componentEdges(spark, sfDir)
      val nEdges = edges.count()
      val tEdges = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = graft.SparkEntry.queries("d_components")(spark, sfDir).count()
      val tFull = (System.nanoTime() - t1) / 1e9
      println(f"[cp] rep$r edges=$nEdges edgeBuild=$tEdges%.3f " +
        f"fullQuery=$tFull%.3f iters=${graft.queries.Dedup.lastComponentsIters} rows=$n")
      graft.util.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
