package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization round): dump `.explain("formatted")` for named
  * SparkEntry queries to files and time warm reps in ONE JVM — the
  * before/after plan evidence committed under plans/r06/. Usage:
  *   PlanDump <outDir> <suffix> <query>[,<query>...] [sfDir] [reps]
  * Writes <outDir>/<query>_<suffix>.txt per query and prints warm
  * timings ([pd] lines). Streaming (st_*) queries execute eagerly inside
  * their builder, so their file carries the post-drain result plan; the
  * timing is still the full drain wall time.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val reps = if (args.length > 4) args(4).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        graft.util.CacheScope.releaseAll()
        (s, n)
      }
      val secs = times.map(_._1)
      println(f"[pd] $name rows=${times.head._2} " +
        f"min=${secs.min}%.3f med=${secs.sorted.apply(secs.length / 2)}%.3f " +
        secs.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
