package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization round): run one st_* query and print the
  * per-micro-batch durationMs breakdown + state-operator metrics from
  * the progress feed — where does an AvailableNow drain actually spend
  * its wall time? Usage: StreamProbe <query> [sfDir] [reps]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val progress = java.util.Collections.synchronizedList(
      new java.util.ArrayList[org.apache.spark.sql.streaming.StreamingQueryProgress]())
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          progress.add(e.progress)
      })
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      progress.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // async listener drain
      println(f"[sp] $name rep$r wall=$wall%.3f rows=$n batches=${progress.size}")
      import scala.jdk.CollectionConverters._
      progress.asScala.foreach { p =>
        val dm = p.durationMs.asScala.toSeq.sortBy(-_._2.longValue)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        val so = p.stateOperators.map(s =>
          s"op=${s.operatorName} rows=${s.numRowsTotal} upd=${s.numRowsUpdated}" +
            s" commitMs=${s.allUpdatesTimeMs}/${s.commitTimeMs}").mkString("; ")
        println(f"[sp]   b${p.batchId} in=${p.numInputRows} $dm | $so")
      }
      graft.util.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
