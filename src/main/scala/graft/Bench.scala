package graft

import graft.fixtures.Corpus
import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark harness (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Also measures raw
  * extraction throughput (docs/s, MB/s of html ingested) over an
  * amplified page corpus — the north_star metric. Parallelism comes from
  * SPARK_GRAFT_CPUS, so the same harness evidences N→4N scaling
  * (local[8] vs local[32]); results land in BENCH/BASELINE.md.
  */
object Bench {

  /** EVERY query gets timed (cold + warm) so a regression can never hide
    * in an unbenched operator — including the st_* streaming family
    * (AvailableNow drain wall time; setup/checkpoint cost is real cost,
    * and the listener-fed `streaming` section reports per-query input
    * rows/s so a throughput regression is visible separately from
    * staging). Sorted for a stable cross-round key order in
    * BENCH_r{N}.json.
    */
  private def headline(qs: Map[String, _]): Seq[String] =
    qs.keys.toSeq.sorted

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // default 64× (≈320k pages / 310 MB at sf0.1): large enough that the
    // throughput sample is not dominated by job-setup noise (±50% at 8×),
    // small enough to stage in well under a minute (staged once, cached)
    val amplify = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    // --- extraction throughput (north_star: docs/s, MB/s html ingested) --
    // stage the amplified page corpus as a parquet table ONCE (untimed,
    // reused across parallelism levels), then time the real path:
    // parquet scan (column-pruned) → extract_content → aggregate sink
    val sfTag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val staged = s"/tmp/graft-bench-pages-v${graft.fixtures.PageHtml.CorpusVersion}-$sfTag-x$amplify"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(staged, "_SUCCESS"))) {
      Corpus.pagesAmplified(spark, sfDir, amplify)
        .repartition(64)
        .write.mode("overwrite").parquet(staged)
    }
    def extractionRun(): (Long, Long, Double) = {
      val pages = spark.read.parquet(staged)
      val t0 = System.nanoTime()
      val row = pages
        .select(col("url"),
          coalesce(length(col("html")).cast("long"), lit(0L)).as("in_bytes"),
          call_function("extract_content", col("url"), col("html"), col("lang")).as("r"))
        .agg(count(lit(1)), sum(col("in_bytes")),
          sum(length(col("r.extracted_text"))))
        .head()
      val sec = (System.nanoTime() - t0) / 1e9
      (row.getLong(0), row.getLong(1), sec)
    }
    extractionRun() // warm-up: JIT + codegen caches
    // best-of-N: the sandbox host has noisy neighbors; min wall time is
    // the standard noise-robust throughput estimator
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val runs = (1 to reps).map(_ => extractionRun())
    val (docs, bytes, extractSec) = runs.minBy(_._3)
    val docsPerSec = docs / extractSec
    val mbPerSec = bytes / 1e6 / extractSec

    // scaling-matrix runs only need extract_sec — they skip both the
    // query sweep AND the WARC micro-bench below (a skipped run must not
    // pay a 120 MB staging probe + 7 timed scans it never reports)
    val skipQueries = sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1")

    // --- WARC metadata-pass pruning delta --------------------------------
    // url-count over an AMPLIFIED staged WARC corpus (the x_warc staging
    // is only ~425 records — pure setup noise), full-schema vs projected
    // read: the projected path walks the same records but never copies a
    // body — the delta IS the html materialization cost a metadata pass
    // saves (mirrors the streaming connector's required-column pushdown)
    // row count ×4, body size ×64 (~60 KB/page — the Common-Crawl shape;
    // the fixture's ~1 KB pages are inflate-dominated and would hide the
    // body-copy saving entirely) ≈ 120 MB of html in 32 chunk files
    val (warcFullSec, warcPrunedSec) =
      if (skipQueries) (-1.0, -1.0)
      else {
        val warcAmp = 4
        val warcDir = graft.util.Staging.keyedArtifact(
          s"warcbench-x$warcAmp", sfDir, graft.fixtures.PageHtml.CorpusVersion)(p =>
          java.nio.file.Files.exists(p.resolve("_SUCCESS"))) { out =>
          graft.sources.Warc.write(spark,
            Corpus.pagesAmplified(spark, sfDir, warcAmp, repeatText = 64),
            out, numFiles = 32)
        }
        def timeCount(df: => org.apache.spark.sql.DataFrame): Double = {
          val t0 = System.nanoTime()
          df.count()
          (System.nanoTime() - t0) / 1e9
        }
        timeCount(graft.sources.Warc.read(spark, warcDir)) // warm-up
        val full = (1 to 3).map(_ =>
          timeCount(graft.sources.Warc.read(spark, warcDir).select(col("url")))).min
        val pruned = (1 to 3).map(_ =>
          timeCount(graft.sources.Warc.read(spark, warcDir, Seq("url")))).min
        (full, pruned)
      }

    // --- headline query timings ------------------------------------------
    val qs =
      if (skipQueries)
        Map.empty[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame]
      else SparkEntry.queries
    // each query runs twice: the cold first run is dominated by
    // plan-compile/codegen fixed cost (±3× noisy on this host — see
    // BENCH/BASELINE.md), the second (warm) run is the per-query number
    // comparable across rounds, so "queries" carries warm and
    // "queries_cold" the first-run time
    // per-stream progress feed: input rows + trigger wall time per sink
    // name, summed over batches — rows/s for each st_* query without the
    // recentProgress 100-entry cap
    val stProgress =
      new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          val name = if (p.name != null) p.name else p.id.toString
          val ms = Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(0L)
          stProgress.merge(name, (p.numInputRows, ms),
            (a, b) => (a._1 + b._1, a._2 + b._2))
          ()
        }
      })

    val results = headline(qs).map { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { qs(name)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      val cold = once()
      val warm = if (cold >= 0) once() else -1.0
      // drop query-internal caches at the boundary: 77 queries' shingle/
      // fingerprint tables must not accumulate storage memory for the
      // rest of the sweep (warm rep already ran, so reuse is done)
      graft.util.CacheScope.releaseAll()
      (name, cold, warm)
    }

    def js(f: ((String, Double, Double)) => Double) =
      results.map(r => s""""${r._1}":${"%.3f".format(f(r))}""").mkString("{", ",", "}")
    val qJson = js(_._3)
    val qColdJson = js(_._2)
    // per-sink streaming throughput from the progress feed
    val stJson = {
      import scala.jdk.CollectionConverters._
      stProgress.asScala.toSeq.sortBy(_._1).map { case (n, (rows, ms)) =>
        val rps = if (ms > 0) rows * 1000.0 / ms else 0.0
        s""""$n":{"rows":$rows,"trigger_ms":$ms,"rows_per_sec":${"%.1f".format(rps)}}"""
      }.mkString("{", ",", "}")
    }
    val total = results.map(_._3).filter(_ >= 0).sum + extractSec
    println(
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec",""" +
        s""""queries":$qJson,"queries_cold":$qColdJson,"sf":"$sfDir","cpus":$cpus,""" +
        s""""extract_docs":$docs,"extract_bytes":$bytes,""" +
        s""""extract_sec":${"%.3f".format(extractSec)},""" +
        s""""extract_docs_per_sec":${"%.1f".format(docsPerSec)},""" +
        s""""extract_mb_per_sec":${"%.2f".format(mbPerSec)},""" +
        s""""warc_urlcount_full_sec":${"%.3f".format(warcFullSec)},""" +
        s""""warc_urlcount_pruned_sec":${"%.3f".format(warcPrunedSec)},""" +
        s""""streaming":$stJson}""")
    spark.stop()
  }
}
