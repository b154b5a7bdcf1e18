package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Spill/memory evidence for the wide dedup reassembly aggregations
  * (d_paragraph / d_ngram_spans): their final groupBy(doc_id) holds one
  * document's surviving pieces per key (`collect_list(struct(...))`) —
  * correct and per-doc bounded, but the verdict asked for EVIDENCE that
  * at scale the aggregation SPILLS rather than OOMs. This probe:
  *
  *   1. stages an amplified corpus (replica-suffixed words, as
  *      DedupScale) PLUS one planted giant document (default 1M words
  *      ≈ 7 MB text → ~100k paragraph structs / 1M token structs in a
  *      single aggregation key — the worst per-doc case);
  *   2. runs both queries to completion under the capped heap it was
  *      launched with (-Xmx sized so the shuffle/agg working set
  *      exceeds execution memory), recording memory/disk spill bytes
  *      and peak execution memory from a SparkListener.
  *
  * Passing = both queries complete (rows match the staged corpus), disk
  * spill observed > 0, and the giant doc's output row is intact. One
  * JSON line to stdout; recorded in BENCH/spillprobe_r4.json:
  * 160k docs + 1M-word giant under -Xmx1g → 2.6 GB memory-spilled /
  * 0.6 GB disk-spilled, zero OOM, giant row exact.
  *
  * The giant-doc case also caught a real scale bug on first run: an
  * inlined split(text) Column inside the gram-transform lambda made
  * d_ngram_spans/c_decontaminate O(len²) per document (fixed by
  * projecting `ws` once per row).
  *
  * Usage: SpillProbe [sfDir] [amplify] [giantWords] [cpus]
  */
object SpillProbe {

  private final class SpillListener extends SparkListener {
    val memSpilled = new AtomicLong(0)
    val diskSpilled = new AtomicLong(0)
    val peakExecMem = new AtomicLong(0)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      memSpilled.addAndGet(m.memoryBytesSpilled)
      diskSpilled.addAndGet(m.diskBytesSpilled)
      peakExecMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val amplify = if (args.length > 1) args(1).toInt else 32
    val giantWords = if (args.length > 2) args(2).toInt else 1000000
    val cpus = if (args.length > 3) args(3) else "8"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-spill-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val listener = new SpillListener
    spark.sparkContext.addSparkListener(listener)

    val giantId = 99999999L
    val dir = s"/tmp/graft-spillprobe-x$amplify-g$giantWords"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/documents.parquet/_SUCCESS"))) {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select($"doc_id", $"text", $"lang")
      val rep = base.crossJoin(spark.range(amplify).toDF("r"))
        .select(($"doc_id" + $"r" * 10000000L).as("doc_id"),
          $"text", $"r".cast("int").as("r0"), $"lang")
        .as[(Long, String, Int, String)]
        .map { case (id, text, r, lang) =>
          val t = if (r == 0) text else text.split(' ').map(w => s"${w}x$r").mkString(" ")
          (id, t, lang)
        }
        .toDF("doc_id", "text", "lang")
      // the giant document: unique words, one aggregation key at reassembly
      val giant = spark.range(1).select(lit(giantId).as("doc_id"),
        expr(s"array_join(transform(sequence(0, ${giantWords - 1}), " +
          "i -> concat('gw', i)), ' ')").as("text"),
        lit("en").as("lang"))
      rep.union(giant).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()

    def run(q: String): (Long, Double, Long) = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // giant-doc row must survive intact (kept tokens == its word count:
      // unique words → nothing deduped away)
      val keptCol = if (q == "d_paragraph") "n_paras_kept" else "n_kept"
      val kept = df.where(col("doc_id") === giantId)
        .select(col(keptCol)).as[Long].head()
      (rows, sec, kept)
    }

    val (pRows, pSec, pKept) = run("d_paragraph")
    val (nRows, nSec, nKept) = run("d_ngram_spans")
    val expParas = (giantWords + 9) / 10
    require(pRows == nDocs && nRows == nDocs, s"row drift: $pRows/$nRows vs $nDocs")
    require(pKept == expParas, s"giant doc paragraphs: $pKept vs $expParas")
    require(nKept == giantWords, s"giant doc tokens: $nKept vs $giantWords")
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(
      s"""{"metric":"dedup_reassembly_spill","docs":$nDocs,""" +
        s""""giant_words":$giantWords,"heap_mb":$heapMb,""" +
        s""""d_paragraph_sec":${"%.2f".format(pSec)},""" +
        s""""d_ngram_spans_sec":${"%.2f".format(nSec)},""" +
        s""""memory_spilled_bytes":${listener.memSpilled.get},""" +
        s""""disk_spilled_bytes":${listener.diskSpilled.get},""" +
        s""""peak_exec_memory_bytes":${listener.peakExecMem.get},""" +
        s""""spilled":${listener.diskSpilled.get > 0}}""")
    spark.stop()
  }
}
