package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup scale-trajectory measurement: amplify the documents table k×
  * with replica-suffixed words (all cross-replica shingles distinct, so
  * the true near-dup pair set stays CONSTANT while the corpus grows —
  * separating index/scan cost growth from output growth), then time the
  * dedup/curation operators at each scale. Near-linear wall growth is
  * the evidence that the band-join shapes hold as the corpus multiplies.
  *
  * Usage: DedupScale [sfDir] [scales csv, default 1,4,16]
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = (if (args.length > 1) args(1) else "1,4,16").split(",").map(_.toInt)
    val queries = Seq("d_exact_canonical", "d_minhash_lsh", "d_simhash_pairs", "c_curate",
      "d_paragraph", "d_bloom_incremental", "d_ngram_spans", "c_decontaminate")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def stage(k: Int): String = {
      val dir = s"/tmp/graft-dedupscale-x$k"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet/_SUCCESS"))) {
        val base = spark.read.parquet(s"$sfDir/documents.parquet")
          .select($"doc_id", $"text", $"lang")
        val rep = base.crossJoin(spark.range(k).toDF("r"))
          .select(($"doc_id" + $"r" * 10000000L).as("doc_id"),
            $"text", $"r".cast("int").as("r0"), $"lang")
          .as[(Long, String, Int, String)]
          .map { case (id, text, r, lang) =>
            // replica 0 keeps original text (original dup pairs intact);
            // replicas r>0 suffix every word → disjoint shingle space
            val t = if (r == 0) text else text.split(' ').map(w => s"${w}x$r").mkString(" ")
            (id, t, lang)
          }
          .toDF("doc_id", "text", "lang")
        rep.repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      dir
    }

    scales.foreach { k =>
      val dir = stage(k)
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      val times = queries.map { q =>
        val fn = graft.SparkEntry.queries(q)
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        f"$q=$sec%.2fs(rows=$rows)"
      }
      println(s"[dedupscale] k=$k docs=$nDocs ${times.mkString(" ")}")
    }
    spark.stop()
  }
}
