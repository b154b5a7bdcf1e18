package graft.pipeline

import graft.queries.Curation
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export — the materialized form of the curation pass:
  * quality-filter → exact-dedup → deterministic split/shard assignment,
  * written `partitionBy(split, shard)` so a training run reads exactly
  * its shard partition (partition-pruned scan, no planning-time work
  * proportional to the corpus).
  *
  * Scale shape: one shuffle for the dedup hash (inside the curation
  * plan), one for the doc_id join-back, then `repartition(split, shard)`
  * so each output partition is written by one task — no
  * small-files explosion at high parallelism (without it, every task
  * writes a file into every (split, shard) directory: tasks × 24 files).
  */
object ShardExport {

  /** Curate `documents` in sfDir and write shards under `$outDir/shards`.
    * Returns (docs written, shard partition count).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String): (Long, Long) = {
    val curated = Curation.defs("c_curate")(spark, sfDir) // doc_id, split, shard
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val out = docs.join(curated, Seq("doc_id"))
      .repartition(col("split"), col("shard"))
    out.write.mode(SaveMode.Overwrite)
      .partitionBy("split", "shard")
      .parquet(s"$outDir/shards")
    val written = shards(spark, outDir)
    (written.count(), written.select("split", "shard").distinct().count())
  }

  def shards(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/shards")
}
