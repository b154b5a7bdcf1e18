package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the composition layer a training-data
  * pipeline runs on top of the per-doc analyses: deterministic
  * (salt-keyed, reproducible) dataset splitting, and the full
  * filter → dedup → split → shard curation pass that turns a raw crawl
  * table into training shards. Everything is md5-60bit arithmetic so
  * DuckDB reproduces each assignment bit-for-bit.
  *
  * Scale notes: split/shard assignment is pure map-side expression
  * (zero shuffles); the curation pass shuffles once, on md5(text)
  * (32-byte keys, map-side partial agg) for exact dedup, then projects
  * — the same shape as d_exact_canonical.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** 60-bit md5 fingerprint of a salted key — portable to DuckDB. */
  private def fp60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def splitCol(idCol: Column): Column = {
    val b = pmod(fp60(concat(lit("split:"), idCol.cast("string"))), lit(100L))
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  private def shardCol(idCol: Column): Column =
    pmod(fp60(concat(lit("shard:"), idCol.cast("string"))), lit(8L))

  /** the t_quality keep rule (>=30 words, avg word length < 8) */
  private def qualityOk: Column =
    size(split(col("text"), " ")) >= 30 &&
      (length(col("text")) - size(split(col("text"), " ")) + 1).cast("double") /
        size(split(col("text"), " ")) < 8.0

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // deterministic, reproducible train/val/test assignment: salted
    // 60-bit hash of the stable key → 80/10/10 buckets. Map-side only —
    // the assignment never shuffles, and rerunning (or adding docs)
    // never reassigns an existing doc (the property real pipelines need
    // to keep held-out sets uncontaminated across corpus versions).
    "c_split" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        pmod(fp60(concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
          .as("bucket"),
        splitCol(col("doc_id")).as("split"))
        .orderBy(col("doc_id"))),

    // the composed curation pass: quality filter → exact dedup (keep the
    // canonical doc of each identical-text group) → split + shard
    // assignment. One shuffle total (dedup hash); filters run before it
    // so boilerplate never crosses the wire.
    "c_curate" -> ((s, dir) => {
      val good = docs(s, dir).where(qualityOk)
        .select(col("doc_id"), md5(col("text")).as("th"))
      val canon = good.groupBy(col("th")).agg(min(col("doc_id")).as("doc_id"))
      canon.select(
        col("doc_id"),
        splitCol(col("doc_id")).as("split"),
        shardCol(col("doc_id")).as("shard"))
        .orderBy(col("doc_id"))
    }),

    // shard manifest: docs + bytes per (split, shard) — the balance
    // check a sharded training run does before reading anything
    "c_shard_stats" -> ((s, dir) => {
      val good = docs(s, dir).where(qualityOk)
        .select(col("doc_id"), col("text"), md5(col("text")).as("th"))
      val canon = good.groupBy(col("th"))
        .agg(min(col("doc_id")).as("doc_id"), first(length(col("text"))).as("n_chars"))
      canon.select(splitCol(col("doc_id")).as("split"),
          shardCol(col("doc_id")).as("shard"), col("n_chars"))
        .groupBy(col("split"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"), col("shard"))
    }))

  private val fp60Duck = (k: String) => s"('0x'||substr(md5($k),1,15))::BIGINT"

  private val splitDuck =
    s"CASE WHEN ${fp60Duck("'split:'||doc_id")} % 100 < 80 THEN 'train' " +
      s"WHEN ${fp60Duck("'split:'||doc_id")} % 100 < 90 THEN 'val' ELSE 'test' END"

  private val shardDuck = s"${fp60Duck("'shard:'||doc_id")} % 8"

  private val qualityDuck =
    """len(string_split(text,' ')) >= 30
      |  AND (length(text) - len(string_split(text,' ')) + 1)*1.0
      |      / len(string_split(text,' ')) < 8.0""".stripMargin

  val oracles: Map[String, String] = Map(
    "c_split" ->
      s"""SELECT doc_id,
         |  ${fp60Duck("'split:'||doc_id")} % 100 AS bucket,
         |  $splitDuck AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    "c_curate" ->
      s"""WITH good AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE $qualityDuck),
         |canon AS (
         |  SELECT min(doc_id) AS doc_id FROM good GROUP BY text)
         |SELECT doc_id, $splitDuck AS split,
         |  CAST($shardDuck AS BIGINT) AS shard
         |FROM canon ORDER BY doc_id""".stripMargin,

    "c_shard_stats" ->
      s"""WITH good AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE $qualityDuck),
         |canon AS (
         |  SELECT min(doc_id) AS doc_id, length(min_by(text, doc_id)) AS n_chars
         |  FROM good GROUP BY text)
         |SELECT $splitDuck AS split, CAST($shardDuck AS BIGINT) AS shard,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM canon GROUP BY 1, 2 ORDER BY split, shard""".stripMargin)
}
