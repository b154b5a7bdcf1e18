package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameterized curation gates — the RefinedWeb URL filter and the C4
  * line-level filters as OPERATORS a user calls with their own rule
  * tables, not fixture-bound demos. (The `x_url_filter` / `t_c4_filters`
  * queries are now instantiations of these APIs against frozen fixture
  * rules, keeping their hand-derived oracles.)
  *
  * Scale shape: rule sets are small by definition (a blocklist is KBs to
  * MBs even for the full UT1 list), so both gates evaluate MAP-SIDE —
  * the host table joins as a broadcast hash join and the substring word
  * list rides in as a one-row broadcast array (the same pattern
  * c_decontaminate uses for eval grams and c_sample for stats): the page
  * corpus itself never shuffles, and the gates compose into any pipeline
  * position without a stage break.
  *
  * Reference seam: the reference validates/filters each payload before
  * OCR (/root/reference/src/ocr_engine.py:31-44 rejects by content
  * check); these gates are the corpus-scale form of that per-record
  * accept/reject decision.
  */
object Gates {

  /** URL gate (RefinedWeb-style): adds a `verdict` column —
    * `blocked_domain` when the url's host appears in `blockedHosts`
    * (column `host`, exact match), else `blocked_word` when the url
    * contains any entry of `blockedWords` (column `word`, substring
    * match), else `ok`. All other input columns pass through unchanged;
    * one output row per input row regardless of how many words match.
    */
  def urlFilter(pages: DataFrame, blockedHosts: DataFrame,
                blockedWords: DataFrame): DataFrame = {
    val hosts = broadcast(
      blockedHosts.select(col("host")).distinct()
        .withColumn("__host_blocked", lit(1)))
    // one-row array: substring rules can't key a hash join; exists() over
    // the broadcast list keeps row cardinality exact (a join on LIKE
    // would duplicate pages matching several words)
    val words = broadcast(
      blockedWords.select(col("word")).distinct()
        .agg(collect_list(col("word")).as("__blocked_words")))
    pages
      .withColumn("__gate_host", element_at(split(col("url"), "/"), 3))
      .join(hosts, col("__gate_host") === hosts("host"), "left")
      .drop(hosts("host"))
      .crossJoin(words) // 1 broadcast row — no shuffle, no amplification
      .withColumn("verdict",
        when(col("__host_blocked").isNotNull, lit("blocked_domain"))
          .when(exists(col("__blocked_words"),
            w => col("url").contains(w)), lit("blocked_word"))
          .otherwise(lit("ok")))
      .drop("__gate_host", "__host_blocked", "__blocked_words")
  }

  /** C4 line-filter rules (Raffel et al. 2020 §2.2 semantics): a line
    * survives when it ends in terminal punctuation (when required), has
    * at least `minWordsPerLine` whitespace words, and contains no
    * `badLineWords` entry; a document containing any `killDocPhrases`
    * entry is dropped whole; a surviving document needs at least
    * `minKeptLines` kept lines.
    */
  final case class C4Rules(minWordsPerLine: Int = 3,
                           requireTerminalPunct: Boolean = true,
                           badLineWords: Seq[String] = Seq("javascript"),
                           killDocPhrases: Seq[String] = Seq("lorem ipsum"),
                           minKeptLines: Int = 3)

  /** Apply `rules` to a corpus carrying a `lines: array<string>` column.
    * Adds (n_lines, n_kept, doc_keep, kept_text); other columns pass
    * through. Pure map-side array ops — nothing shuffles.
    */
  def c4Filter(docs: DataFrame, rules: C4Rules): DataFrame = {
    val bad = array(rules.badLineWords.map(lit): _*)
    val kill = array(rules.killDocPhrases.map(lit): _*)
    def lineKeep(l: Column): Column = {
      val punctOk =
        if (rules.requireTerminalPunct) l.like("%.") else lit(true)
      punctOk && size(split(l, " ")) >= rules.minWordsPerLine &&
        !exists(bad, w => l.contains(w))
    }
    val killed = exists(col("lines"), l => exists(kill, p => l.contains(p)))
    val kept = filter(col("lines"), lineKeep(_))
    docs
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("n_kept",
        when(killed, lit(0L)).otherwise(size(kept).cast("long")))
      .withColumn("doc_keep", !killed && size(kept) >= rules.minKeptLines)
      .withColumn("kept_text",
        when(killed, lit("")).otherwise(array_join(kept, "\n")))
  }
}
