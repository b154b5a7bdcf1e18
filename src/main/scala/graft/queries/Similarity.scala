package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embedding column: brute-force cosine top-k
  * (the exact baseline, with a DuckDB oracle) and an IVF-style
  * coarse-quantized variant (the 10^12-scale path: probe only the nearest
  * centroid cells instead of scanning everything; recall asserted against
  * the brute-force baseline in QueriesSpec, no SQL oracle since the probe
  * set is a recall/latency trade).
  */
object Similarity {

  // spread: parallelize the scoring map stages off the single-row-group
  // testdata file (util.Scans — scale-adaptive, no-op at 100 TB)
  private[graft] def emb(s: SparkSession, dir: String): DataFrame =
    graft.util.Scans.spread(
      s.read.parquet(s"$dir/embeddings.parquet"), col("vec_id"))
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
      .withColumn("nrm", expr("sqrt(aggregate(e, 0d, (a, x) -> a + x * x))"))

  private val dotExpr = expr("aggregate(zip_with(qe, e, (x, y) -> x * y), 0d, (a, x) -> a + x)")

  /** Map-side nearest-centroid assignment: the codebook is a literal
    * array column (tiny — one struct per cell), and the argmax over it is
    * an inline higher-order expression. Zero shuffles — at 10^12 rows this
    * is the only shape that survives (a Window.partitionBy(vec_id) +
    * row_number argmax shuffles the full corpus once per Lloyd iteration
    * for a per-row argmax over 8 broadcast centroids). Row norm is
    * constant across cells, so cosine argmax = (dot/cn) argmax; strict `>`
    * with cells iterated in ascending order keeps the lowest cell on ties
    * (same tie-break as ORDER BY score DESC, cell ASC).
    */
  private[graft] def nearestCell(corpus: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    // Typed map instead of the higher-order aggregate/zip_with argmax
    // expression: Catalyst lambda functions are INTERPRETED per row (no
    // whole-stage codegen inside them), so every assignment pass paid
    // allocation + closure dispatch per (cell, dim). The tight primitive
    // loop below runs the SAME arithmetic in the SAME order — dims
    // ascending dot product, dot/cn score, strict `>` argmax over cells
    // ascending (lowest cell wins ties) — so assignments are
    // bit-identical; still map-side only, zero exchanges.
    val s = corpus.sparkSession
    import s.implicits._
    val sorted = cents.sortBy(_._1)
    val cellIds = sorted.map(_._1).toArray
    val ce = sorted.map(_._2.toArray).toArray
    val cn = ce.map(v => math.sqrt(v.map(x => x * x).sum))
    corpus.select(col("vec_id"), col("e")).as[(Long, Seq[Double])]
      .map { case (id, e) =>
        val ea = e.toArray
        var best = -1
        var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < ce.length) {
          val cv = ce(c)
          val n = math.min(ea.length, cv.length)
          var dot = 0.0
          var d = 0
          while (d < n) { dot += ea(d) * cv(d); d += 1 }
          val score = dot / cn(c)
          if (score > bestScore) { best = cellIds(c); bestScore = score }
          c += 1
        }
        (id, best, e)
      }
      .toDF("vec_id", "cell", "e")
  }

  /** Final top-k ranking via the bounded TopKAggregator: every map
    * partition pre-reduces to at most k rows per qid (partial typed
    * aggregation), so the per-qid reducer receives k·partitions rows
    * instead of every scored corpus row. The Window.partitionBy(qid) +
    * row_number form it replaces lands ALL candidates of one query on one
    * reducer — the per-query bottleneck at 10^12 corpus rows.
    */
  private def topK(s: SparkSession, scored: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    scored.select(col("qid"), col("vec_id"), col("cos_r"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.functions.TopKAggregator(k).toColumn.name("top"))
      .toDF("qid", "top")
      .select(col("qid"), posexplode(col("top")))
      .toDF("qid", "pos", "t")
      .select(col("qid"), (col("pos") + 1).as("rnk"),
        col("t._1").as("nid"), col("t._2").as("cos_r"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** top-k cosine neighbors for each query vector (vec_id < 10) */
  def bruteforce(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val all = emb(s, dir)
    val q = all.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    // broadcast the tiny query side; the big side streams map-side (no
    // shuffle of the corpus — this is the shape that survives 100 TB)
    val scored = all.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos_r", round(dotExpr / (col("qn") * col("nrm")), 3))
    topK(s, scored, k)
  }

  /** IVF-style ANN: a k-means-lite codebook (deterministic init = lowest
    * vec_ids, a few Lloyd iterations with centroids collected to the
    * driver — the codebook is tiny and broadcast, assignments stay
    * distributed), then queries probe only the `nprobe` nearest cells.
    * At 10^12 scale the cells DataFrame is the persisted index; the scan
    * prunes to probed cells instead of touching the whole corpus.
    */
  def ivf(s: SparkSession, dir: String, k: Int = 5,
          cells: Int = 8, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    import s.implicits._
    // CacheScope instead of cache+unpersist-before-probe: the final
    // probe action previously re-scanned and re-normed the corpus twice
    // (the `all` side and the `cellOf` side) because the cache was
    // dropped before the lazy probe plan ever ran; CacheScope keeps it
    // hot through the caller's action and releases at the harness query
    // boundary — the bounded-memory discipline is unchanged.
    val all = graft.util.CacheScope.cached(emb(s, dir)).toDF()
    val cents = train(s, all, cells, iters)
    val centDf = broadcast(cents.toDF("cell", "ce")
      .withColumn("cn", expr("sqrt(aggregate(ce, 0d, (a, x) -> a + x * x))")))
    val cellOf = nearestCell(all, cents).select(col("vec_id"), col("cell"))
    // scan ONLY the probed cells (join on cell prunes the corpus)
    probeAndScore(all, centDf, cellOf, k, nprobe)
  }

  /** Lloyd training shared by ivf() and buildIndex(): deterministic
    * lowest-vec_id seeds; each round = map-side nearest-cell assignment
    * (zero shuffles) + centroid recompute via the typed vector-mean
    * aggregator — one (sum-vector, count) partial per (partition, cell)
    * crosses the wire, instead of posexploding n×dim rows.
    */
  private def train(s: SparkSession, all: DataFrame,
                    cells: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    import s.implicits._
    var cents: Seq[(Int, Seq[Double])] = all.orderBy(col("vec_id")).limit(cells)
      .select(col("e")).collect().toSeq
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0)) }
    for (_ <- 1 to iters) {
      cents = nearestCell(all, cents)
        .select(col("cell"), col("e")).as[(Int, Seq[Double])]
        .groupByKey(_._1)
        .agg(graft.functions.VecMeanAggregator.toColumn.name("ce"))
        .collect().toSeq.sortBy(_._1)
    }
    cents
  }

  /** Persisted-index lifecycle (what a 10^12-row deployment actually
    * runs): `buildIndex` trains the codebook and writes the index —
    * `centroids` (tiny) + `cells` (vec_id → cell, the partition-pruned
    * scan key) — as parquet; `queryIndex` answers top-k probes from the
    * stored index with NO k-means work (index rows reused, not rebuilt —
    * same lifecycle split as d_incremental's LSH index).
    */
  def buildIndex(s: SparkSession, dir: String, indexDir: String,
                 cells: Int = 8, iters: Int = 3): Unit = {
    import s.implicits._
    val all = emb(s, dir).cache()
    val cents = train(s, all, cells, iters)
    cents.toDF("cell", "ce").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
    nearestCell(all, cents).select(col("vec_id"), col("cell"))
      .write.mode("overwrite").parquet(s"$indexDir/cells")
    all.unpersist()
  }

  /** top-k cosine ANN from a stored index: probes the `nprobe` nearest
    * cells only; the corpus join on `cell` prunes the scan. Zero k-means
    * jobs at query time.
    */
  def queryIndex(s: SparkSession, dir: String, indexDir: String,
                 k: Int = 5, nprobe: Int = 4): DataFrame = {
    import s.implicits._
    val cents = s.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    val centDf = broadcast(cents.toDF("cell", "ce")
      .withColumn("cn", expr("sqrt(aggregate(ce, 0d, (a, x) -> a + x * x))")))
    val cellOf = s.read.parquet(s"$indexDir/cells")
    probeAndScore(emb(s, dir), centDf, cellOf, k, nprobe)
  }

  /** probe the nprobe nearest cells per query vector, then exact-score
    * only the corpus rows living in probed cells
    */
  private def probeAndScore(all: DataFrame, centDf: DataFrame,
                            cellOf: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val q = all.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    // probe ranking: per-qid rows here = #cells (index METADATA, tiny by
    // construction — the codebook is a broadcast literal), so a window is
    // safe; the corpus-sized ranking below uses the bounded aggregator
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cell"))
    val probes = q.crossJoin(centDf)
      .withColumn("ccos",
        expr("aggregate(zip_with(qe, ce, (x, y) -> x * y), 0d, (a, x) -> a + x)") /
          (col("qn") * col("cn")))
      .withColumn("prnk", row_number().over(wq))
      .where(col("prnk") <= nprobe)
      .select(col("qid"), col("qe"), col("qn"), col("cell"))
    val scored = all.join(cellOf, Seq("vec_id")).join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos_r", round(dotExpr / (col("qn") * col("nrm")), 3))
    topK(all.sparkSession, scored, k)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_ann_bruteforce" -> ((s, dir) => bruteforce(s, dir)),
    "s_ann_ivf" -> ((s, dir) => ivf(s, dir)))

  val oracles: Map[String, String] = Map(
    "s_ann_bruteforce" ->
      """WITH ex AS (
        |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) v
        |  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)),
        |n AS (SELECT vec_id, sqrt(sum(v*v)) nrm FROM ex GROUP BY 1),
        |qx AS (SELECT vec_id qid, i, v FROM ex WHERE vec_id < 10),
        |d AS (
        |  SELECT qid, ex.vec_id nid, sum(qx.v*ex.v) dot
        |  FROM qx JOIN ex ON qx.i = ex.i AND ex.vec_id <> qx.qid
        |  GROUP BY 1,2),
        |c AS (
        |  SELECT qid, nid, round(dot/(qn.nrm*nn.nrm), 3) cos_r
        |  FROM d JOIN n qn ON qid = qn.vec_id JOIN n nn ON nid = nn.vec_id),
        |r AS (
        |  SELECT qid, nid, cos_r,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, nid) rnk
        |  FROM c)
        |SELECT qid, rnk, nid, cos_r FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin)
    // s_ann_ivf: intentionally no SQL oracle (probe-limited recall);
    // QueriesSpec asserts recall >= 0.8 vs s_ann_bruteforce instead.
}
