package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Checkpointed per-partition lineage + snapshot-style atomic commit
  * (op L1, SURVEY.md §4.2): the Iceberg-snapshot stand-in (no iceberg jar
  * ships offline — the seam is documented; a real Iceberg catalog replaces
  * the manifest file with a table commit).
  *
  * Commit protocol:
  *   1. results are written `partitionBy("pid")` with dynamic partition
  *      overwrite (idempotent per pid — rerunning an uncommitted pid
  *      replaces, never duplicates);
  *   2. lineage rows (pid, offset=snapshot, rows, bytes, digest) are
  *      appended under `_lineage/data`;
  *   3. the manifest (committed pid set + snapshot counter) is rewritten
  *      via temp file + atomic rename — a crash anywhere before (3) leaves
  *      the previous manifest intact and the interrupted pids uncommitted.
  *
  * Resume = anti-filter on the committed pid set: any rerun processes
  * exactly the complement, at partition granularity (north_star). This is
  * the semantic heir of the reference's reconnect-and-replay loop
  * (/root/reference/src/kafka_consumer.py:101-130): restart-ability
  * without reprocessing acknowledged work.
  */
object Lineage {

  private def manifestPath(outputDir: String): Path = Paths.get(outputDir, "_lineage", "manifest.json")

  /** (snapshot counter, committed pids) — (0, empty) when no manifest. */
  def readManifest(outputDir: String): (Long, Set[Int]) = {
    val p = manifestPath(outputDir)
    if (!Files.exists(p)) return (0L, Set.empty)
    val s = new String(Files.readAllBytes(p), "UTF-8")
    // minimal parser for our own writer's format:
    // {"snapshot":N,"committed_pids":[1,2,3]}
    val snap = "\"snapshot\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
    val pids = "\\[([0-9,\\s]*)\\]".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSet
    (snap, pids)
  }

  def committedPids(outputDir: String): Set[Int] = readManifest(outputDir)._2

  /** Single-writer enforcement: the commit protocol (dynamic partition
    * overwrite + manifest rename) is crash-safe but NOT multi-writer-safe
    * — two concurrent jobs on one output dir could each union a stale
    * committed-pid set and lose the other's pids. The lock file is
    * created atomically (`Files.createFile` throws if present), so an
    * accidental double-submit fails fast instead of corrupting lineage.
    * A crashed run leaves the lock behind; `takeover = true` (CLI
    * `--takeover true`) deletes it first — safe because every step of an
    * interrupted run is idempotent (per-pid overwrite, snapshot-keyed
    * lineage dirs, atomic manifest).
    */
  def acquireWriterLock(outputDir: String, takeover: Boolean): Path = {
    val dir = Paths.get(outputDir, "_lineage")
    Files.createDirectories(dir)
    val lock = dir.resolve("writer.lock")
    if (takeover) Files.deleteIfExists(lock)
    // owner token written into the lock: release only deletes OUR lock,
    // so a takeover that races a still-live writer cannot be followed by
    // that writer's finally-block freeing the new owner's lock. (The
    // takeover-against-a-live-writer hazard itself is inherent to
    // advisory file locks — takeover is for verified-dead runs.)
    val token = s"${java.util.UUID.randomUUID()} pid=${ProcessHandle.current().pid()} " +
      s"acquired=${java.time.Instant.now()}"
    try Files.write(lock, token.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val holder = try new String(Files.readAllBytes(lock), "UTF-8") catch { case _: Exception => "?" }
        throw new IllegalStateException(
          s"another writer holds $lock [$holder] (or a previous run crashed) — " +
            "rerun with --takeover true to steal the lock")
    }
    lockTokens.put(lock, token)
    lock
  }

  private val lockTokens = new java.util.concurrent.ConcurrentHashMap[Path, String]()

  def releaseWriterLock(lock: Path): Unit = {
    val token = lockTokens.remove(lock)
    val mine = token != null && Files.exists(lock) &&
      (try new String(Files.readAllBytes(lock), "UTF-8") == token
       catch { case _: Exception => false })
    if (mine) Files.deleteIfExists(lock)
  }

  /** Write the snapshot's lineage rows and atomically publish the new
    * manifest. Rows go to a SNAPSHOT-KEYED subdirectory (`data/offset=N`,
    * overwrite): a crash between the data write and the manifest rename
    * leaves an orphan directory that (a) readers never see — table()/
    * tableAt() bound reads by the COMMITTED snapshot — and (b) the retry
    * overwrites in place, so no duplicate rows can ever accumulate.
    */
  def commit(spark: SparkSession, outputDir: String, lineage: DataFrame): Unit = {
    // guard against the pre-snapshot layout (flat parquet with an offset
    // COLUMN directly under data/): mixing it with offset=N partition
    // dirs breaks Spark's partition discovery at read time — fail the
    // commit with a clear message instead
    val dataDir = Paths.get(outputDir, "_lineage", "data")
    if (Files.isDirectory(dataDir)) {
      val legacy = Files.list(dataDir)
      try {
        val it = legacy.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
            throw new IllegalStateException(
              s"legacy flat lineage layout detected at $dataDir ($p); " +
                "move existing files into data/offset=<n>/ subdirectories before resuming")
        }
      } finally legacy.close()
    }
    val (snap, already) = readManifest(outputDir)
    val newSnap = snap + 1
    val stamped = lineage.select("partition_id", "rows", "bytes", "digest")
    stamped.write.mode(SaveMode.Overwrite)
      .parquet(s"$outputDir/_lineage/data/offset=$newSnap")
    // collect the committed pids from the WRITTEN snapshot, not by
    // re-executing the caller's plan: one execution, and the manifest can
    // never diverge from the rows actually on disk (a non-deterministic
    // input plan re-run could commit pids that were never written)
    val pids = spark.read.parquet(s"$outputDir/_lineage/data/offset=$newSnap")
      .select("partition_id").collect().map(_.getInt(0)).toSet
    val all = (already ++ pids).toSeq.sorted
    val json = s"""{"snapshot":$newSnap,"committed_pids":[${all.mkString(",")}]}"""
    val dir = Paths.get(outputDir, "_lineage")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"manifest.tmp.$newSnap")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, manifestPath(outputDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The lineage table as a DataFrame (latest snapshot per pid). */
  def table(spark: SparkSession, outputDir: String): DataFrame =
    tableAt(spark, outputDir, Long.MaxValue)

  /** Snapshot time travel (the Iceberg-snapshot analog): lineage as of
    * snapshot `snap` — latest row per pid with offset <= snap. Reads are
    * bounded by the committed manifest snapshot, so orphan data from a
    * crashed commit is invisible (only manifest-referenced snapshots
    * exist to readers). The `offset` column is the partition directory —
    * Spark prunes un-read snapshots at the file listing.
    */
  def tableAt(spark: SparkSession, outputDir: String, snap: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val (committedSnap, _) = readManifest(outputDir)
    val bound = math.min(snap, committedSnap)
    val raw = spark.read.parquet(s"$outputDir/_lineage/data")
      .where(col("offset") <= bound)
    val w = Window.partitionBy(col("partition_id")).orderBy(col("offset").desc)
    raw.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }
}
