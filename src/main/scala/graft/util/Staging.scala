package graft.util

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Keyed on-disk staging for derived artifacts (WARC chunk exports, the
  * Bloom exact-dedup index, the LSH band index): each artifact lives at
  * `/tmp/graft-<prefix>-v<version>-p<pathkey>-<key>-<basename>` where
  * `pathkey` fingerprints the corpus dir's absolute PATH (stable for a
  * corpus across regenerations — the sweep scope) and `key` is a CONTENT
  * fingerprint of the corpus (path + size + mtime of every parquet
  * file). Regenerating a corpus — or two different corpora sharing a
  * basename — therefore can never silently reuse a stale artifact: the
  * key changes and the artifact rebuilds.
  *
  * Concurrency: `build` runs in a PRIVATE temp dir and is published with
  * one atomic rename, so two JVMs resolving the same missing artifact
  * (the driver's cold run racing the test suite) can never interleave
  * writes inside the keyed dir — the loser of the rename race discards
  * its copy, which is byte-equal anyway since builders are
  * deterministic. A crashed builder leaves only a hidden temp dir that
  * the next build's janitor removes once it is an hour old (age-gated so
  * a LIVE concurrent build is never swept mid-write).
  *
  * On (re)build, stale sibling artifacts of the same prefix + corpus
  * PATH (not merely basename — `a/sf0.1` and `b/sf0.1` must coexist)
  * are deleted, so version/key churn cannot accumulate dead staging
  * dirs across rounds.
  */
object Staging {

  /** Content fingerprint of a corpus dir: md5 over the absolute path and
    * the (relative path, size, mtime) of every parquet data file under
    * it. Metadata-only (no data read) — cheap at any corpus size with a
    * sane file count, and any regeneration bumps mtime.
    */
  def corpusKey(dir: String): String = {
    val root = Paths.get(dir).toAbsolutePath.normalize
    val sb = new StringBuilder(root.toString)
    if (Files.isDirectory(root)) {
      val st = Files.walk(root, 3)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
          .map(p => (root.relativize(p).toString, Files.size(p),
            Files.getLastModifiedTime(p).toMillis))
          .toSeq.sortBy(_._1)
          .foreach { case (rel, sz, mt) => sb.append('|').append(rel)
            .append(':').append(sz).append(':').append(mt) }
      } finally st.close()
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }

  /** Path-only fingerprint — stable across corpus regenerations, so it
    * scopes the stale sweep to THIS corpus dir.
    */
  private[util] def pathKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(Paths.get(dir).toAbsolutePath.normalize.toString.getBytes("UTF-8"))
      .take(3).map(b => f"$b%02x").mkString

  /** Resolve (and build if absent) the keyed artifact for `corpusDir`.
    * `complete(path)` decides whether an existing dir already holds a
    * finished artifact; if not, stale siblings for the same
    * (prefix, corpus path) are deleted and `build(tempPath)` runs,
    * followed by an atomic publish to the keyed name. Reuse across JVMs
    * is the point: the driver's cold/warm/correctness runs and the test
    * suite all resolve to the same dir and build once.
    */
  def keyedArtifact(prefix: String, corpusDir: String, version: Int)
                   (complete: Path => Boolean)(build: String => Unit): String = {
    val base = Paths.get(corpusDir).getFileName.toString
    val pk = pathKey(corpusDir)
    val name = s"graft-$prefix-v$version-p$pk-${corpusKey(corpusDir)}-$base"
    val path = Paths.get("/tmp", name)
    if (!complete(path)) {
      sweepStale(prefix, pk, base, keep = name)
      // hidden temp (never matches the sweep or any reader glob), unique
      // per attempt so concurrent builders cannot collide
      val tmp = Paths.get("/tmp",
        s".$name.build-${ProcessHandle.current.pid}-${System.nanoTime()}")
      try {
        build(tmp.toString)
        publish(tmp, path, complete)
      } finally deleteRec(tmp) // no-op when published; cleans a failed build
    }
    path.toString
  }

  /** Atomic publish: rename the built temp dir into the keyed name. When
    * the rename loses a race to a concurrent builder that already
    * published a COMPLETE artifact, our (byte-equal) copy is discarded;
    * an incomplete squatter (a dir from a crashed pre-atomic build) is
    * replaced.
    */
  private def publish(tmp: Path, dest: Path, complete: Path => Boolean): Unit =
    try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileSystemException =>
        if (complete(dest)) deleteRec(tmp)
        else {
          deleteRec(dest)
          try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.FileSystemException if complete(dest) =>
              deleteRec(tmp) // second race loss, winner is complete — fine
            case _: java.nio.file.FileSystemException =>
              throw new IllegalStateException(
                s"cannot publish staged artifact $dest", e)
          }
        }
    }

  private val PathSeg = "-p([0-9a-f]{6})-".r

  /** Delete stale sibling artifacts of the same `prefix` + corpus: dirs
    * `/tmp/graft-<prefix>-*-<base>` whose path segment matches `pk`
    * (older versions/keys of THIS corpus — the key they were built for
    * no longer resolves) or that predate the path-scoped name format
    * (unreadable now). Same-basename artifacts of a DIFFERENT corpus
    * path carry a different `p` segment and are left alone. Also
    * removes hidden `.graft-…build-…` temp dirs older than an hour
    * (crashed builders) — age-gated so live concurrent builds survive.
    */
  private[util] def sweepStale(prefix: String, pk: String, base: String,
                               keep: String): Unit = {
    val tmp = Paths.get("/tmp")
    val cutoff = System.currentTimeMillis() - 60 * 60 * 1000L
    val st = Files.list(tmp)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(p => Files.isDirectory(p))
        .filter { p =>
          val n = p.getFileName.toString
          val staleKeyed =
            n.startsWith(s"graft-$prefix-") && n.endsWith(s"-$base") &&
              n != keep &&
              (PathSeg.findFirstMatchIn(n) match {
                case Some(m) => m.group(1) == pk // this corpus, older key
                case None => true // legacy (pre-pathkey) format
              })
          val crashedTemp =
            n.startsWith(s".graft-$prefix-") && n.contains(".build-") &&
              newestMtime(p) < cutoff
          staleKeyed || crashedTemp
        }
        .toSeq.foreach(deleteRec)
    } finally st.close()
  }

  /** Newest mtime anywhere in the tree (Long.MaxValue on IO error — err
    * on "alive"). A long build writes only into SUBdirectories, which
    * never bumps the root's mtime — judging liveness by the root alone
    * would sweep a live >1h build mid-write.
    */
  private def newestMtime(d: Path): Long =
    try {
      val s = Files.walk(d, 4)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .map(p => try Files.getLastModifiedTime(p).toMillis
            catch { case _: java.io.IOException => Long.MaxValue })
          .foldLeft(0L)(math.max)
      } finally s.close()
    } catch { case _: java.io.IOException => Long.MaxValue }

  /** best-effort recursive delete */
  def deleteRec(d: Path): Unit =
    if (Files.exists(d)) {
      val s = Files.walk(d)
      // concurrent sweeps race: walk/forEach surface NoSuchFile as
      // UncheckedIOException (a RuntimeException), not IOException —
      // best-effort means neither may escape
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      catch {
        case _: java.io.IOException => ()
        case _: java.io.UncheckedIOException => ()
      }
      finally s.close()
    }
}
