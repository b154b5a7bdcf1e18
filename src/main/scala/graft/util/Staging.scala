package graft.util

import java.nio.file.{Files, Path, Paths}

/** Keyed on-disk staging for derived artifacts (WARC chunk exports, the
  * Bloom exact-dedup index, the LSH band index): each artifact lives at
  * `/tmp/graft-<prefix>-v<version>-<key>-<basename>` where `key` is a
  * CONTENT fingerprint of the source corpus dir (path + size + mtime of
  * every parquet file). Regenerating a corpus — or two different corpora
  * sharing a basename — therefore can never silently reuse a stale
  * artifact: the key changes and the artifact rebuilds. On (re)build,
  * stale sibling artifacts of the same prefix+corpus are deleted, so
  * version/key churn cannot accumulate dead staging dirs across rounds.
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

  /** Resolve (and build if absent) the keyed artifact for `corpusDir`.
    * `complete(path)` decides whether an existing dir already holds a
    * finished artifact; if not, stale siblings for the same
    * (prefix, corpus basename) are deleted and `build(path)` runs.
    * Reuse across JVMs is the point: the driver's cold/warm/correctness
    * runs and the test suite all resolve to the same dir and build once.
    */
  def keyedArtifact(prefix: String, corpusDir: String, version: Int)
                   (complete: Path => Boolean)(build: String => Unit): String = {
    val base = Paths.get(corpusDir).getFileName.toString
    val name = s"graft-$prefix-v$version-${corpusKey(corpusDir)}-$base"
    val path = Paths.get("/tmp", name)
    if (!complete(path)) {
      sweepStale(prefix, base, keep = name)
      build(path.toString)
    }
    path.toString
  }

  /** Delete every `/tmp/graft-<prefix>-*-<base>` dir except `keep` —
    * artifacts of older corpus versions/keys that will never be read
    * again (the key they were built for no longer resolves).
    */
  private[util] def sweepStale(prefix: String, base: String, keep: String): Unit = {
    val tmp = Paths.get("/tmp")
    val st = Files.list(tmp)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(p => Files.isDirectory(p))
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith(s"graft-$prefix-") && n.endsWith(s"-$base") && n != keep
        }
        .toSeq.foreach(deleteRec)
    } finally st.close()
  }

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
