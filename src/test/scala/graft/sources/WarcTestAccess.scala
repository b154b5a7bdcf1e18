package graft.sources

/** Test bridge to the package-private WARC parser/serializer. */
object WarcTestAccess {
  def parse(bytes: Array[Byte]): Seq[Warc.WarcDoc] = Warc.parseChunk(bytes).toSeq
  def record(url: String, tsMs: Long, lang: String, html: Array[Byte]): Array[Byte] =
    Warc.recordBytes(url, tsMs, lang, html)
  def parseGz(gz: Array[Byte]): Seq[Warc.WarcDoc] =
    Warc.parseChunk(Warc.gunzipAll(gz)).toSeq
}
