package graft.sources

/** Test bridge to the package-private WARC parser/serializer. */
object WarcTestAccess {
  def parse(bytes: Array[Byte]): Seq[Warc.WarcDoc] = Warc.parseChunk(bytes).toSeq
  def record(url: String, tsMs: Long, lang: String, html: Array[Byte]): Array[Byte] =
    Warc.recordBytes(url, tsMs, lang, html)
  def parseGz(gz: Array[Byte]): Seq[Warc.WarcDoc] = {
    val r = new Warc.GzipMemberReader(new java.io.ByteArrayInputStream(gz))
    try r.flatMap(Warc.parseChunk(_)).toSeq finally r.close()
  }
  /** stream members from an InputStream (the reader's scale path) */
  def memberReader(in: java.io.InputStream): Iterator[Array[Byte]] with AutoCloseable =
    new Warc.GzipMemberReader(in)
  /** observe every inflated member size the reader materializes */
  def withMemberProbe[A](probe: Int => Unit)(f: => A): A = {
    val old = Warc.memberSizeProbe
    Warc.memberSizeProbe = probe
    try f finally Warc.memberSizeProbe = old
  }
  /** parse with the html column pruned (the pushdown scan path) */
  def parseNoHtml(bytes: Array[Byte]): Seq[Warc.WarcDoc] =
    Warc.parseChunk(bytes, wantHtml = false).toSeq
  /** observe the (possibly pruned) schema each streaming reader factory
    * gets — asserts required-column pushdown actually reached the source
    */
  def withReadSchemaProbe[A](probe: org.apache.spark.sql.types.StructType => Unit)
                            (f: => A): A = {
    val old = WarcStreamSource.readSchemaProbe
    WarcStreamSource.readSchemaProbe = probe
    try f finally WarcStreamSource.readSchemaProbe = old
  }
  /** streaming-offset codec (watermark, count; count -1 = legacy) */
  def parseOffset(json: String): (String, Int) = {
    val o = WarcOffset.parse(json)
    (o.watermark, o.n)
  }
  def offsetJson(watermark: String, n: Int): String = WarcOffset(watermark, n).json()
}
