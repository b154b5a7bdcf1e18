package graft.tools

import graft.extract._
import graft.html._
import graft.fixtures.PageHtml

/** Dev profiler: per-stage cost of the extraction kernel. */
object StageProf {
  def main(args: Array[String]): Unit = {
    val words = "the quick brown fox jumps over a lazy dog data spark filter join window".split(' ')
    val docs = (0 until 20000).map { i =>
      val n = 40 + i % 120
      val text = Array.tabulate(n)(j => words((i + j * 7) % words.length)).mkString(" ")
      PageHtml.build(i.toLong, text, "en", withPayload = i % 10 == 0).getBytes("UTF-8")
    }.toArray
    def time(tag: String)(f: => Unit): Unit = {
      f; f
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-10s $s%.3fs")
    }
    time("decode") { docs.foreach(Tokenizer.decode) }
    val strs = docs.map(b => Tokenizer.decode(b).get)
    time("tokenize") { strs.foreach(Tokenizer.tokenize) }
    val toks = strs.map(Tokenizer.tokenize)
    time("dom") { toks.foreach(Dom.build) }
    val doms = toks.map(Dom.build)
    time("blocks") { doms.foreach(Blocks.fromDom) }
    val blks = doms.map(Blocks.fromDom)
    time("classify") { blks.foreach(Classifier.extractText(_, "en")) }
    time("spans") { docs.foreach(Spans.extract) }
    time("fusedtok") { toks.foreach(Blocks.fromTokens) } // vs dom+blocks above
    time("fusedall") { strs.foreach(Blocks.fromHtml) }   // vs tokenize+dom+blocks
  }
}
