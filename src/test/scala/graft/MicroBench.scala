package graft

/** Dev-only micro-profile of the per-row core stages (Test/runMain graft.MicroBench). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val texts = (0L until 20000L).map(graft.spark.DataGen.pageFor(_).text).toArray
    def time(name: String)(f: String => Any): Unit = {
      // warmup
      texts.take(5000).foreach(f)
      val t0 = System.nanoTime()
      texts.foreach(f)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-14s ${sec}%.3f s  (${texts.length / sec}%.0f docs/s/core)")
    }
    val lang = graft.core.LangId.default
    val ppl = graft.core.Perplexity.default
    time("langid")(lang.classify)
    time("perplexity")(ppl.perplexity)
    time("quality")(graft.core.Quality.metrics)
    time("scrubDict")(graft.core.Scrub.scrubDict(_))
    time("detectAll")(graft.core.Detect.detectAll)
    time("minhash")(t => graft.core.TextDedup.minHash(t, 5, 128))
    time("simhash")(graft.core.TextDedup.simHash)
    // toxicity automaton: scan cost must be independent of list size
    // (the whole point of the tier — a regex union is not)
    Seq(100, 10000, 100000).foreach { n =>
      val m = graft.spark.Toxicity.Matcher(graft.spark.Toxicity.syntheticList(n))
      m.countIn(texts(0)) // force automaton build outside the timed loop
      time(s"tox-ac-$n")(m.countIn)
    }
  }
}
