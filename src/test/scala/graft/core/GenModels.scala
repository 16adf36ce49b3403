package graft.core

import java.nio.file.{Files, Paths}

/** Writes the committed model artifacts (src/main/resources/graft/):
  * langid.bin + ppl_{en,es,de,fr}.lm — trained deterministically from the
  * embedded seed corpora, serialized via [[ModelIo]]. Run deliberately
  * (`sbt "Test/runMain graft.core.GenModels"`) after changing a seed
  * corpus or trainer, then regenerate the pinned oracles.
  */
object GenModels {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/main/resources/graft")
    Files.createDirectories(dir)
    Files.write(dir.resolve("langid.bin"),
      ModelIo.writeLangId(LangId.trainDefault))
    val bank = Perplexity.trainBank
    bank.foreach { case (lang, m) =>
      Files.write(dir.resolve(s"ppl_$lang.lm"), ModelIo.writePpl(m))
    }
    println(s"wrote langid.bin + ${bank.keys.toSeq.sorted.mkString(",")} LMs under $dir")
  }
}
