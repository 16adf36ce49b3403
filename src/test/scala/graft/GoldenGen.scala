package graft

import graft.core.Scrub
import java.nio.file.{Files, Paths}

/** One-shot generator for the dict-mode golden corpus
  * (src/test/resources/golden/dict_goldens.jsonl). Run manually when the
  * dict-scrub CONTRACT deliberately changes:
  *   sbt "Test/runMain graft.GoldenGen"
  * GoldenReplaySpec asserts current behavior matches the committed file, so
  * accidental semantic drift across rounds fails the build.
  */
object GoldenGen {
  def cases: Seq[String] = {
    val battery = {
      val in = getClass.getResourceAsStream("/golden/ref_vectors.json")
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      in.close()
      (0 until root.get("battery").size).map(root.get("battery").get(_).asText)
    }
    val corpus = (0L until 120L).map(graft.spark.DataGen.pageFor(_).text)
    battery ++ corpus
  }

  private def esc(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val out = new StringBuilder
    cases.zipWithIndex.foreach { case (text, i) =>
      val d = Scrub.scrubDict(text)
      val aliases = d.aliases.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${esc(k)}:${esc(v)}" }.mkString("{", ",", "}")
      val counts = d.counts.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${esc(k)}:$v" }.mkString("{", ",", "}")
      out.append(s"""{"case":$i,"text":${esc(text)},"scrubbed":${esc(d.scrubbed)},"aliases":$aliases,"counts":$counts}""")
        .append('\n')
    }
    val path = Paths.get("src/test/resources/golden/dict_goldens.jsonl")
    Files.createDirectories(path.getParent)
    Files.writeString(path, out.toString)
    println(s"wrote ${cases.size} goldens to $path")
  }
}
