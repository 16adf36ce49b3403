package graft

import graft.core.Scrub
import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Replays the committed dict-mode golden corpus: scrubbed text, alias
  * dictionaries and per-kind counts must match byte-for-byte. Regenerate
  * deliberately with `sbt "Test/runMain graft.GoldenGen"`. */
class GoldenReplaySpec extends AnyFunSuite {

  test("dict-mode scrub replays the committed golden corpus exactly") {
    val in = getClass.getResourceAsStream("/golden/dict_goldens.jsonl")
    assume(in != null, "goldens missing — run Test/runMain graft.GoldenGen")
    val mapper = new ObjectMapper()
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    in.close()
    assert(lines.size > 100)
    lines.foreach { line =>
      val n = mapper.readTree(line)
      val d = Scrub.scrubDict(n.get("text").asText)
      assert(d.scrubbed == n.get("scrubbed").asText, s"case ${n.get("case")}")
      val expAliases = n.get("aliases").properties.asScala
        .map(e => e.getKey -> e.getValue.asText).toMap
      assert(d.aliases == expAliases, s"case ${n.get("case")} aliases")
      val expCounts = n.get("counts").properties.asScala
        .map(e => e.getKey -> e.getValue.asLong).toMap
      assert(d.counts == expCounts, s"case ${n.get("case")} counts")
    }
  }
}
