package graft

import graft.core.RefAlias
import java.nio.file.{Files, Paths}

/** One-shot generator for the alias word-list deviation fixture
  * (src/test/resources/golden/alias_wordlists.json). The reference aliases
  * email/name/address through Faker ja_JP locale data, which is not
  * portable (SURVEY §7.4); this repo substitutes its own embedded word
  * lists. This fixture PINS both the lists and sample alias outputs so the
  * deviation cannot drift silently — AliasWordlistSpec fails the build on
  * any change. Run manually ONLY when the lists deliberately change:
  *   sbt "Test/runMain graft.AliasWordlistGen"
  */
object AliasWordlistGen {
  // Conf-default key/ns (the same pair every golden uses)
  val KeyB64: String = graft.spark.Pipeline.Conf().keyB64
  val Ns: String = graft.spark.Pipeline.Conf().ns

  /** (kind, orig) probes spanning each Faker-backed branch. */
  val Probes: Seq[(String, String)] = Seq(
    "email" -> "tanaka@example.jp", "email" -> "yuki.sato+dev@mail.example",
    "email" -> "a@b.co",
    "name" -> "田中太郎", "name" -> "佐藤 花子", "name" -> "やまだはなこ",
    "address" -> "東京都中央区1-2-3", "address" -> "大阪府北区4-5",
    "address" -> "〒123-4567 福岡県栄町")

  private def esc(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder("{\n")
    sb.append(s"""  "key_b64": ${esc(KeyB64)},\n  "ns": ${esc(Ns)},\n""")
    sb.append("  \"word_lists\": {\n")
    sb.append(RefAlias.wordLists.toSeq.sortBy(_._1).map { case (k, vs) =>
      s"""    ${esc(k)}: [${vs.map(esc).mkString(", ")}]"""
    }.mkString(",\n"))
    sb.append("\n  },\n  \"vectors\": [\n")
    sb.append(Probes.map { case (kind, orig) =>
      val a = RefAlias.alias(kind, orig, KeyB64, Ns)
      s"""    {"kind": ${esc(kind)}, "orig": ${esc(orig)}, "alias": ${esc(a)}}"""
    }.mkString(",\n"))
    sb.append("\n  ]\n}\n")
    val path = Paths.get("src/test/resources/golden/alias_wordlists.json")
    Files.writeString(path, sb.toString)
    println(s"wrote $path (${Probes.size} vectors)")
  }
}
