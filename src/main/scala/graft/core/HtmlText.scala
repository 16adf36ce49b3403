package graft.core

/** Minimal HTML→text extraction for the pages table.
  *
  * The input_hint invariant is "byte-identical extracted text per url": the
  * `text` column is authoritative and `html` must re-derive it exactly. The
  * corpus generator wraps text in a trivial envelope (FIXTURES.md §1), so
  * extraction is tag-stripping + entity decode for the five XML entities —
  * deliberately small; a production crawl would plug a real extractor in
  * behind the same function and keep the invariant test.
  */
object HtmlText {

  def extract(html: Array[Byte]): String =
    extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def extract(html: String): String = {
    val sb = new java.lang.StringBuilder(html.length)
    var i = 0
    var inTag = false
    while (i < html.length) {
      val c = html.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val ent = if (semi > i && semi - i <= 6) html.substring(i + 1, semi) else null
        ent match {
          case "amp" => sb.append('&'); i = semi
          case "lt" => sb.append('<'); i = semi
          case "gt" => sb.append('>'); i = semi
          case "quot" => sb.append('"'); i = semi
          case "apos" => sb.append('\''); i = semi
          case _ => sb.append(c)
        }
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }
}
