package graft.core

import scala.collection.mutable

/** Aho-Corasick multi-pattern matcher emitting ALL occurrences of every
  * dictionary entry (overlaps included, via dictionary suffix links).
  *
  * This is the scale-correct core for gazetteer NER: one O(|text|) pass
  * regardless of dictionary size, vs the naive per-entry `indexOf` scan
  * that is O(entries × |text|) — at 10k+ entries and MB-sized documents
  * the difference is 4 orders of magnitude. Built once per executor from
  * the broadcast model bytes; matching allocates only the hit vector.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {

  // an empty pattern would register on the ROOT's output list and emit
  // position-dependent phantom matches — reject it outright
  require(patterns.forall(_.nonEmpty), "empty pattern in dictionary")

  // trie over chars; children as per-node hash maps (dictionary is built
  // once per executor — build cost is irrelevant next to scan cost)
  private val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val out = mutable.ArrayBuffer[List[Int]](Nil)

  patterns.zipWithIndex.foreach { case (p, pi) =>
    var node = 0
    var i = 0
    while (i < p.length) {
      node = children(node).getOrElseUpdate(p.charAt(i), {
        children += mutable.HashMap.empty[Char, Int]
        out += Nil
        children.length - 1
      })
      i += 1
    }
    out(node) ::= pi
  }

  private val fail = new Array[Int](children.length)
  // BFS failure links; output lists absorb the fail target's outputs so a
  // single hop per position yields every pattern ending there
  locally {
    val queue = mutable.Queue.empty[Int]
    children(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        // deepest proper-suffix state with a ch-transition; v is depth ≥ 2
        // here so the target is always strictly shallower than v
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = children(f).getOrElse(ch, 0)
        out(v) = out(v) ++ out(fail(v))
        queue += v
      }
    }
  }

  /** All (patternIndex, endExclusive) matches in `text`. CharSequence so
    * the fused hot path scans its reused decode buffer directly. */
  def findAll(text: CharSequence): Vector[(Int, Int)] = {
    val hits = Vector.newBuilder[(Int, Int)]
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (node != 0 && !children(node).contains(c)) node = fail(node)
      node = children(node).getOrElse(c, 0)
      var o = out(node)
      while (o.nonEmpty) { hits += ((o.head, i + 1)); o = o.tail }
      i += 1
    }
    hits.result()
  }
}
