package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Gopher repetition metrics: hand-computed cases pin the definitions
  * (top-n-gram char fraction, duplicated-n-gram coverage with overlap
  * counted once, ties to the lexicographically smallest gram). */
class GopherRepetitionSpec extends AnyFunSuite {
  import GopherRepetition._

  private def toks(s: String) = Quality.tokens(s)

  test("top-2-gram fraction: repeated bigram dominates") {
    // "a b a b c": bigrams (a b)x2, (b a)x1, (b c)x1 → best (a b) count 2,
    // covering positions 0-3 of 5 chars → floor(1000*4/5) = 800
    assert(topNgramCharFracMilli(toks("a b a b c"), 2) == 800L)
  }

  test("top-n-gram coverage is bounded: overlaps count chars once") {
    // "a a a a": (a a) occurs 3 times overlapping, covers all 4 positions
    // exactly once → 1000, never >1000
    assert(topNgramCharFracMilli(toks("a a a a"), 2) == 1000L)
  }

  test("top n-gram measured even when it occurs once (no ≥2 floor)") {
    // all bigrams occur once → tie breaks to the lexicographically smallest
    // ("one two"), covering 6 of 15 token chars → floor(6000/15) = 400.
    // Gopher §A1.1 has no repetition floor; dup-coverage (below) does.
    assert(topNgramCharFracMilli(toks("one two three four"), 2) == 400L)
    assert(dupNgramCharFracMilli(toks("one two three four five"), 5) == 0L)
  }

  test("ties break to the lexicographically smallest gram") {
    // "x y x y a b a b": (x y)x2 and (a b)x2 tie; (a b) < (x y); both have
    // gram chars 2, total 8 → floor(1000*4/8) = 500 either way, so tie-break
    // is pinned via a case with different gram lengths:
    // "zz w zz w a b a b": (zz w)x2 (3 chars) vs (a b)x2 (2 chars) tie on
    // count → (a b) wins lexicographically → floor(1000*4/10) = 400
    assert(topNgramCharFracMilli(toks("zz w zz w a b a b"), 2) == 400L)
  }

  test("duplicated-n-gram coverage counts overlapping chars once") {
    // "a a a a": trigrams (a a a)x2 → covers all 4 positions once → 1000
    assert(dupNgramCharFracMilli(toks("a a a a"), 3) == 1000L)
    // "a b c a b c x": 3-grams (a b c)x2 cover positions 0-2 and 3-5 of 7
    // → marked 6 chars of 7 → floor(6000/7) = 857
    assert(dupNgramCharFracMilli(toks("a b c a b c x"), 3) == 857L)
  }

  test("empty and shorter-than-n inputs are 0") {
    assert(topNgramCharFracMilli(Array.empty[String], 2) == 0L)
    assert(dupNgramCharFracMilli(toks("only two"), 5) == 0L)
  }
}
