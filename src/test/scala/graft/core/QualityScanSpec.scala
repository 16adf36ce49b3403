package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The single-scan Quality.metrics must agree with the naive
  * tokenize-then-count implementation on everything that matters. */
class QualityScanSpec extends AnyFunSuite {

  private def close(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-12

  private def assertSame(text: String): Unit = {
    val fast = Quality.metrics(text)
    val slow = Quality.metricsNaive(text)
    assert(fast.nChars == slow.nChars, s"nChars: ${text.take(50)}")
    assert(fast.nWords == slow.nWords, s"nWords: ${text.take(50)}")
    assert(close(fast.meanWordLen, slow.meanWordLen), s"meanWordLen: ${text.take(50)}")
    assert(close(fast.stopwordRatio, slow.stopwordRatio), s"stopwordRatio: ${text.take(50)}")
    assert(close(fast.symbolRatio, slow.symbolRatio), s"symbolRatio: ${text.take(50)}")
    assert(close(fast.dupLineFrac, slow.dupLineFrac), s"dupLineFrac: ${text.take(50)}")
    assert(close(fast.dupWordFrac, slow.dupWordFrac), s"dupWordFrac: ${text.take(50)}")
    assert(close(fast.alphaWordRatio, slow.alphaWordRatio), s"alphaWordRatio: ${text.take(50)}")
    assert(fast.maxWordLen == slow.maxWordLen, s"maxWordLen: ${text.take(50)}")
    assert(close(fast.cjkRatio, slow.cjkRatio), s"cjkRatio: ${text.take(50)}")
  }

  test("scan metrics == naive metrics on hand cases") {
    Seq("", " ", "\n", "a", "the the the", "a b c\na b c\na b c",
      "  leading and trailing  ", "tab\tsep\nlines\n\n", "x\n",
      "山田太郎さんは東京都に住んでいます", "MiXeD CaSe THE The the",
      "¥1,234 !!! @@@ ###", "one-word", "a" * 100,
      "word " * 50 + "\n" + "word " * 50).foreach(assertSame)
  }

  test("scan metrics == naive metrics on generated corpus") {
    (0L until 400L).foreach { id =>
      assertSame(graft.spark.DataGen.pageFor(id).text)
    }
  }

  test("scan metrics == naive metrics property (random ASCII + unicode)") {
    val gen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\n', '\t', '.', ',', '!', '¥', '@'),
      1 -> Gen.oneOf('山', '田', 'の', 'ア', '中', '文'),
      1 -> Gen.const('e')
    )).map(_.mkString)
    (0 until 500).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(1 + i % 200), Seed(i.toLong))
        .foreach(assertSame)
    }
  }
}
