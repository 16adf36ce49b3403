package graft.core

/** MT19937 with CPython's `random.Random` seeding and draw protocol.
  *
  * The reference seeds `random.Random(s)` from an HMAC-derived unsigned 64-bit
  * int and draws `randint`/`choice` to format aliases (app/alias.py:10-19).
  * Byte-identical aliases therefore require CPython's exact generator:
  * Mersenne-Twister `init_by_array` over the seed's 32-bit little-endian words
  * (CPython Modules/_randommodule.c `random_seed`), `getrandbits(k)` as
  * `genrand_uint32() >> (32-k)`, and rejection sampling `_randbelow`.
  *
  * MT19937 itself is the public Matsumoto–Nishimura algorithm; the seeding and
  * draw protocol follow CPython's documented behavior, pinned by golden vectors
  * (ref_vectors.json `mt_vectors`).
  *
  * Not thread-safe; create one per use (they are cheap relative to regex work).
  */
final class PyRandom private () {
  private val N = 624
  private val mt = new Array[Int](N)
  private var mti = N + 1

  private def initGenrand(s: Int): Unit = {
    mt(0) = s
    var i = 1
    while (i < N) {
      mt(i) = (1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i)
      i += 1
    }
    mti = N
  }

  private def initByArray(key: Array[Int]): Unit = {
    initGenrand(19650218)
    var i = 1; var j = 0
    var k = math.max(N, key.length)
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1664525)) + key(j) + j
      i += 1; j += 1
      if (i >= N) { mt(0) = mt(N - 1); i = 1 }
      if (j >= key.length) j = 0
      k -= 1
    }
    k = N - 1
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1566083941)) - i
      i += 1
      if (i >= N) { mt(0) = mt(N - 1); i = 1 }
      k -= 1
    }
    mt(0) = 0x80000000
  }

  private def genrandInt32(): Int = {
    if (mti >= N) {
      var i = 0
      while (i < N) {
        val y = (mt(i) & 0x80000000) | (mt((i + 1) % N) & 0x7fffffff)
        mt(i) = mt((i + 397) % N) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        i += 1
      }
      mti = 0
    }
    var y = mt(mti); mti += 1
    y ^= y >>> 11
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= y >>> 18
    y
  }

  /** CPython getrandbits for 0 < k <= 32. */
  def getrandbits(k: Int): Long = {
    require(k > 0 && k <= 32, s"getrandbits($k) unsupported")
    (genrandInt32().toLong & 0xffffffffL) >>> (32 - k)
  }

  /** CPython Random._randbelow_with_getrandbits. */
  def randbelow(n: Long): Long = {
    require(n > 0)
    val k = 64 - java.lang.Long.numberOfLeadingZeros(n)
    var r = getrandbitsWide(k)
    while (r >= n) r = getrandbitsWide(k)
    r
  }

  /** getrandbits for k up to 63 (CPython composes 32-bit words little-endian). */
  private def getrandbitsWide(k: Int): Long =
    if (k <= 32) getrandbits(k)
    else {
      val lo = getrandbits(32)
      val hi = getrandbits(k - 32)
      lo | (hi << 32)
    }

  /** CPython randint(a, b) == randrange(a, b+1). */
  def randint(a: Long, b: Long): Long = a + randbelow(b + 1 - a)

  /** CPython choice(seq). */
  def choice[T](seq: IndexedSeq[T]): T = seq(randbelow(seq.length.toLong).toInt)
}

object PyRandom {
  /** CPython `random.Random(n)` for an unsigned 64-bit n (Long bit pattern).
    * The key array is n's 32-bit words little-endian with leading zero words
    * dropped ([0] when n == 0), matching `random_seed`'s use of
    * `_PyLong_AsByteArray` on the absolute value. */
  def apply(unsignedSeed: Long): PyRandom = {
    val r = new PyRandom
    val lo = (unsignedSeed & 0xffffffffL).toInt
    val hi = (unsignedSeed >>> 32).toInt
    val key =
      if (unsignedSeed == 0L) Array(0)
      else if (hi == 0) Array(lo)
      else Array(lo, hi)
    r.initByArray(key)
    r
  }
}
