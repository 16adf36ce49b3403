package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** HMAC-keyed deterministic seed, a port of `_seed`
  * (reference: app/alias.py:4-7):
  * `HMAC-SHA256(b64decode(key), f"{ns}|{kind}|{orig}") → first 8 bytes,
  * big-endian, as an unsigned 64-bit int`.
  *
  * The returned Long carries the unsigned value's bit pattern (Scala has no
  * uint64); every consumer (PyRandom seeding) treats it as unsigned.
  * Determinism makes downstream aliasing a pure function — Catalyst may cache,
  * reorder, or re-execute it freely.
  */
object AliasKey {

  /** Python `base64.b64decode(validate=False)` discards non-alphabet chars
    * before decoding; replicate so key strings round-trip identically. */
  def b64decodePython(s: String): Array[Byte] = {
    val filtered = s.filter(c =>
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '/' || c == '=')
    java.util.Base64.getDecoder.decode(filtered)
  }

  def seed(keyB64: String, ns: String, kind: String, orig: String): Long = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(b64decodePython(keyB64), "HmacSHA256"))
    val dig = mac.doFinal(s"$ns|$kind|$orig".getBytes(UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i).toLong & 0xff); i += 1 }
    v
  }
}
