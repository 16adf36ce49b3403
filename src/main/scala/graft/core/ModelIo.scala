package graft.core

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Binary (de)serialization for the model artifacts shipped in resources —
  * the "broadcast-shared model binaries" of the north-star: langid and
  * perplexity models are TRAINED offline (GenModels), committed as binary
  * artifacts, and LOADED at runtime; executors receive bytes via broadcast
  * and decode once. The format is trivially readable outside the JVM
  * (big-endian, length-prefixed UTF-8), which is what lets the CPython
  * oracle twin score with the SAME model the engine uses.
  */
object ModelIo {

  // ---- langid: [int32 nLangs][lang: int32 len + utf8]...[int32 nGrams]
  //      [int64 keys...][float64 logProbs (nGrams×nLangs row-major)]
  //      [float64 defaults (nLangs)]
  def writeLangId(m: LangIdModel): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.langs.length)
    m.langs.foreach { l =>
      val b = l.getBytes(UTF_8); out.writeInt(b.length); out.write(b)
    }
    out.writeInt(m.gramKeys.length)
    m.gramKeys.foreach(out.writeLong)
    m.gramLogProbs.foreach(out.writeDouble)
    m.defaultLogProb.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  def readLangId(in: InputStream): LangIdModel = {
    val d = new DataInputStream(new java.io.BufferedInputStream(in))
    val nl = d.readInt()
    val langs = Vector.fill(nl) {
      val b = new Array[Byte](d.readInt()); d.readFully(b); new String(b, UTF_8)
    }
    val ng = d.readInt()
    val keys = Array.fill(ng)(d.readLong())
    val probs = Array.fill(ng * nl)(d.readDouble())
    val dflt = Array.fill(nl)(d.readDouble())
    d.close()
    LangIdModel(langs, keys, probs, dflt)
  }

  // ---- perplexity: [int32 A][float32 logProb (A^3)]
  def writePpl(m: PerplexityModel): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Perplexity.A)
    m.logProbArray.foreach(out.writeFloat)
    out.flush()
    bos.toByteArray
  }

  def readPpl(in: InputStream): PerplexityModel = {
    val d = new DataInputStream(new java.io.BufferedInputStream(in))
    val a = d.readInt()
    require(a == Perplexity.A, s"alphabet mismatch: $a")
    val lp = Array.fill(a * a * a)(d.readFloat())
    d.close()
    new PerplexityModel(lp)
  }

  def resource(path: String): InputStream = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"model artifact missing from resources: $path")
    in
  }
}
