package graft.spark

import graft.core.TextDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed deduplication operators for a training-data pipeline.
  *
  * Scale notes (the whole point of each design):
  *  - exact dedup is a hash-aggregate on a 128-bit digest — one shuffle of
  *    (digest, id), never of document text;
  *  - MinHash-LSH shuffles (bandKey, id, signature): band keys fan each doc
  *    out `bands` times but candidate pairs are verified WITHOUT a second
  *    pass over text (signature similarity), so the join is narrow;
  *  - SimHash uses the pigeonhole split of the 64-bit hash into 4 chunks —
  *    any pair within hamming distance 3 shares ≥1 exact chunk, so the
  *    candidate join is an equi-join (shuffle-friendly), then a cheap XOR
  *    popcount filter;
  *  - the exact shingle-join Jaccard is the small-scale oracle twin of LSH
  *    (quadratic in the worst case — only for verification tiers).
  */
object Dedup {

  /** Representative per identical text: min(id) per md5(text). Returns
    * (id, n_copies) for every KEPT representative. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("digest")

  /** MinHash signatures frame: (id, sig). */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 5, numHashes: Int = 128): DataFrame =
    df.select(
      col(idCol),
      PiiFunctions.minHashUdf(col(textCol), lit(shingleK), lit(numHashes)).as("sig"))

  /** LSH candidate pairs with estimated Jaccard ≥ threshold.
    * Output: (a, b, sim) with a < b. */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 5, numHashes: Int = 128, bands: Int = 32,
                 threshold: Double = 0.8): DataFrame = {
    val sigs = minHashSignatures(df, idCol, textCol, shingleK, numHashes)
    val banded = sigs.select(
      col(idCol).as("id"), col("sig"),
      explode(PiiFunctions.bandKeysUdf(col("sig"), lit(bands))).as("band"))
    val l = banded.select(col("band"), col("id").as("a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("id").as("b"), col("sig").as("sig_b"))
    l.join(r, Seq("band"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        PiiFunctions.sigSimUdf(col("sig_a"), col("sig_b")).as("sim"))
      .where(col("sim") >= threshold)
      .groupBy(col("a"), col("b")).agg(max("sim").as("sim"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist (≤ 3 guaranteed
    * complete via the 4-chunk pigeonhole; larger maxDist would need more
    * chunks). Output: (a, b, dist) with a < b. */
  def simHashDups(df: DataFrame, idCol: String, textCol: String,
                  maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk pigeonhole is complete only to distance 3")
    val hashed = df.select(col(idCol).as("id"),
      PiiFunctions.simHashUdf(col(textCol)).as("sh"))
    val chunked = hashed.select(col("id"), col("sh"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("ci"),
          shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL)).as("cv"))): _*)).as("c"))
      .select(col("id"), col("sh"), col("c.ci"), col("c.cv"))
    val l = chunked.select(col("ci"), col("cv"), col("id").as("a"), col("sh").as("sh_a"))
    val r = chunked.select(col("ci"), col("cv"), col("id").as("b"), col("sh").as("sh_b"))
    l.join(r, Seq("ci", "cv"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("dist"))
      .where(col("dist") <= maxDist)
      .groupBy(col("a"), col("b")).agg(min("dist").as("dist"))
  }

  /** Exact n-gram Jaccard pairs via shingle equi-join (verification tier).
    * Output: (a, b, inter, union_n, sim_milli) with a < b — integer columns
    * so an SQL oracle reproduces it bit-for-bit. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, minSimMilli: Int = 500): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(array_distinct(PiiFunctions.shinglesUdf(col(textCol), lit(shingleK)))).as("s"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"), col("x.s") === col("y.s"))
      .where(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("union_n"),
        floor(lit(1000) * col("inter") / (col("na") + col("nb") - col("inter"))).as("sim_milli"))
      .where(col("sim_milli") >= minSimMilli)
  }

  /** Embedding cosine near-dup pairs on integer-quantized vectors (exact,
    * order-independent integer dot → oracle-reproducible). */
  def embeddingNearDups(df: DataFrame, idCol: String, embCol: String,
                        minDotQ: Long): DataFrame = {
    val q = df.select(col(idCol).as("id"), col(embCol).as("e"))
    q.as("x").join(q.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        Ann.dotQuantized(col("x.e"), col("y.e")).as("dot_q"))
      .where(col("dot_q") >= minDotQ)
  }
}
