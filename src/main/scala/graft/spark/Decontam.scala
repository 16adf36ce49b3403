package graft.spark

import graft.core.TextDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the eval-leakage pass of a training-data
  * pipeline (GPT-3/Llama-style): mark corpus documents that share any word
  * k-shingle (k = 13 by convention) with a benchmark/eval set.
  *
  * Scale shape: the benchmark side is tiny (eval sets are MBs), so its
  * distinct shingle hashes are collected under an explicit `maxShingles`
  * bound (throws, never truncates) and shipped to executors as ONE sorted
  * primitive `Array[Long]` broadcast — membership is a binary search with
  * zero boxing. The corpus side is a single narrow scan: no shuffle, no
  * join, no corpus-sized state; 100 TB streams through map tasks that each
  * hold the benchmark array once.
  *
  * Shingle semantics are [[TextDedup.shingles]] (whitespace tokens,
  * lowercase; a document shorter than k tokens contributes its whole text
  * as one shingle) hashed with [[TextDedup.hash64]] — the same primitives
  * the dedup operators use, so the CPython twin reuses its proven ports.
  */
object Decontam {

  /** Distinct shingle hashes of one document. */
  def shingleHashes(text: String, k: Int): Array[Long] =
    TextDedup.shingles(text, k).map(TextDedup.hash64).distinct

  /** Distinct benchmark shingle hashes, sorted for binary search. The
    * collect is benchmark-sized; `maxShingles` makes the bound explicit. */
  def benchmarkHashes(bench: DataFrame, textCol: String, k: Int,
                      maxShingles: Int = 50000000): Array[Long] = {
    import bench.sparkSession.implicits._
    // cap the transfer BEFORE collecting: at most maxShingles+1 rows reach
    // the driver, so the bound fires as an exception, not an OOM
    val hs = bench.select(col(textCol).cast("string")).as[String]
      .flatMap(t => if (t == null) Iterator.empty[Long]
                    else shingleHashes(t, k).iterator)
      .distinct().limit(maxShingles + 1).collect()
    require(hs.length <= maxShingles,
      s"benchmark exceeds maxShingles=$maxShingles distinct shingles — " +
        "raise the bound (hashes are driver-collected and broadcast)")
    java.util.Arrays.sort(hs)
    hs
  }

  /** Per-document contamination relation: (idCol, n_hits13, contaminated)
    * where n_hits13 counts the document's DISTINCT shingles found in the
    * benchmark. One narrow pass over the corpus. */
  def mark(docs: DataFrame, idCol: String, textCol: String,
           benchHashes: Array[Long], k: Int): DataFrame = {
    val b = docs.sparkSession.sparkContext.broadcast(benchHashes)
    val hitsUdf = udf { t: String =>
      if (t == null) 0L
      else {
        val sorted = b.value
        var n = 0L
        shingleHashes(t, k).foreach { h =>
          if (java.util.Arrays.binarySearch(sorted, h) >= 0) n += 1
        }
        n
      }
    }
    docs.select(col(idCol), hitsUdf(col(textCol)).as("n_hits13"))
      .withColumn("contaminated", col("n_hits13") > 0)
  }

  /** End-to-end: benchmark hashes → broadcast → mark. */
  def run(docs: DataFrame, idCol: String, textCol: String,
          bench: DataFrame, benchTextCol: String, k: Int = 13): DataFrame =
    mark(docs, idCol, textCol,
      benchmarkHashes(bench, benchTextCol, k), k)

  /** Leakage ATTRIBUTION — the inverse report of [[mark]]: for each
    * BENCHMARK document, how many corpus documents share at least one
    * k-shingle with it (the "which eval doc leaked, and how widely"
    * question a decontam run has to answer before anyone re-splits or
    * re-crawls).
    *
    * Scale shape: the benchmark side (eval-set-sized) is collected as a
    * (benchId, distinct shingle hashes) relation under `maxShingles`,
    * inverted into one broadcast of sorted hashes + aligned owner-id
    * lists; the corpus side stays ONE narrow scan emitting each matched
    * bench id at most once per corpus doc, and the only shuffle is the
    * benchmark-sized count aggregation. Benchmark docs with zero leaks
    * appear with n_docs = 0 (an outer join against the tiny bench side).
    */
  def report(docs: DataFrame, textCol: String,
             bench: DataFrame, benchIdCol: String, benchTextCol: String,
             k: Int = 13, maxShingles: Int = 50000000): DataFrame = {
    import docs.sparkSession.implicits._
    // The bench id is cast to long for the broadcast inversion; a string
    // id column would cast to null and collapse every benchmark doc into
    // one null key — a silently wrong attribution report. Fail fast.
    bench.schema(benchIdCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case other => throw new IllegalArgumentException(
        s"Decontam.report requires a numeric benchmark id; '$benchIdCol' " +
          s"is $other — derive one first (e.g. xxhash64 of the native key)")
    }
    val benchRows = bench
      .select(col(benchIdCol).cast("long"), col(benchTextCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        if (t == null) Iterator.empty
        else shingleHashes(t, k).iterator.map(h => (h, id))
      }
      .distinct().limit(maxShingles + 1).collect()
    require(benchRows.length <= maxShingles,
      s"benchmark exceeds maxShingles=$maxShingles distinct (hash, id) " +
        "pairs — raise the bound (the relation is driver-collected)")
    // invert: sorted hash array + aligned owner lists (a hash can belong
    // to several benchmark docs)
    val byHash = benchRows.groupBy(_._1)
    val hashes = byHash.keys.toArray
    java.util.Arrays.sort(hashes)
    val owners: Array[Array[Long]] =
      hashes.map(h => byHash(h).map(_._2).distinct.sorted)
    // ~8 B per hash + ~8 B per stored owner entry (the owner arrays
    // DOMINATE on dup-heavy benchmarks and must be in the estimate); past
    // ~100 MB the executor broadcast is big enough to warn about
    val approxBytes =
      hashes.length.toLong * 8L + owners.iterator.map(_.length.toLong).sum * 8L
    if (approxBytes > 100L * 1024 * 1024)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Decontam.report broadcast ~${approxBytes / (1024 * 1024)} MB " +
          s"(${hashes.length} hashes / ${benchRows.length} pairs) — " +
          "consider lowering maxShingles or sharding the benchmark")
    val b = docs.sparkSession.sparkContext.broadcast((hashes, owners))
    val hitBench = docs.select(col(textCol).cast("string")).as[String]
      .flatMap { t =>
        if (t == null) Iterator.empty
        else {
          val (hs, own) = b.value
          // each matched bench id once per corpus doc
          val seen = scala.collection.mutable.SortedSet.empty[Long]
          shingleHashes(t, k).foreach { h =>
            val i = java.util.Arrays.binarySearch(hs, h)
            if (i >= 0) own(i).foreach(seen += _)
          }
          seen.iterator
        }
      }
      .toDF("bench_id")
      .groupBy(col("bench_id")).agg(count(lit(1)).as("n_docs"))
    bench.select(col(benchIdCol).cast("long").as("bench_id"))
      .join(hitBench, Seq("bench_id"), "left")
      .select(col("bench_id"), coalesce(col("n_docs"), lit(0L)).as("n_docs"))
  }
}
