package graft.spark

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus operators a Common-Crawl training pipeline needs beyond the
  * reference's per-document semantics: corpus-level line dedup (C4's
  * "discard repeated spans" rule, line granularity) and domain-blocklist
  * filtering (UT1-style).
  */
object WebOps {

  /** C4-style line dedup ACROSS the corpus: a line survives only at its
    * first occurrence (ordered by (doc id, line position)); later copies
    * are dropped from their documents. Lines shorter than `minLen` chars
    * are never deduped (boilerplate blanks/short headers would otherwise
    * vanish corpus-wide).
    *
    * Scale shape: lines are exploded and grouped by md5(line) — the
    * shuffle carries (digest, doc_id, line_no), with the map-side partial
    * `min` collapsing a boilerplate line repeated across millions of pages
    * to one candidate per mapper, so a viral footer cannot hot-key a
    * reducer. The survivor join is an equi-join on the digest. Same
    * skew-safe groupBy+join pattern as [[Pipeline.runDeduped]] — a window
    * over the digest would funnel every copy of a hot line through one
    * task. Document reassembly is an ordered collect_list per doc.
    */
  def dedupLinesAcrossCorpus(df: DataFrame, idCol: String, textCol: String,
                             minLen: Int = 10): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
    val eligible = length(col("line")) >= minLen
    val withH = lines.withColumn("h",
      when(eligible, md5(col("line"))).otherwise(lit(null)))
    val firsts = withH.where(col("h").isNotNull)
      .groupBy("h")
      .agg(min(struct(col(idCol).as("id"), col("line_no").as("ln"))).as("first"))
    val reassembled = withH.join(firsts, Seq("h"), "left")
      .where(col("h").isNull ||
        (col("first.id") === col(idCol) && col("first.ln") === col("line_no")))
      .groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
          x => x("line"))).as(textCol))
    // C4 semantics drop LINES, never documents: a doc whose every line was
    // a non-first duplicate survives with empty text instead of vanishing
    // (downstream joins by id must not lose rows)
    df.select(col(idCol)).distinct()
      .join(reassembled, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }

  /** Intra-document repeated-line removal — the TRANSFORM counterpart of
    * the dup-lines quality metric (Gopher repetition handling): within one
    * document, a line (≥ minLen chars) survives only at its first
    * occurrence; short lines are exempt. Purely narrow per document (runs
    * inside the scan stage at any scale). A linear-time primitive UDF, not
    * a higher-order array expression: the array_position form is O(lines²)
    * per document AND interpreted (excluded from codegen) — the same
    * lesson as the ANN signature loops. */
  private val dedupLinesUdf = org.apache.spark.sql.functions.udf {
    (text: String, minLen: Int) =>
      if (text == null) null
      else {
        val seen = new java.util.HashSet[String]()
        text.split("\n", -1).iterator
          .filter(l => l.length < minLen || seen.add(l))
          .mkString("\n")
      }
  }

  def dedupLinesWithinDoc(df: DataFrame, textCol: String,
                          minLen: Int = 10): DataFrame =
    df.withColumn(textCol, dedupLinesUdf(col(textCol), lit(minLen)))

  /** Deterministic stratified sampling — the data-MIXING op of a training
    * pipeline (e.g. "50% of en crawl, all of ja"): a row survives iff a
    * multiplicative hash of its id lands under the stratum's keep rate
    * (per mille). Deterministic and engine-independent (plain integer
    * arithmetic, no RNG state), so reruns/resumes pick the identical
    * sample and an SQL oracle reproduces it exactly; purely narrow — the
    * predicate pushes into the scan. Strata missing from `ratesMilli`
    * default to keep-all. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       ratesMilli: Map[String, Int]): DataFrame = {
    // Lehmer permutation bucket: (id mod p)·48271 mod p is a bijection of
    // [0, p) for prime p = 100003, so strided/sharded id schemes still
    // spread across buckets (a bare affine map mod 1000 would alias every
    // stride-200 scheme), rates resolve at true 1/1000 granularity (bias
    // ≤ 3/100003 from p mod 1000), and the max intermediate is
    // 100002·48271 ≈ 4.8e9 — overflow-safe under ANSI mode for any int64
    // id, and byte-reproducible in plain SQL.
    val bucket = pmod(pmod(pmod(col(idCol), lit(100003L)) * lit(48271L),
      lit(100003L)), lit(1000L))
    val rate = ratesMilli.foldLeft(lit(1000): Column) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(bucket < rate)
  }

  /** Source/host-level reputation (C4/RefinedWeb-style group filtering):
    * aggregate a per-document boolean quality signal to its source and
    * block sources whose keep rate falls below the threshold. Filtering
    * at host granularity catches farms whose individual pages pass
    * per-document rules.
    *
    * Scale shape: ONE hash-agg by source with map-side combine (the
    * shuffle carries one partial row per source per mapper — a
    * million-page host cannot hot-key a reducer); keep-rate in exact
    * milli units (floor(1000.0·keeps/n), IEEE-exact, SQL-oracle-able).
    */
  def sourceReputation(df: DataFrame, sourceCol: String, keepCol: String,
                       minKeepRateMilli: Long = 500L): DataFrame =
    df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(keepCol).cast("long")).as("n_keep"))
      .select(col("source"), col("n_docs"),
        floor(lit(1000.0) * col("n_keep") / col("n_docs"))
          .cast("long").as("keep_rate_milli"))
      .withColumn("blocked", col("keep_rate_milli") < minKeepRateMilli)

  /** Host of a url (scheme-independent). */
  def hostOf(url: Column): Column = Pipeline.hostCol(url)

  /** Canonical form of a crawl URL — the key URL-level dedup joins on
    * (two fetches of the same page routinely differ only in tracking
    * params, fragment, host case, or a default port):
    *  - fragment stripped;
    *  - scheme and host:port lowercased;
    *  - default port dropped (`:80` for http, `:443` for https);
    *  - `utm_*`, `gclid`, `fbclid` query params removed (param order is
    *    otherwise PRESERVED — sorting would conflate `?a=1&b=2` pages
    *    whose servers treat order as meaningful);
    *  - a bare `/` path with no query collapses to the empty path.
    *
    * Built from native string expressions only (regexp + split/filter/
    * array_join — all inside whole-stage codegen, no UDF), and every step
    * has an exact DuckDB equivalent, so the driver oracle reproduces it
    * verbatim (`q_url_canon`). */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort0 = lower(regexp_extract(rest, "^([^/?]+)", 1))
    val hostPort = when(scheme === "http", regexp_replace(hostPort0, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort0, ":443$", ""))
      .otherwise(hostPort0)
    val after = regexp_replace(rest, "^[^/?]+", "") // path[?query]
    val path = regexp_extract(after, "^([^?]*)", 1)
    val query = regexp_extract(after, "\\?(.*)$", 1)
    val kept = array_join(
      filter(split(query, "&"),
        p => !p.rlike("^(utm_[^=]*|gclid|fbclid)=")), "&")
    val canonPath = when(path === "/" && kept === "", "").otherwise(path)
    concat(scheme, lit("://"), hostPort, canonPath,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Token-budget sharding — assign every document to a training shard so
    * each shard holds ≈`budget` tokens in id order (the sample-packing /
    * shard-manifest step before tokenized training data is written):
    * shard(doc) = floor(prefix_tokens_before(doc) / budget).
    *
    * Scale shape: an exact global prefix sum WITHOUT a global sort —
    * a single `SUM(...) OVER (ORDER BY id)` window funnels the whole
    * corpus through ONE reducer. Instead: range-repartition by id, sort
    * within partitions, ONE tiny job collects the per-partition totals
    * (numPartitions rows), their prefix sums broadcast as offsets, and a
    * second narrow pass emits each doc's shard from its partition offset +
    * running sum. Two passes over the (id, n) projection — never the
    * text — and the only driver state is one Long per partition. Output
    * is independent of the range boundaries the sampler picks: offsets
    * are computed in id-range order, so every layout yields the identical
    * prefix sum.
    */
  def tokenShards(df: DataFrame, idCol: String, nTokensCol: String,
                  budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // The id is cast to long for the range partitioner; a non-numeric id
    // column (url-keyed corpora) would cast every row to null and silently
    // return an EMPTY sharding. Fail fast instead.
    df.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case other => throw new IllegalArgumentException(
        s"tokenShards requires a numeric id column; '$idCol' is $other — " +
          "derive one first (e.g. xxhash64(url))")
    }
    val spark = df.sparkSession
    import spark.implicits._
    // ONE RDD object for both passes: Dataset.rdd builds a fresh physical
    // graph per call, and two graphs mean two RangePartitioners whose
    // sampled boundaries need not agree — offsets from pass 1 would then
    // be wrong for pass 2. A single RDD fixes the partitioner (rangeBounds
    // are computed once per RDD object), and pass 2 re-reads pass 1's
    // shuffle files (stage skipped), paying only the partition-local
    // re-sort — cheaper than caching the whole (id, n) projection.
    // Null contract: null ids cannot be assigned a shard and are dropped;
    // a null token count reads as 0 (a doc with no tokens consumes no
    // budget) — mirrors the null-safety of the sibling operators.
    val base = df.select(col(idCol).cast("long").as("id"),
        coalesce(col(nTokensCol).cast("long"), lit(0L)).as("n"))
      .where(col("id").isNotNull)
      .repartitionByRange(col("id"))
      .sortWithinPartitions(col("id"))
      .as[(Long, Long)]
      .rdd
    val totals = base
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // offsets(pid) = sum before pid
    val bOff = spark.sparkContext.broadcast(offsets)
    val out = base
      .mapPartitionsWithIndex { (pid, it) =>
        var run = bOff.value(pid)
        it.map { case (id, n) =>
          val shard = run / budget
          run += n
          (id, shard)
        }
      }
      .toDF(idCol, "shard")
    out
  }

  /** Domain-blocklist predicate: true iff the url's host or ANY parent
    * domain is in the broadcast blocklist (so `ads.example.com` is blocked
    * by an `example.com` entry). A UT1-scale list (millions of domains)
    * stays a broadcast hash set — a join would shuffle the corpus by host.
    * The authority is NORMALIZED first (userinfo/port stripped, lowercased):
    * `https://BAD.example:443/` must not bypass a `bad.example` entry. */
  def blockedUdf(list: Broadcast[Set[String]]) =
    org.apache.spark.sql.functions.udf { (host0: String) =>
      if (host0 == null) false
      else {
        var h = host0
        val at = h.lastIndexOf('@')
        if (at >= 0) h = h.substring(at + 1)
        val colon = h.indexOf(':')
        if (colon >= 0) h = h.substring(0, colon)
        h = h.toLowerCase
        var blocked = list.value.contains(h)
        var dot = h.indexOf('.')
        while (!blocked && dot >= 0) {
          h = h.substring(dot + 1)
          blocked = list.value.contains(h)
          dot = h.indexOf('.')
        }
        blocked
      }
    }

  /** Rows whose url does NOT hit the blocklist. */
  def filterBlocked(df: DataFrame, urlCol: String,
                    list: Broadcast[Set[String]]): DataFrame =
    df.where(!blockedUdf(list)(hostOf(col(urlCol))))
}
