package graft.spark

import graft.core.{Perplexity, Quality}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trained quality classifier — distilled from the heuristic rule cascade
  * (how CCNet/RedPajama-style pipelines bootstrap a cheap learned filter
  * from rule/LLM labels): a class-weighted ridge least-squares separator
  * over the pipeline's own quality signals, labels = `Quality.decide`.
  *
  * Closed form, ONE corpus pass: the per-row work emits exact integer
  * sufficient statistics (the upper triangle of cw·x·xᵀ plus cw·x·y over
  * quantized integer features), aggregated as DECIMAL(38,0) sums — exact
  * and ORDER-INDEPENDENT, so the learned weights do not depend on
  * partitioning (pinned by test) and match the CPython twin bit-for-bit.
  * The 12×12 normal equations are then solved on the driver with
  * partial-pivot Gaussian elimination whose operation order the twin
  * mirrors exactly (doubles are IEEE-deterministic given the same ops).
  *
  * Scale shape: featurization (metrics + perplexity per doc) is the only
  * corpus-sized work — a narrow map pass feeding a 90-cell aggregate with
  * map-side partial sums; nothing per-doc is shuffled or collected. The
  * drop class is up-weighted (integer `dropClassWeight`) because quality
  * filters are imbalanced (~9% drops here) and an unweighted regression
  * collapses to the majority class.
  */
object QualityTrain {

  val FeatureNames: Vector[String] = Vector("bias", "chars", "words",
    "mean_wlen", "stop", "sym", "dup_line", "dup_word", "alpha", "max_wlen",
    "cjk", "ppl")
  val NF: Int = FeatureNames.length

  /** Integer feature vector (milli-scaled ratios, capped counts) + the
    * heuristic keep/drop label. Quantization uses only floor/min/integer
    * division — twin-exact. */
  def featurize(text: String, ppl: Double): (Array[Long], Int) = {
    val m = Quality.metrics(text)
    val y = if (Quality.decide(m, ppl)._1) 1 else 0
    val f = new Array[Long](NF)
    f(0) = 1000L
    f(1) = math.min(m.nChars, 100000L) / 100L
    f(2) = math.min(m.nWords, 20000L) / 20L
    f(3) = math.min(math.floor(m.meanWordLen * 50.0).toLong, 1000L)
    f(4) = math.floor(m.stopwordRatio * 1000.0).toLong
    f(5) = math.floor(m.symbolRatio * 1000.0).toLong
    f(6) = math.floor(m.dupLineFrac * 1000.0).toLong
    f(7) = math.floor(m.dupWordFrac * 1000.0).toLong
    f(8) = math.floor(m.alphaWordRatio * 1000.0).toLong
    f(9) = math.min(m.maxWordLen, 1000L)
    f(10) = math.floor(m.cjkRatio * 1000.0).toLong
    f(11) = math.min(math.floor(ppl).toLong, 1000L)
    (f, y)
  }

  /** Featurized relation: (f array<long>, y int). One corpus pass. */
  def features(docs: DataFrame, textCol: String): DataFrame = {
    val bModel = docs.sparkSession.sparkContext.broadcast(Perplexity.default)
    val featUdf = udf { t: String =>
      val text = if (t == null) "" else t
      featurize(text, bModel.value.perplexity(text))
    }
    docs.select(featUdf(col(textCol)).as("fy"))
      .select(col("fy._1").as("f"), col("fy._2").as("y"))
  }

  /** Native Catalyst mirror of [[featurize]]+[[predictKeep]] for the
    * 12-feature model, over a quality-metrics struct column and a ppl
    * column the pipeline has ALREADY computed — scoring a doc costs a few
    * codegen'd arithmetic ops, no second tokenization pass. Bit-parity
    * with the JVM loop: every quantization is the same IEEE double op
    * (floor/least/long-cast), the dot product multiplies in index order
    * and folds left-associatively exactly like [[predictKeep]], and
    * long→double casts are exact at these magnitudes. Pinned by
    * PipelineSpec against the UDF path and by the q_quality_pipeline
    * CPython twin. */
  def scoreColumn(w: Array[Double], q: Column, ppl: Column): Column = {
    require(w.length == NF,
      s"scoreColumn is the ${NF}-feature fast path, got ${w.length} weights" +
        " — the hashed-n-gram model needs the UDF path (it re-tokenizes)")
    val f: Seq[Column] = Seq(
      lit(1000L),
      floor(least(q("nChars"), lit(100000L)) / lit(100L)).cast("long"),
      floor(least(q("nWords"), lit(20000L)) / lit(20L)).cast("long"),
      least(floor(q("meanWordLen") * lit(50.0)).cast("long"), lit(1000L)),
      floor(q("stopwordRatio") * lit(1000.0)).cast("long"),
      floor(q("symbolRatio") * lit(1000.0)).cast("long"),
      floor(q("dupLineFrac") * lit(1000.0)).cast("long"),
      floor(q("dupWordFrac") * lit(1000.0)).cast("long"),
      floor(q("alphaWordRatio") * lit(1000.0)).cast("long"),
      least(q("maxWordLen"), lit(1000L)),
      floor(q("cjkRatio") * lit(1000.0)).cast("long"),
      least(floor(ppl).cast("long"), lit(1000L)))
    f.zipWithIndex
      .map { case (c, j) => lit(w(j)) * c.cast("double") }
      .reduceLeft(_ + _)
  }

  /** Learned keep decision as a Column (see [[scoreColumn]]). */
  def modelKeepColumn(w: Array[Double], q: Column, ppl: Column): Column =
    scoreColumn(w, q, ppl) >= lit(0.0)

  /** Learned decision: keep iff w·f ≥ 0 (raw integer features; length-
    * generic so the hashed-n-gram weights apply through the same path). */
  def predictKeep(w: Array[Double], f: Array[Long]): Boolean = {
    var z = 0.0
    var j = 0
    while (j < w.length) { z += w(j) * f(j); j += 1 }
    z >= 0.0
  }

  /** Closed-form training. `ridge` must be > 0 (constant feature columns
    * make the unregularized normal matrix singular). */
  def train(docs: DataFrame, textCol: String, dropClassWeight: Long = 5L,
            ridge: Double = 1.0): Array[Double] =
    trainGeneric(features(docs, textCol), NF, dropClassWeight, ridge)

  /** Public face of [[trainGeneric]]: closed-form solve over an ALREADY
    * featurized (f array<long>, y int) relation — lets a caller that needs
    * both the weights AND a corpus-wide apply (e.g. q_quality_apply) share
    * ONE featurize pass (metrics + perplexity per doc is the only
    * corpus-sized cost) instead of re-featurizing per consumer. Identical
    * op order to [[train]], so the weights are bit-identical. */
  def trainFromFeatures(feats: DataFrame, nf: Int = NF,
                        dropClassWeight: Long = 5L,
                        ridge: Double = 1.0): Array[Double] =
    trainGeneric(feats, nf, dropClassWeight, ridge)

  /** [[confusion]] over an ALREADY featurized relation (see
    * [[trainFromFeatures]]): same predictKeep/label math over the same f
    * arrays, so the cross-tab is identical to the re-featurizing form. */
  def confusionFromFeatures(feats: DataFrame, w: Array[Double]): DataFrame = {
    val bw = feats.sparkSession.sparkContext.broadcast(w)
    val predUdf = udf { (f: Seq[Long], y: Int) =>
      (predictKeep(bw.value, f.toArray), y == 1)
    }
    feats.select(predUdf(col("f"), col("y")).as("p"))
      .select(col("p._1").as("pred_keep"), col("p._2").as("heur_keep"))
      .groupBy(col("pred_keep"), col("heur_keep"))
      .agg(count(lit(1)).as("n"))
  }

  /** Generic closed-form solve over a (f array<long>, y int) relation with
    * `nf` features — shared by the 12-feature model and the hashed-n-gram
    * variant; identical op order either way, so both stay twin-exact. */
  private[spark] def trainGeneric(feats: DataFrame, nf: Int,
                                  dropClassWeight: Long,
                                  ridge: Double): Array[Double] = {
    require(ridge > 0.0, "ridge must be > 0 — the normal matrix is " +
      "singular when a feature is constant (e.g. the bias column)")
    val ns = nf * (nf + 1) / 2 + nf // packed upper triangle + b
    val statUdf = udf { (f: Seq[Long], y: Int) =>
      val ty = 2L * y - 1L
      val cw = if (y == 1) 1L else dropClassWeight
      val out = new Array[Long](ns)
      var idx = 0
      var j = 0
      while (j < nf) {
        var k = j
        while (k < nf) { out(idx) = cw * f(j) * f(k); idx += 1; k += 1 }
        j += 1
      }
      j = 0
      while (j < nf) { out(idx) = cw * f(j) * ty; idx += 1; j += 1 }
      out
    }
    // ONE aggregate over the exploded (cell, value) relation rather than
    // `ns` separate sum(element_at(...)) expressions: at nf = 28 that is
    // 434 aggregate expressions, whose generated code dominates the query
    // (measured ~4 s wall / 13 cpu-s at local[32] — plan-bound, not
    // cpu-bound; the explode+groupBy form is ~0.5 s). DECIMAL addition of
    // integers is exact and commutative, so the sums — and the twin-
    // mirrored solve — are bit-identical either way.
    val cells = feats
      .select(posexplode(statUdf(col("f"), col("y"))).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(sum(col("v").cast(DecimalType(38, 0))).as("s"))
      .collect()
    require(cells.nonEmpty, "empty feature relation — nothing to train on")
    val sums = new Array[java.math.BigDecimal](ns)
    cells.foreach(r => sums(r.getInt(0)) = r.getDecimal(1))
    // unpack to doubles with fixed normalization (features are milli-scale);
    // exact integer -> nearest double, same rounding as CPython float(int)
    val a = Array.ofDim[Double](nf, nf)
    var idx = 0
    var j = 0
    while (j < nf) {
      var k = j
      while (k < nf) {
        val v = sums(idx).doubleValue() / 1.0e6
        a(j)(k) = v; a(k)(j) = v
        idx += 1; k += 1
      }
      j += 1
    }
    val b = new Array[Double](nf)
    j = 0
    while (j < nf) {
      b(j) = sums(idx).doubleValue() / 1.0e3
      idx += 1; j += 1
    }
    j = 0
    while (j < nf) { a(j)(j) = a(j)(j) + ridge; j += 1 }
    solveInPlace(a, b)
  }

  /** Partial-pivot Gaussian elimination, operation-for-operation the same
    * loop as the CPython twin (strict `>` pivot compare, row swap, forward
    * eliminate from the pivot column, back-substitute). Mutates its
    * arguments; returns the solution. */
  private[spark] def solveInPlace(m: Array[Array[Double]],
                                  v: Array[Double]): Array[Double] = {
    val n = v.length
    var colI = 0
    while (colI < n) {
      var piv = colI
      var r = colI + 1
      while (r < n) {
        if (math.abs(m(r)(colI)) > math.abs(m(piv)(colI))) piv = r
        r += 1
      }
      val tr = m(colI); m(colI) = m(piv); m(piv) = tr
      val tv = v(colI); v(colI) = v(piv); v(piv) = tv
      val d = m(colI)(colI)
      r = colI + 1
      while (r < n) {
        val fac = m(r)(colI) / d
        var k = colI
        while (k < n) { m(r)(k) = m(r)(k) - fac * m(colI)(k); k += 1 }
        v(r) = v(r) - fac * v(colI)
        r += 1
      }
      colI += 1
    }
    val out = new Array[Double](n)
    var r = n - 1
    while (r >= 0) {
      var s = v(r)
      var k = r + 1
      while (k < n) { s = s - m(r)(k) * out(k); k += 1 }
      out(r) = s / m(r)(r)
      r -= 1
    }
    out
  }

  /** Apply the learned separator corpus-wide and cross-tabulate against
    * the heuristic labels: (pred_keep, heur_keep, n) — the train→apply
    * loop closed in one narrow pass + a 4-row aggregate. Deterministic
    * because the weights are (see [[train]]). */
  def confusion(docs: DataFrame, textCol: String,
                w: Array[Double]): DataFrame = {
    val sc = docs.sparkSession.sparkContext
    val bModel = sc.broadcast(Perplexity.default)
    val bw = sc.broadcast(w)
    val predUdf = udf { t: String =>
      val text = if (t == null) "" else t
      val (f, y) = featurize(text, bModel.value.perplexity(text))
      (predictKeep(bw.value, f), y == 1)
    }
    docs.select(predUdf(col(textCol)).as("p"))
      .select(col("p._1").as("pred_keep"), col("p._2").as("heur_keep"))
      .groupBy(col("pred_keep"), col("heur_keep"))
      .agg(count(lit(1)).as("n"))
  }

  /** Driver-contract face: learned weights as a (feature, w_micro)
    * relation — exact Longs, oracle-comparable. */
  def trainRelation(docs: DataFrame, textCol: String,
                    dropClassWeight: Long = 5L,
                    ridge: Double = 1.0): DataFrame = {
    val w = train(docs, textCol, dropClassWeight, ridge)
    val spark = docs.sparkSession
    import spark.implicits._
    FeatureNames.zip(w.toVector).map { case (name, wj) =>
      (name, math.floor(wj * 1000000.0).toLong)
    }.toDF("feature", "w_micro")
  }

  // ---- hashed token-unigram variant (CCNet fidelity) -----------------------
  // The real CCNet/fastText quality filters score hashed BAG-OF-WORDS
  // features, not only aggregate ratios: specific vocabulary (rare-word
  // salad, symbol soup tokens) separates classes the 12 aggregate signals
  // blur. Buckets stay exact integers — per-bucket token counts milli-
  // normalized by integer division — so the sufficient statistics, the
  // solve and the twin parity story are unchanged.

  final val NgBuckets = 16
  val FeatureNamesNg: Vector[String] =
    FeatureNames ++ (0 until NgBuckets).map(h => s"ng$h")
  val NFNg: Int = FeatureNamesNg.length

  /** [[featurize]] + hashed token-unigram bucket rates: bucket =
    * unsigned(TextDedup.hash64(token)) mod buckets, value =
    * (1000·count)/nTokens (integer division — twin-exact). */
  def featurizeNg(text: String, ppl: Double): (Array[Long], Int) = {
    val (base, y) = featurize(text, ppl)
    val f = java.util.Arrays.copyOf(base, NFNg)
    val toks = Quality.tokens(text)
    if (toks.nonEmpty) {
      val cnt = new Array[Long](NgBuckets)
      toks.foreach { tk =>
        cnt(java.lang.Long.remainderUnsigned(
          graft.core.TextDedup.hash64(tk), NgBuckets).toInt) += 1L
      }
      var h = 0
      while (h < NgBuckets) {
        f(NF + h) = 1000L * cnt(h) / toks.length; h += 1
      }
    }
    (f, y)
  }

  /** Featurized relation with hashed buckets: (f array<long>, y int). */
  def featuresNg(docs: DataFrame, textCol: String): DataFrame = {
    val bModel = docs.sparkSession.sparkContext.broadcast(Perplexity.default)
    val featUdf = udf { t: String =>
      val text = if (t == null) "" else t
      featurizeNg(text, bModel.value.perplexity(text))
    }
    docs.select(featUdf(col(textCol)).as("fy"))
      .select(col("fy._1").as("f"), col("fy._2").as("y"))
  }

  def trainNg(docs: DataFrame, textCol: String, dropClassWeight: Long = 5L,
              ridge: Double = 1.0): Array[Double] =
    trainGeneric(featuresNg(docs, textCol), NFNg, dropClassWeight, ridge)

  def trainRelationNg(docs: DataFrame, textCol: String,
                      dropClassWeight: Long = 5L,
                      ridge: Double = 1.0): DataFrame = {
    val w = trainNg(docs, textCol, dropClassWeight, ridge)
    val spark = docs.sparkSession
    import spark.implicits._
    FeatureNamesNg.zip(w.toVector).map { case (name, wj) =>
      (name, math.floor(wj * 1000000.0).toLong)
    }.toDF("feature", "w_micro")
  }

  /** Held-out agreement rate of a weight vector against the heuristic
    * labels, with `ngFeatures` selecting the featurizer (comparison
    * harness for the 12-feature vs hashed-n-gram models). */
  def accuracy(docs: DataFrame, textCol: String, w: Array[Double],
               ngFeatures: Boolean): Double = {
    val sc = docs.sparkSession.sparkContext
    val bModel = sc.broadcast(Perplexity.default)
    val bw = sc.broadcast(w)
    val agreeUdf = udf { t: String =>
      val text = if (t == null) "" else t
      val (f, y) =
        if (ngFeatures) featurizeNg(text, bModel.value.perplexity(text))
        else featurize(text, bModel.value.perplexity(text))
      if (predictKeep(bw.value, f) == (y == 1)) 1L else 0L
    }
    val r = docs.select(agreeUdf(col(textCol)).as("ok"))
      .agg(sum(col("ok")).as("ok"), count(lit(1)).as("n")).head()
    r.getLong(0).toDouble / r.getLong(1)
  }
}
