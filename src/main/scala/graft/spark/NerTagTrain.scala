package graft.spark

import graft.core.NerTag
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed training of the generalizing NER span tagger
  * ([[graft.core.NerTag]]) by distant supervision from the gazetteer
  * artifact — closes reference op 13's remaining gap (a dictionary cannot
  * detect unseen names; the trained char-shape model can).
  *
  * Scale shape — the [[LangIdTrain]] recipe:
  *  - positives are the dictionary entries themselves (11.5k rows — a
  *    local dataset, label from the artifact);
  *  - negatives are corpus candidate spans containing NO dictionary entry
  *    (ambiguous spans — partly a known entity — are excluded), exploded
  *    per occurrence in ONE narrow pass;
  *  - the shuffled relation is (label, feat, n) — vocabulary-sized, hash-
  *    aggregated with map-side combine; `minCount` prunes the hapax tail
  *    and `maxFeats` bounds the driver collect (throws, never truncates).
  */
object NerTagTrain {

  /** Distributed (label, feat, n) sufficient statistic — the driver-gate
    * relation (`q_ner_train`), bit-for-bit CPython-twinned (integer
    * counts; tools/gen_expected_pipeline.py). */
  def featureCounts(spark: SparkSession, pages: DataFrame, textCol: String,
                    model: NerSlot.NerModel, minCount: Long = 2L): DataFrame = {
    import spark.implicits._
    val entries = model.entries
    val posRows: Seq[(String, String)] = entries.toSeq.flatMap {
      case (e, label, _) => NerTag.features(e).map(f => (label, f))
    }
    val pos = spark.createDataset(posRows).toDF("label", "feat")
    val entrySet = new java.util.HashSet[String](entries.length * 2)
    entries.foreach(e => entrySet.add(e._1))
    val b = spark.sparkContext.broadcast(entrySet)
    val negFeats = udf { (t: String) =>
      if (t == null) Array.empty[String]
      else {
        val set = b.value
        NerTag.candidateSpans(t).iterator.flatMap { case (a, z) =>
          val s = t.subSequence(a, z).toString
          if (NerTag.containsEntry(s, set)) Iterator.empty
          else NerTag.features(s).iterator
        }.toArray
      }
    }
    val neg = pages.select(explode(negFeats(col(textCol))).as("feat"))
      .select(lit(NerTag.NegLabel).as("label"), col("feat"))
    pos.unionByName(neg)
      .groupBy(col("label"), col("feat")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }

  /** End-to-end: distributed counts → bounded collect → model. */
  def train(spark: SparkSession, pages: DataFrame, textCol: String,
            model: NerSlot.NerModel = NerSlot.defaultModel,
            minCount: Long = 2L, maxFeats: Int = 2000000): NerTag.NerTagModel = {
    val collected = featureCounts(spark, pages, textCol, model, minCount)
      .limit(maxFeats + 1).collect()
    require(collected.length <= maxFeats,
      s"NER feature relation exceeds maxFeats=$maxFeats — raise the bound " +
        "or minCount (model assembly is driver-side)")
    NerTag.fromCounts(collected.toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))))
  }
}
