package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Toxicity blocklist: boundary semantics, scrub masking, C4 drop rule,
  * and regex-tier ≡ automaton-tier equivalence (the scale path must agree
  * with the oracle-able path exactly). */
class ToxicitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val cases = Seq(
    "what the Hell happened" -> 1L,            // case-insensitive
    "a shell on the shore" -> 0L,              // substring, no boundary
    "hellish weather today" -> 0L,             // prefix, no boundary
    "damn. Damn, DAMN!" -> 3L,                 // punctuation boundaries
    "crap_count is a variable" -> 0L,          // underscore is a word char
    "clean text with no matches at all" -> 0L,
    "damn crap hell" -> 3L)

  test("regex tier: boundary-exact counts, scrub masks in place, C4 drop") {
    import spark.implicits._
    val df = cases.map(_._1).toDF("t")
      .select(col("t"), Toxicity.count(col("t")).as("n"),
        Toxicity.scrub(col("t")).as("s"),
        Toxicity.dropFlag(Toxicity.count(col("t"))).as("d"))
    val rows = df.collect()
    rows.zip(cases).foreach { case (r, (in, want)) =>
      assert(r.getLong(1) == want, s"count for '$in'")
      assert(r.getBoolean(3) == (want > 0L), s"drop for '$in'")
      if (want > 0)
        assert(r.getString(2).contains("<TOXIC>"), s"mask missing for '$in'")
      else assert(r.getString(2) == in, s"clean text altered: '$in'")
    }
    // scrub is idempotent: masked text has zero hits
    import spark.implicits._
    val rescrub = rows.map(_.getString(2)).toSeq.toDF("t")
      .select(Toxicity.count(col("t"))).collect().map(_.getLong(0))
    assert(rescrub.forall(_ == 0L))
  }

  test("automaton tier agrees with the regex tier on every case") {
    val m = Toxicity.Matcher(Toxicity.DefaultList)
    cases.foreach { case (in, want) =>
      assert(m.countIn(in) == want, s"automaton count for '$in'")
    }
    assert(m.countIn(null) == 0L)
    // and across a generated corpus slice (both tiers over real text)
    import spark.implicits._
    val texts = DataGen.pages(spark, 300).toDF()
      .select(col("text")).as[String].collect()
    val b = spark.sparkContext.broadcast(m)
    texts.foreach { t =>
      val viaRegex = java.util.regex.Pattern.compile(Toxicity.pattern())
        .matcher(t).results().count()
      assert(b.value.countIn(t) == viaRegex, "tier divergence on corpus text")
    }
  }
}
