package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Physical-plan shape assertions — the scale story in executable form:
  * column pruning reaches the scan, predicates push into parquet, the small
  * dimension join broadcasts. These are what make the same code viable at
  * 100 TB, so they are pinned as tests, not hopes. */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private lazy val pagesPath: String = {
    val dir = Files.createTempDirectory("graft-plan-pages").toString
    DataGen.pages(spark, 300, partitions = 4).write.mode("overwrite").parquet(dir)
    dir
  }

  test("pipeline scan prunes html: ReadSchema carries only the used columns") {
    val df = Pipeline.run(spark, spark.read.parquet(pagesPath))
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("url") && scan.contains("text") && scan.contains("lang"))
    assert(!scan.contains("html"), s"html not pruned from scan: $scan")
  }

  test("lang filter pushes into the parquet scan") {
    val df = Pipeline.run(spark,
      spark.read.parquet(pagesPath).where(col("lang") === "en"))
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("EqualTo(lang,en)") || pushed.contains("IsNotNull(lang)"),
      s"no pushed filters in: $pushed")
    assert(pushed.contains("EqualTo(lang,en)"), s"lang filter not pushed: $pushed")
  }

  test("customer dimension join is a broadcast hash join") {
    val plan = graft.SparkEntry.queries("q_join_agg")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("pipeline over a filtered scan is still one narrow stage") {
    val df = Pipeline.run(spark,
      spark.read.parquet(pagesPath).where(col("lang") =!= "und"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
