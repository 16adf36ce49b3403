package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF index maintenance: appends join existing cells (recall holds for
  * appended vectors), tombstone deletes disappear from probes, planning-
  * time partition pruning survives both, and the rebuild threshold fires
  * on tombstone pileup. */
class IvfMaintenanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def fixture() = {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = e.where(col("vec_id") % 10 =!= 3) // held-out tenth appended later
    val extra = e.where(col("vec_id") % 10 === 3)
    val cents = Ann.kmeansCentroids(base, "embedding", k = 16)
    val dir = Files.createTempDirectory("graft-ivf-maint").toString
    Ann.writeIndex(Ann.ivfIndex(base, "embedding", cents), cents, dir)
    (e, base, extra, cents, dir)
  }

  test("append joins existing cells; appended vector is found; pruning holds") {
    val (e, _, extra, _, dir) = fixture()
    Ann.appendToIndex(spark, dir, extra, "embedding")
    val (indexed, cents) = Ann.readIndex(spark, dir)
    assert(indexed.count() == e.count())
    // query AT an appended vector: it must be its own top hit at full probe
    val probe = extra.select(col("vec_id"), col("embedding")).head()
    val q = probe.getSeq[Float](1).toArray
    val top = Ann.ivfTopK(indexed, "vec_id", "embedding", cents, q,
      k = 5, nprobe = cents.length)
    assert(top.head().getLong(0) == probe.getLong(0),
      "appended vector not retrievable from the maintained index")
    // partition pruning still reaches the scan below any maintenance joins
    val narrow = Ann.ivfTopK(indexed, "vec_id", "embedding", cents, q,
      k = 5, nprobe = 4)
    val scanLine = narrow.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("cell"),
      s"cell not in partition filters after append: $scanLine")
  }

  test("tombstoned ids vanish from probes; pruning survives the anti-join") {
    import spark.implicits._
    val (_, base, _, _, dir) = fixture()
    val victim = base.select(col("vec_id"), col("embedding")).head()
    Ann.deleteFromIndex(spark, dir, Seq(victim.getLong(0)).toDF("vec_id"))
    val (indexed, cents) = Ann.readIndex(spark, dir)
    val q = victim.getSeq[Float](1).toArray
    val top = Ann.ivfTopK(indexed, "vec_id", "embedding", cents, q,
      k = 5, nprobe = cents.length)
    val ids = top.collect().map(_.getLong(0)).toSet
    assert(!ids.contains(victim.getLong(0)), "tombstoned id still returned")
    val narrow = Ann.ivfTopK(indexed, "vec_id", "embedding", cents, q,
      k = 5, nprobe = 4)
    val plan = narrow.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("cell"),
      s"cell not in partition filters under tombstones: $scanLine")
    assert(plan.contains("BroadcastHashJoin"),
      "tombstone anti-join must broadcast, not shuffle")
  }

  test("rebuild threshold fires on tombstone pileup") {
    import spark.implicits._
    val (_, base, _, _, dir) = fixture()
    val s0 = Ann.indexStats(spark, dir)
    assert(!s0.needsRebuild && s0.tombstones == 0L && s0.cells > 1)
    val n = s0.liveRows
    val victims = base.select(col("vec_id")).limit((n / 4).toInt + 1)
    Ann.deleteFromIndex(spark, dir, victims)
    val s1 = Ann.indexStats(spark, dir)
    assert(s1.needsRebuild, s"expected rebuild at ${s1.tombstones}/$n tombstones")
    assert(s1.liveRows == n - s1.tombstones)
  }
}
