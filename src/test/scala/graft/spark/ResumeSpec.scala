package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Checkpoint/resume + lineage contract (north_rule, SURVEY §7.4):
  * kill after k buckets → resume processes only the remaining buckets and
  * the final content is identical to an uninterrupted run. */
class ResumeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val conf = Pipeline.Conf(numBuckets = 16, saltBuckets = 4)

  private def scored = Pipeline.withBucket(
    Pipeline.run(spark, DataGen.pages(spark, 800, partitions = 8).toDF()), conf)
    // map columns aren't comparable in Spark sorts; content check uses a
    // stable projection below
    .cache()

  private def contentHash(path: String): Seq[(String, String, Boolean)] =
    spark.read.parquet(s"$path/data")
      .select(col("url"), col("scrubbed_text"), col("keep"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      .toSeq.sortBy(_._1)

  test("uninterrupted vs interrupted+resumed runs are content-identical") {
    val cleanDir = Files.createTempDirectory("graft-sink-clean").toString
    val resumeDir = Files.createTempDirectory("graft-sink-resume").toString
    val df = scored

    // run A: uninterrupted
    val repA = IcebergishSink.writeResumable(spark, df, cleanDir, conf, "snap-input-1")
    assert(repA.bucketsWritten.size == 16 && repA.bucketsSkipped.isEmpty)

    // run B: simulate a crash — write everything, then erase the ledger for
    // 5 buckets and corrupt their data dirs (partial files, no commit)
    IcebergishSink.writeResumable(spark, df, resumeDir, conf, "snap-input-1")
    val killed = Seq(1, 3, 7, 8, 15)
    killed.foreach { b =>
      Files.delete(Paths.get(resumeDir, "_ledger", s"bucket-$b.json"))
      val d = Paths.get(resumeDir, "data", s"part_bucket=$b")
      // leave a partial/corrupt file behind, as a mid-write crash would
      Files.list(d).forEach(f => Files.delete(f))
      Files.writeString(d.resolve("part-corrupt.parquet"), "partial garbage")
    }
    assert(IcebergishSink.completedBuckets(resumeDir) == (0 until 16).toSet.diff(killed.toSet))

    // resume: must rewrite ONLY the killed buckets
    val repB = IcebergishSink.writeResumable(spark, df, resumeDir, conf, "snap-input-1")
    assert(repB.bucketsWritten.sorted == killed)
    assert(repB.bucketsSkipped.size == 11)

    assert(contentHash(resumeDir) == contentHash(cleanDir))
    assert(repB.rows == repA.rows && repB.keepRows == repA.keepRows)
  }

  test("lineage records input snapshot, rule version and per-bucket counts") {
    val dir = Files.createTempDirectory("graft-sink-lineage").toString
    val rep = IcebergishSink.writeResumable(spark, scored, dir, conf, "snap-xyz")
    val lineage = IcebergishSink.readLineage(dir)
    assert(lineage.size == 16)
    assert(lineage.forall(_.inputSnapshot == "snap-xyz"))
    assert(lineage.forall(_.ruleVersion == IcebergishSink.RuleVersion))
    assert(lineage.map(_.rows).sum == 800)
    assert(lineage.map(_.keepRows).sum == rep.keepRows && rep.keepRows > 0)
    assert(lineage.map(_.hits).sum > 0)
    // snapshot manifest exists and is valid JSON
    val snaps = Files.list(Paths.get(dir, "_snapshots")).toArray
    assert(snaps.nonEmpty)
  }

  test("snapshot manifests are listable and readable (time-travel-lite)") {
    val dir = Files.createTempDirectory("graft-sink-snap").toString
    val rep = IcebergishSink.writeResumable(spark, scored, dir, conf, "snap-a")
    val again = IcebergishSink.writeResumable(spark, scored, dir, conf, "snap-a")
    val snaps = IcebergishSink.listSnapshots(dir)
    assert(snaps.size == 2)
    assert(snaps.map(_.snapshotId).contains(rep.snapshotId))
    assert(snaps.forall(_.buckets.sorted == (0 until 16)))
    assert(snaps.forall(_.rows == 800))
    // read by explicit id and by latest — both see all committed rows,
    // and the bucket filter prunes at planning time
    val byId = IcebergishSink.readSnapshot(spark, dir, Some(rep.snapshotId))
    val latest = IcebergishSink.readSnapshot(spark, dir)
    assert(byId.count() == 800 && latest.count() == 800)
    assert(again.bucketsWritten.isEmpty)
  }

  test("second full run over a committed table is a no-op") {
    val dir = Files.createTempDirectory("graft-sink-noop").toString
    IcebergishSink.writeResumable(spark, scored, dir, conf, "s")
    val again = IcebergishSink.writeResumable(spark, scored, dir, conf, "s")
    assert(again.bucketsWritten.isEmpty && again.bucketsSkipped.size == 16)
  }
}
