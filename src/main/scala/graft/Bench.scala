package graft

import graft.spark.{DataGen, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): ONE JSON line on stdout.
  *
  * Headline metric: docs/sec end-to-end (langid + perplexity + quality +
  * scrub) over a generated Common-Crawl-style pages table, read from parquet
  * and forced through the `noop` sink so every column is actually computed —
  * a bare `count()` would let Catalyst prune the scrub/LM work entirely.
  *
  * Scaling evidence (north_rule: efficiency ≥ 0.8 from N to 4N executors; no
  * real cluster in this sandbox): the identical job runs at local[8] and
  * local[32] on the identical parquet input — a fresh SparkContext per level
  * — and both throughputs plus efficiency = thr(4N) / (4 · thr(N)) are
  * reported in the "scaling" field and recorded in BENCH.md.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // split the scan fine enough that every worker sees many task waves —
      // the default 128m/4m coalesces the corpus into fewer tasks than
      // threads and the stage tail idles the wide level
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("SPARK_GRAFT_SPLIT", "4m"))
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Force full computation of every column (noop sink = no IO cost). */
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** JVM flags for level subprocesses (same add-opens as build.sbt — Spark
    * 4.x on JDK 17 needs them when SparkSession is built outside
    * spark-submit). */
  private val childJvmFlags: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++ Seq(
    "-Dspark.ui.enabled=false",
    "-Dspark.sql.session.timeZone=UTC",
    s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
    "-XX:+UseParallelGC",
    // pre-fault the heap: at 32 threads the first pass over a lazily-mapped
    // 16 GiB young gen stalls on page faults — measured +15-25% at local[32]
    "-XX:+AlwaysPreTouch",
    s"-Xmn${sys.env.getOrElse("SPARK_GRAFT_YOUNG", "16g")}")

  /** Child mode: run ONE level in this fresh JVM and print its result.
    * Repeats the identical job until wall time stops improving (≤3% or 6
    * runs) so both levels are measured at JIT steady state — a cold first
    * pass under-reports the wider level by 2-3× while C2 compilation
    * contends with 32 running threads. */
  private def runLevel(p: Int, pagesPath: String, nDocs: Long): Unit = {
    val s = session(p)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    // SPARK_GRAFT_NATIVE=0 A/Bs the broadcast-UDF stage path vs the default
    // native page_stages expression; SPARK_GRAFT_SECURITY=enhanced measures
    // the model-assisted level (gazetteer automaton + merged scrub per row)
    val conf = Pipeline.Conf(
      nativeStages = sys.env.get("SPARK_GRAFT_NATIVE").forall(_ != "0"),
      security = Pipeline.SecurityLevel.parse(
        sys.env.getOrElse("SPARK_GRAFT_SECURITY", "maximum")))
    def job(): Unit = materialize(Pipeline.run(s, s.read.parquet(pagesPath), conf))
    job() // JIT warm-up pass, untimed
    var best = Double.MaxValue
    var bestUtil = 0.0
    val minRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "4").toInt
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // adaptive sampling: the host steals CPU in bursts (see BENCH.md), so a
    // short job gets extra samples — best-of-N needs at least one quiet
    // window. Floor minRuns, keep sampling until ~45s of timed work or 12
    // runs, whichever first.
    var r = 0
    var timedTotal = 0.0
    while (r < minRuns || (timedTotal < 45.0 && r < 12)) {
      val cpu0 = osBean.getProcessCpuTime
      val gc0 = gcMs
      val sec = timeSec(job())
      val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
      val gcSec = (gcMs - gc0) / 1e3
      // CPU utilization of the level's thread budget: ~1.0 means the job kept
      // every worker busy and wall-time differences are external (CPU steal)
      val util = cpuSec / (sec * p)
      System.err.println(
        f"[bench] level=$p run=$r sec=$sec%.3f cpuSec=$cpuSec%.1f gcSec=$gcSec%.1f util=$util%.2f")
      if (sec < best) { best = sec; bestUtil = util }
      timedTotal += sec
      r += 1
    }
    s.stop()
    println(s"LEVELRESULT $p ${nDocs / best} $best $bestUtil")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "300000").toLong
    val levels = sys.env.getOrElse("SPARK_GRAFT_BENCH_LEVELS", "2,8,32")
      .split(",").map(_.trim.toInt).toSeq
    val pagesPath = "/root/repo/target/bench_pages"

    args.collectFirst { case a if a.startsWith("--level=") => a.drop(8).toInt } match {
      case Some(p) => runLevel(p, pagesPath, nDocs); return
      case None =>
    }

    // materialize the deterministic corpus once so every level reads the
    // same parquet (generation excluded from the timed window)
    {
      val s = session(levels.max)
      val expected = try s.read.parquet(pagesPath).count() catch { case _: Throwable => -1L }
      if (expected != nDocs) {
        DataGen.pages(s, nDocs, partitions = 128).write
          .mode("overwrite").parquet(pagesPath)
      }
      s.stop()
    }

    // end-to-end pipeline throughput: one FRESH JVM per parallelism level
    // (exactly how separate N- and 4N-executor spark-submit runs behave;
    // also isolates each level from the previous session's heap)
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val scaling = levels.map { p =>
      val cmd = Seq(javaBin) ++ childJvmFlags ++
        Seq("-cp", sys.props("java.class.path"), "graft.Bench", s"--level=$p")
      val proc = new ProcessBuilder(cmd: _*)
        .redirectError(ProcessBuilder.Redirect.INHERIT) // drain Spark logs
        .start()
      val out = new String(proc.getInputStream.readAllBytes())
      proc.waitFor()
      val line = out.linesIterator.find(_.startsWith("LEVELRESULT"))
        .getOrElse(sys.error(s"level $p subprocess produced no result:\n$out"))
      val parts = line.split(" ")
      p -> (parts(2).toDouble, parts(3).toDouble, parts(4).toDouble)
    }
    val byLevel = scaling.toMap
    val (_, (thrMax, _, _)) = scaling.maxBy(_._2._1)
    // one efficiency figure per N→4N pair present in the level list
    val effPairs = scaling.map(_._1).sorted.flatMap { p =>
      byLevel.get(p * 4).map { case (thr4, _, _) =>
        (p, p * 4, thr4 / (4.0 * byLevel(p)._1))
      }
    }

    // per-query timings at full parallelism, forced through noop
    val s = session(levels.max)
    // fixture generation outside the timed window (q_stream_pipeline's
    // timed body is then the streaming round trip only)
    SparkEntry.prewarmStreamFixture(s)
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try timeSec(materialize(fn(s, sfDir)))
      catch { case _: Throwable => -1.0 }
      name -> sec
    }
    s.stop()

    val qs = queryTimes.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val effJson = effPairs.map { case (a, b, e) => s""""efficiency_${a}_to_$b":$e""" }
    val scal = (scaling.map { case (p, (thr, sec, util)) =>
      s""""local_$p":{"docs_per_sec":$thr,"sec":$sec,"cpu_util":$util}"""
    } ++ effJson).mkString("{", ",", "}")
    println(
      s"""{"metric":"docs/sec end-to-end (langid+perplexity+quality+scrub)","value":$thrMax,"unit":"docs/sec","queries":$qs,"sf":"$sfDir","n_docs":$nDocs,"scaling":$scal}""")
  }
}
