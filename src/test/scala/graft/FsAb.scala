package graft

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Dev-only: where do 64 ledger writeAtomic calls spend time? */
object FsAb {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val conf = s.sessionState.newHadoopConf()
    val dir = new Path("/tmp/graft_fsab")
    val fs = dir.getFileSystem(conf)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val fc = FileContext.getFileContext(dir.toUri, conf)
    (0 until 2).foreach { round =>
      var tCreate = 0L; var tClose = 0L; var tRename = 0L
      val t0 = System.nanoTime()
      (0 until 64).foreach { i =>
        val tmp = new Path(dir, s"b-$round-$i.json.tmp")
        val target = new Path(dir, s"b-$round-$i.json")
        var t = System.nanoTime()
        val out = fs.create(tmp, true)
        tCreate += System.nanoTime() - t
        out.write("{\"x\":1}".getBytes("UTF-8"))
        t = System.nanoTime()
        out.close()
        tClose += System.nanoTime() - t
        t = System.nanoTime()
        fc.rename(tmp, target, Options.Rename.OVERWRITE)
        tRename += System.nanoTime() - t
      }
      println(f"FSAB round=$round total=${(System.nanoTime() - t0) / 1e9}%.2f create=${tCreate / 1e9}%.2f close=${tClose / 1e9}%.2f rename=${tRename / 1e9}%.2f")
    }
    // plain FileSystem.rename variant
    (0 until 2).foreach { round =>
      var tCreate = 0L; var tRename = 0L
      val t0 = System.nanoTime()
      (0 until 64).foreach { i =>
        val tmp = new Path(dir, s"p-$round-$i.json.tmp")
        val target = new Path(dir, s"p-$round-$i.json")
        var t = System.nanoTime()
        val out = fs.create(tmp, true)
        out.write("{\"x\":1}".getBytes("UTF-8"))
        out.close()
        tCreate += System.nanoTime() - t
        t = System.nanoTime()
        val ok = fs.rename(tmp, target)
        require(ok)
        tRename += System.nanoTime() - t
      }
      println(f"FSAB plain round=$round total=${(System.nanoTime() - t0) / 1e9}%.2f create+close=${tCreate / 1e9}%.2f rename=${tRename / 1e9}%.2f")
    }
    s.stop()
  }
}
