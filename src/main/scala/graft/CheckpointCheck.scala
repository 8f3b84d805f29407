package graft

import graft.pipeline.Checkpoint

/** Dev utility: prove checkpoint resume semantics (SURVEY.md §5 #6).
  * Run 1 processes only K buckets then "dies"; run 2 resumes and must
  * process exactly buckets−K more; a third run is a no-op. Output digests
  * must be identical to a fresh single-shot run.
  * `runMain graft.CheckpointCheck [n] [buckets] [killAfter]` */
object CheckpointCheck {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000L
    val buckets = if (args.length > 1) args(1).toInt else 8
    val kill = if (args.length > 2) args(2).toInt else 3
    val spark = Session.build(master = "local[8]", shufflePartitions = 8)
    spark.sparkContext.setLogLevel("WARN")

    def digests(dir: String): Map[Int, (Long, Long)] =
      Checkpoint.committed(dir, 0, buckets).map { b =>
        val j = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/_commits/epoch-0/bucket-$b.json"))
        val rc = """"rowCount":(-?\d+)""".r.findFirstMatchIn(j).get.group(1).toLong
        val ph = """"phashDigest":(-?\d+)""".r.findFirstMatchIn(j).get.group(1).toLong
        b -> (rc, ph)
      }.toMap

    val dirA = "/tmp/ckpt_resume"; val dirB = "/tmp/ckpt_fresh"
    for (d <- Seq(dirA, dirB)) {
      val p = java.nio.file.Paths.get(d)
      graft.pipeline.Checkpoint.deleteRecursively(p)
    }

    val r1 = Checkpoint.run(spark, n, dirA, buckets, parts = 8, maxBuckets = kill)
    println(s"[ckpt] run1 committed ${r1.size} buckets (killAfter=$kill)")
    val r2 = Checkpoint.run(spark, n, dirA, buckets, parts = 8)
    println(s"[ckpt] run2 resumed, committed ${r2.size} more")
    val r3 = Checkpoint.run(spark, n, dirA, buckets, parts = 8)
    println(s"[ckpt] run3 no-op, committed ${r3.size}")
    val fresh = Checkpoint.run(spark, n, dirB, buckets, parts = 8)
    println(s"[ckpt] fresh single-shot committed ${fresh.size}")

    val a = digests(dirA); val b = digests(dirB)
    val identical = a == b && a.size == buckets
    val totalRows = a.values.map(_._1).sum
    println(s"[ckpt] identical=$identical buckets=${a.size} totalRows=$totalRows (expect $n)")
    assert(r1.size == kill && r2.size == buckets - kill && r3.isEmpty, "resume bucket counts wrong")
    assert(identical && totalRows == n, "resumed output != fresh output")
    println("[ckpt] PASS")
    spark.stop()
  }
}
