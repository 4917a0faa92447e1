package graft

/**
 * Targeted micro-bench: run a subset of `SparkEntry.queries` by name,
 * several reps each, on one or more SF dirs. For iterating on a single
 * operator without paying the full Bench sweep.
 *
 * Usage: runMain graft.BenchOne <queryName>[,<queryName>…] [reps]
 * Env:   SPARK_GRAFT_SF_DIRS (comma-separated, default sf0.01,sf0.1)
 *        SPARK_GRAFT_CPUS
 */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: BenchOne <queryName>[,name…] [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SF_DIRS", "/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (dir <- dirs; name <- names) {
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"[benchone] $name%-28s $dir  best=$best%.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
