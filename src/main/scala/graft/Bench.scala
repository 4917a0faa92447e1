package graft

import org.apache.spark.sql.SparkSession

/**
 * Per-round benchmark main: runs every `SparkEntry.queries` entry on
 * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
 *
 * Each query is materialized through the `noop` sink — a real
 * distributed write that executes the full plan (including ORDER BY:
 * unlike `count()`, the noop write does not let Catalyst's
 * EliminateSorts delete the sort). One untimed warmup pass absorbs
 * first-query JVM/codegen/Parquet-footer costs. Failures are reported
 * (stderr + negative duration), never swallowed.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          e.printStackTrace()
          -1.0
      }
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warmup: every query once, untimed — absorbs JVM/codegen/scan setup
    // and the offline steps (index build, query-vector fetch) so the
    // timed pass measures steady-state query execution.
    ordered.foreach { case (n, fn) => run(s"warmup:$n", fn) }

    val results = ordered.map { case (name, fn) => name -> run(name, fn) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
