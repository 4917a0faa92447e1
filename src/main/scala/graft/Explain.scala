package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print `explain("formatted")` for the named
  * queries (default: all) at the given sf dir. Used to keep every
  * operator's physical plan the one we'd want at 100 TB — pushdown,
  * pruning, partial aggregation, broadcast where intended, and no
  * cartesian products.
  *
  * With `SPARK_GRAFT_EXPLAIN_FINAL=1` the query is also EXECUTED and
  * the post-run adaptive plan printed — the only view that shows what
  * AQE actually did: `ReusedExchange` nodes (shared subplans computed
  * once), runtime join-strategy switches, and coalesced partitions.
  * The static plan alone shows repeated subtrees twice even when one
  * exchange serves both consumers at runtime. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val showFinal = sys.env.get("SPARK_GRAFT_EXPLAIN_FINAL").exists(_.trim.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      if (showFinal) {
        // collect() runs THIS queryExecution, so AQE finalizes the plan
        // we print (df.write and df.foreach each plan a SEPARATE
        // execution — .rdd wraps the logical plan in DeserializeToObject
        // — and would leave df's own adaptive plan un-executed)
        df.collect()
        println(s"---------- $name: final adaptive plan ----------")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
