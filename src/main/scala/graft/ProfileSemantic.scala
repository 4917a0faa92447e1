package graft

import org.apache.spark.sql.functions._

/**
 * Stage-time breakdown for `dedup_semantic` (the suite's most
 * expensive row): times the cumulative prefixes — (1) LSH banded pair
 * generation, (2) + connected components, (3) + the verdict join —
 * and reports per-stage deltas, so a drift in the total can be pinned
 * to the stage that grew (the r9 verdict's ask). Each prefix is run
 * `reps` times after a warmup; stages re-execute their prefix (no
 * caching — the same execution shape the row itself uses), so the
 * deltas are the marginal stage costs.
 *
 * Usage: runMain graft.ProfileSemantic [sfDir] [reps]
 */
object ProfileSemantic {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Scale = 6

    def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def pairs = graft.operators.SimilarityJoin.lshCosinePairsBanded(
      emb, "vec_id", "embedding", bitsPerTable = 6, nTables = 64,
      threshold = 0.4, scale = Scale, maxBucket = Some(1024))
    def comps = graft.operators.ConnectedComponents
      .components(pairs, "a_id", "b_id")
    def verdict = graft.operators.Dedup
      .semanticKeepVerdict(emb, "vec_id", pairs).orderBy("id")

    def time(label: String, f: () => org.apache.spark.sql.DataFrame): Double = {
      f().write.format("noop").mode("overwrite").save() // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.size / 2)
      println(f"$label%-12s median $med%.3f s  (reps: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      med
    }

    val t1 = time("pairs", () => pairs)
    val t2 = time("+components", () => comps)
    val t3 = time("+verdict", () => verdict)
    println(f"stage deltas: pairgen $t1%.3f s, cc ${t2 - t1}%.3f s, " +
      f"verdict-join+sort ${t3 - t2}%.3f s, total $t3%.3f s")
    spark.stop()
  }
}
