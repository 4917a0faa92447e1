package graft.operators

import graft.SparkFunSuite

/** Margin mining: hand-built candidate grids where raw cosine and
  * margin DISAGREE (the hub case the margin exists for), mutual-best
  * semantics, and bitwise determinism under repartition. */
class BitextMiningSpec extends SparkFunSuite {
  import spark.implicits._

  private def mine(cands: Seq[(Long, Long, Long)], k: Int = 2,
      thr: Long = 1050000L) =
    BitextMining.marginPairs(
      cands.toDF("x_id", "y_id", "cos_micro"), "x_id", "y_id", "cos_micro",
      k = k, thresholdMicro = thr)
      .collect()
      .map(r => r.getAs[Long]("x_id") ->
        ((r.getAs[Long]("y_id"), r.getAs[Long]("margin_micro"),
          r.getAs[Boolean]("mutual"), r.getAs[Boolean]("is_mined"))))
      .toMap

  test("hub suppression: margin prefers the distinctive partner over the hub") {
    // y=100 is a hub: cosine 0.90 with BOTH x's. y=200 is x=1's genuine
    // partner at 0.85. Raw cosine picks the hub for x=1; the margin
    // must not — the hub's own neighborhood mean is as high as its
    // cosines, while y=200's is pulled down by its weak second edge.
    val cands = Seq(
      (1L, 100L, 900000L), (1L, 200L, 850000L),
      (2L, 100L, 900000L), (2L, 200L, 300000L))
    val out = mine(cands)
    // x=1: margin(1,100) = 900000*2e6 div (875000 + 900000) = 1014084
    //      margin(1,200) = 850000*2e6 div (875000 + 575000) = 1172413
    assert(out(1L)._1 === 200L, out)
    assert(out(1L)._2 === 1172413L, out)
    assert(out(1L)._3 && out(1L)._4, out) // mutual (y=200's best is x=1) + mined
    // x=2 keeps the hub (its only strong option):
    // margin(2,100) = 900000*2e6 div (600000 + 900000) = 1200000, and
    // the hub's best x IS x=2 (1200000 > 1014084) -> mutual + mined
    assert(out(2L) === ((100L, 1200000L, true, true)), out)
  }

  test("mutual flag: a one-sided best is not mined") {
    // both x's best partner is y=100, but y=100 can reciprocate only
    // one of them: margin(1,100) = 950000*2e6 div 1875000 = 1013333 <
    // margin(2,100) = 900000*2e6 div 1575000 = 1142857 (x=2's weak
    // second edge deflates its neighborhood mean, boosting its
    // margin), so y=100's best is x=2 — x=1's pair is one-sided.
    val cands = Seq(
      (1L, 100L, 950000L), (2L, 100L, 900000L), (2L, 200L, 400000L))
    val out = mine(cands, k = 2, thr = 0L)
    assert(out(1L)._1 === 100L && out(1L)._3 === false &&
      out(1L)._4 === false, out)
    assert(out(2L)._1 === 100L && out(2L)._3 === true &&
      out(2L)._4 === true, out)
  }

  test("negative-cosine candidates are ignored entirely") {
    val cands = Seq((1L, 100L, -500000L), (1L, 200L, 600000L))
    val out = mine(cands, thr = 0L)
    assert(out.keySet === Set(1L))
    assert(out(1L)._1 === 200L)
  }

  test("bitwise deterministic under repartition; ties break to the least id") {
    val rnd = new scala.util.Random(31)
    val cands = for {
      x <- 0L until 20L; y <- 100L until 130L
    } yield (x, y, (rnd.nextInt(2000000) - 500000).toLong)
    val df = cands.toDF("x_id", "y_id", "cos_micro")
    def run(parts: Int) = BitextMining.marginPairs(
      df.repartition(parts), "x_id", "y_id", "cos_micro")
      .orderBy("x_id").collect().map(_.toSeq).toSeq
    assert(run(1) === run(13))
    // exact tie on margin: equal cosines to two partners with equal
    // neighborhoods -> least y wins
    val tie = mine(Seq((1L, 300L, 700000L), (1L, 200L, 700000L)), k = 2,
      thr = 0L)
    assert(tie(1L)._1 === 200L)
  }

  test("string ids: tie-break and mutual-best survive non-numeric ids") {
    // the r9 ADVICE finding: -col(partner) broke for string ids; the
    // min_by(struct(-margin, partner)) form must order strings too
    val cands = Seq(
      ("enA", "deZ", 700000L), ("enA", "deB", 700000L),
      ("enB", "deB", 400000L))
      .toDF("x_id", "y_id", "cos_micro")
    val out = BitextMining.marginPairs(cands, "x_id", "y_id", "cos_micro",
      k = 2, thresholdMicro = 0L)
      .collect().map(r => r.getAs[String]("x_id") ->
        ((r.getAs[String]("y_id"), r.getAs[Boolean]("mutual")))).toMap
    assert(out("enA")._1 === "deB") // margin tie -> lexicographically least
    assert(out("enA")._2 === true)  // deB's best x is enA -> mutual
  }

  test("candidatesBetween == exact threshold relation at recall-1 params") {
    // the driver row's contract: at 3x64 the LSH bucket join finds
    // EVERY pair with cos_micro >= floor on the fixture, so the exact
    // cross-product oracle replays it
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    import org.apache.spark.sql.functions._
    def side(lang: String) = docs.filter(col("lang") === lang)
      .select(col("doc_id").as("id"))
      .join(emb.select(col("vec_id").as("id"), col("embedding").as("v")), "id")
    val en = side("en"); val de = side("de")
    val lsh = BitextMining.candidatesBetween(en, de, "id", "v", 300000L)
      .orderBy("x_id", "y_id").collect().map(_.toSeq).toSeq
    val exact = en.select(col("id").as("x_id"), col("v").as("xv"))
      .crossJoin(de.select(col("id").as("y_id"), col("v").as("yv")))
      .select(col("x_id"), col("y_id"),
        floor(GraftFunctions.knnCosineSimilarity(col("xv"), col("yv")) *
          lit(1000000.0) + lit(0.5)).cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= 300000L)
      .orderBy("x_id", "y_id").collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty)
    assert(lsh === exact)
  }

  test("driver row plan has no cartesian / broadcast-nested-loop join") {
    // the r9 verdict's one scale-killer: candidate generation must be
    // the bucket-equality join — assert it structurally on the
    // entry's own physical plan
    val df = graft.SparkEntry.queries("bitext_mining")(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
