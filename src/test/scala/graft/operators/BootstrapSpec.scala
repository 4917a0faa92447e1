package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Poisson bootstrap: inverse-CDF table correctness, replica mass
  * near Poisson(1) expectations, exactness and determinism. */
class BootstrapSpec extends SparkFunSuite {
  import spark.implicits._

  test("multiplicity thresholds follow the published table") {
    // boundary probes: h just below/at each threshold
    val cases = Seq(0L -> 0, 24112L -> 0, 24113L -> 1, 48225L -> 1,
      48226L -> 2, 60273L -> 3, 65530L -> 6, 65534L -> 7, 65535L -> 8)
    val out = cases.map(_._1).toDF("h")
      .select(Bootstrap.multiplicityFor(col("h")).as("m"))
      .collect().map(_.getInt(0))
    assert(out.toSeq === cases.map(_._2))
  }

  test("replica mass is Poisson(1)-shaped: mean n_eff ~ n, variance > 0") {
    val n = 2000
    val ex = (0 until n).map(i => (i.toLong, (i % 2).toLong)).toDF("id", "score")
    val reps = Bootstrap.poissonBootstrap(ex, "id", "score", reps = 16).collect()
    assert(reps.length === 16)
    val effs = reps.map(_.getAs[Long]("n_eff"))
    val meanEff = effs.sum.toDouble / effs.length
    // E[n_eff] = n, sd(n_eff) = sqrt(n) ~ 45: mean of 16 reps within 5 sd
    assert(math.abs(meanEff - n) < 5 * math.sqrt(n.toDouble),
      s"meanEff=$meanEff")
    assert(effs.distinct.length > 1) // replicas genuinely differ
  }

  test("deterministic: identical replicas across runs and partitionings") {
    val ex = (0 until 500).map(i => (i.toLong, (i % 3 == 0))).map {
      case (i, b) => (i, if (b) 1L else 0L)
    }.toDF("id", "score")
    val a = Bootstrap.poissonBootstrap(ex, "id", "score", 8)
      .orderBy("rep").collect().toSeq
    val b = Bootstrap.poissonBootstrap(ex.repartition(13), "id", "score", 8)
      .orderBy("rep").collect().toSeq
    assert(a === b)
  }

  test("mean_score is sum/n_eff exactly") {
    val ex = (0 until 100).map(i => (i.toLong, 1L)).toDF("id", "score")
    // constant score 1 → every replica mean is exactly 1.0
    val reps = Bootstrap.poissonBootstrap(ex, "id", "score", 8).collect()
    assert(reps.forall(r => r.getAs[Double]("mean_score") === 1.0))
  }

  test("permutationTest: a real effect is significant, noise is not") {
    import spark.implicits._
    // strong effect: every pair favors B by 5
    val effect = (1L to 200L).map(i => ("g", i, 5L)).toDF("grp", "id", "d")
    val r1 = Evaluation_permutation(effect)
    assert(r1.getAs[Long]("obs_abs") === 1000L)
    assert(r1.getAs[Long]("p_micro") <= 100000L, s"p=${r1}") // p <~ 0.1
    // pure noise: alternating +/-1 differences
    val noise = (1L to 200L).map(i =>
      ("g", i, if (i % 2 == 0) 1L else -1L)).toDF("grp", "id", "d")
    val r0 = Evaluation_permutation(noise)
    assert(r0.getAs[Long]("p_micro") > 100000L)
    assert(r0.getAs[Long]("reps") === 64L)
  }

  private def Evaluation_permutation(df: org.apache.spark.sql.DataFrame) =
    Bootstrap.permutationTest(df, "grp", "id", "d", reps = 64).collect().head

  test("permutationTest: deterministic across partitionings; p never 0") {
    import spark.implicits._
    val pairs = (1L to 150L).map(i => ("g", i, (i % 7) - 3)).toDF("grp", "id", "d")
    val a = Bootstrap.permutationTest(pairs.repartition(1), "grp", "id", "d", 64)
      .collect().head
    val b = Bootstrap.permutationTest(pairs.repartition(13), "grp", "id", "d", 64)
      .collect().head
    assert(a.toSeq === b.toSeq)
    assert(a.getAs[Long]("p_micro") >= 15384L) // 1/(64+1) on the micro grid
  }

  test("jackknifeRatio: hand case — pseudo-values and variance exact") {
    import spark.implicits._
    // groups (a,b): u1 (2,4), u2 (3,3), u3 (0,3) → R = 5/10
    val rows = Seq(
      (1L, 1L, 1L), (1L, 1L, 1L), (1L, 0L, 1L), (1L, 0L, 1L),
      (2L, 1L, 1L), (2L, 1L, 1L), (2L, 1L, 1L),
      (3L, 0L, 1L), (3L, 0L, 1L), (3L, 0L, 1L))
      .toDF("u", "num", "den")
    val r = Bootstrap.jackknifeRatio(rows, "u", "num", "den")
      .collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getLong(2) === 500000L)
    assert(r.getLong(3) === 500000L)
    assert(r.getLong(4) === 61224367347L)
  }

  test("jackknifeRatio: homogeneous groups → zero variance") {
    import spark.implicits._
    val rows = (1L to 4L).flatMap(u =>
      Seq((u, 1L, 1L), (u, 0L, 1L))).toDF("u", "num", "den")
    val r = Bootstrap.jackknifeRatio(rows, "u", "num", "den")
      .collect().head
    assert(r.getLong(2) === 500000L)
    assert(r.getLong(4) === 0L)
  }

  test("jackknifeRatio: a group owning the whole denominator is excluded") {
    import spark.implicits._
    val rows = Seq((1L, 1L, 1L), (2L, 1L, 0L), (3L, 0L, 0L))
      .toDF("u", "num", "den")
    val r = Bootstrap.jackknifeRatio(rows, "u", "num", "den")
      .collect().head
    // deleting u1 empties the denominator → only u2, u3 usable
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
  }

  test("multipleTesting: hand-computed Bonferroni / Holm / BH with clamps") {
    import spark.implicits._
    val pv = Seq(("A", 10000L), ("B", 20000L), ("C", 200000L), ("D", 1000000L))
      .toDF("slice", "p_micro")
    val out = Bootstrap.multipleTesting(pv, "slice", "p_micro")
      .orderBy("rnk").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))
    // m=4: bonf = min(4p, 1); holm = runmax((m-i+1)p); bh = sufmin(pm/i)
    assert(out.toSeq === Seq(
      ("A", 1L, 40000L, 40000L, 40000L, true),
      ("B", 2L, 80000L, 60000L, 40000L, true),
      ("C", 3L, 800000L, 400000L, 266666L, false),
      ("D", 4L, 1000000L, 1000000L, 1000000L, false)))
    // monotone: holm non-decreasing in rank, bh non-decreasing
    val holm = out.map(_._4); val bh = out.map(_._5)
    assert(holm.sliding(2).forall(p => p(0) <= p(1)))
    assert(bh.sliding(2).forall(p => p(0) <= p(1)))
  }
}
