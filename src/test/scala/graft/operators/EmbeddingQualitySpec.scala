package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class EmbeddingQualitySpec extends SparkFunSuite {
  import spark.implicits._

  private def vec(xs: Float*): Seq[Float] = xs

  test("outliers: a planted far vector is flagged, the tight cluster is not") {
    // group 0: 20 vectors near (1, 0) with small deterministic jitter,
    // plus ONE vector far away at (9, 9).
    val near = (0 until 20).map(i => (i.toLong, vec(1f + i * 0.01f, 0f), 0))
    val far = Seq((99L, vec(9f, 9f), 0))
    val df = (near ++ far).toDF("id", "v", "g")
    val got = EmbeddingQuality.outliers(df, "id", "v", "g", zThreshold = 2.0)
      .select("id").as[Long].collect().toSet
    assert(got === Set(99L))
  }

  test("outliers: zero-spread group (identical vectors) flags nothing") {
    val df = (0 until 10).map(i => (i.toLong, vec(1f, 2f, 3f), 0)).toDF("id", "v", "g")
    assert(EmbeddingQuality.outliers(df, "id", "v", "g").count() === 0L)
  }

  test("outliers: groups are screened independently") {
    // group 0 tight around (1,0); group 1 tight around (0,1); the same
    // coordinates that are outlying for group 0 are NOT flagged when
    // they form their own group.
    val g0 = (0 until 15).map(i => (i.toLong, vec(1f + i * 0.01f, 0f), 0))
    val g1 = (100 until 115).map(i => (i.toLong, vec(0f, 1f + i * 0.01f), 1))
    val out0 = Seq((98L, vec(5f, 5f), 0))
    val df = (g0 ++ g1 ++ out0).toDF("id", "v", "g")
    val got = EmbeddingQuality.outliers(df, "id", "v", "g", zThreshold = 2.0)
      .select("id", "g").as[(Long, Int)].collect().toSet
    assert(got === Set((98L, 0)))
  }

  test("outliers: z and dist columns are 6-dp rounded and reproducible across partitionings") {
    val rows = (0 until 50).map { i =>
      (i.toLong, vec(i * 0.1f, (50 - i) * 0.1f, (i % 7).toFloat), i % 2)
    }
    val df = rows.toDF("id", "v", "g")
    def run(d: org.apache.spark.sql.DataFrame) =
      EmbeddingQuality.outliers(d, "id", "v", "g", zThreshold = 1.0)
        .select("id", "dist", "z").as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    val a = run(df.repartition(1))
    val b = run(df.orderBy(rand(5)).repartition(7))
    assert(a === b)
    assert(a.nonEmpty)
    a.foreach { case (_, dist, z) =>
      assert(math.abs(dist - math.rint(dist * 1e6) / 1e6) < 1e-9)
      assert(math.abs(z - math.rint(z * 1e6) / 1e6) < 1e-9)
    }
  }

  test("dimProfile: hand-computed µ-integer moments") {
    // dim 0: values 1.0, 2.0, 3.0 → µ {1e6, 2e6, 3e6}: mean 2e6,
    // var = (3·14e12 − 36e12)/9 µ² = 666666666666
    // dim 1: constant 0.5 → var 0
    val df = Seq(
      (1L, vec(1.0f, 0.5f)), (2L, vec(2.0f, 0.5f)), (3L, vec(3.0f, 0.5f))
    ).toDF("id", "v")
    val got = EmbeddingQuality.dimProfile(df, "v").orderBy("dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (0L, 3L, 2000000L, 1000000L, 3000000L, 666666666666L),
      (1L, 3L, 500000L, 500000L, 500000L, 0L)))
  }

  test("dimProfile: bitwise identical across partitionings") {
    val rows = (0 until 60).map(i => (i.toLong, vec(i * 0.017f, -i * 0.01f, 0.3f)))
    def run(d: org.apache.spark.sql.DataFrame) =
      EmbeddingQuality.dimProfile(d, "v").orderBy("dim").collect().toSeq
    assert(run(rows.toDF("id", "v").repartition(1)) ===
      run(rows.toDF("id", "v").orderBy(rand(3)).repartition(7)))
  }

  test("sourceJsDivergence: disjoint sources score the hand-derived JS; identical score 0") {
    // model: centroids at (0,0) and (1,1) in micro units
    val model = KMeansExact.Model(Array(
      Array(0L, 0L), Array(1000000L, 1000000L)))
    // A: 4 vectors in cluster 0; B: 4 in cluster 1 → per source
    // a=(4,0), q=(4,4)/8: s1 = 4·round(ln(4/3)·1e6) = 1150728,
    // s2 = 4·round(ln(2/3)·1e6) + 4·round(ln 2·1e6) = 1150728,
    // js = 1150728 div 8 + 1150728 div 16 = 143841 + 71920 = 215761
    val vecs = ((0 until 4).map(i => (i.toLong, vec(0.1f, 0.1f))) ++
      (4 until 8).map(i => (i.toLong, vec(0.9f, 0.9f)))).toDF("vec_id", "v")
    val docs = ((0 until 4).map(i => (i.toLong, "A")) ++
      (4 until 8).map(i => (i.toLong, "B"))).toDF("doc_id", "source")
    val got = EmbeddingQuality.sourceJsDivergence(
      vecs, "vec_id", "v", docs, "doc_id", "source", model)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("A", 4L, 215761L), ("B", 4L, 215761L)))
    // identical distributions → JS exactly 0
    val docs2 = (0 until 8).map(i => (i.toLong, if (i % 2 == 0) "C" else "D"))
      .toDF("doc_id", "source")
    val vecs2 = (0 until 8).map(i =>
      (i.toLong, if (i < 4) vec(0.1f, 0.1f) else vec(0.9f, 0.9f)))
      .toDF("vec_id", "v")
    val same = EmbeddingQuality.sourceJsDivergence(
      vecs2, "vec_id", "v", docs2, "doc_id", "source", model)
      .collect().map(_.getLong(2))
    assert(same.toSeq === Seq(0L, 0L))
  }
}
