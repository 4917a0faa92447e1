package graft.operators

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

import graft.SparkFunSuite
import graft.functions.VectorKernels

/** Exact integer k-means (Lloyd's): hand-computed blob convergence,
  * smaller-cid tie-break, empty-cluster retention, partition
  * invariance (the property MLlib's float k-means cannot give), and a
  * cross-check against an independent in-memory reference. */
class KMeansExactSpec extends SparkFunSuite {
  import spark.implicits._

  private def df(vecs: Seq[Array[Float]]) =
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

  test("two well-separated blobs converge to their exact integer means") {
    val vecs = Seq(
      Array(0.0f, 0.0f), Array(1.0f, 1.0f), // first two by id = the init
      Array(0.1f, 0.0f), Array(0.0f, 0.1f),
      Array(0.9f, 1.0f), Array(1.0f, 0.9f))
    val m = KMeansExact.fit(df(vecs), "id", "v", k = 2, iters = 2)
    // members {0,2,3}: mean µ = (0+100000+0)/3 = 33333.33… → 33333
    assert(m.centroids(0).toSeq === Seq(33333L, 33333L))
    // members {1,4,5}: (1000000+900000+1000000)/3 = 966666.67 → 966667
    assert(m.centroids(1).toSeq === Seq(966667L, 966667L))
    val asg = KMeansExact.assign(df(vecs), "id", "v", m)
      .orderBy("id").select("cluster").as[Long].collect().toSeq
    assert(asg === Seq(0L, 1L, 0L, 0L, 1L, 1L))
  }

  test("distance ties go to the smaller cid; empty clusters keep their centroid") {
    // init centroids 0 and 1 are IDENTICAL → every point ties → all to
    // cid 0; cluster 1 goes empty and must keep its previous centroid.
    val vecs = Seq(Array(0.5f), Array(0.5f), Array(0.25f), Array(0.75f))
    val m = KMeansExact.fit(df(vecs), "id", "v", k = 2, iters = 1)
    assert(m.centroids(0).toSeq === Seq(500000L)) // (2·500000+250000+750000)/4
    assert(m.centroids(1).toSeq === Seq(500000L)) // empty: unchanged
    val asg = KMeansExact.assign(df(vecs), "id", "v", m)
      .select("cluster").as[Long].collect().toSeq
    assert(asg.forall(_ == 0L))
  }

  test("model is bitwise identical under different partitionings") {
    val vecs = (0 until 60).map { i =>
      Array.tabulate(5)(j => ((i * 7 + j * 13) % 17) / 16.0f - 0.5f)
    }
    val m1 = KMeansExact.fit(df(vecs).repartition(1), "id", "v", k = 4, iters = 3)
    val m7 = KMeansExact.fit(df(vecs).repartition(7), "id", "v", k = 4, iters = 3)
    assert(m1.centroids.map(_.toSeq).toSeq === m7.centroids.map(_.toSeq).toSeq)
  }

  test("kernel totality: empty vector / length-mismatched flat → null") {
    assert(VectorKernels.nearestCentroidL2(
      UnsafeArrayData.fromPrimitiveArray(Array.empty[Long]),
      UnsafeArrayData.fromPrimitiveArray(Array(1L, 2L))) == null)
    assert(VectorKernels.nearestCentroidL2(
      UnsafeArrayData.fromPrimitiveArray(Array(1L, 2L)),
      UnsafeArrayData.fromPrimitiveArray(Array(1L, 2L, 3L))) == null)
  }

  test("agrees with an independent in-memory Lloyd's on a pseudo-random corpus") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(80)(Array.fill(6)(rnd.nextFloat() * 2 - 1))
    val m = KMeansExact.fit(
      df(vecs).repartition(5), "id", "v", k = KMeansExact.K, iters = KMeansExact.Iters)

    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
    var cents = q.take(KMeansExact.K).map(_.clone).toArray
    for (_ <- 0 until KMeansExact.Iters) {
      val asg = q.map { v =>
        cents.zipWithIndex.map { case (c, ci) =>
          (c.zip(v).map { case (a, b) => val t = b - a; t * t }.sum, ci)
        }.minBy(identity)._2 // lexicographic: min dist2, then smaller cid
      }
      val next = cents.map(_.clone)
      for (c <- 0 until KMeansExact.K) {
        val members = q.zip(asg).collect { case (v, a) if a == c => v }
        if (members.nonEmpty) for (j <- cents(0).indices)
          next(c)(j) =
            math.floor(members.map(_(j)).sum * 1.0 / members.length + 0.5).toLong
      }
      cents = next
    }
    assert(m.centroids.map(_.toSeq).toSeq === cents.map(_.toSeq).toSeq)

    val asgDf = KMeansExact.assign(df(vecs).repartition(3), "id", "v", m)
      .orderBy("id").select("cluster").as[Long].collect().toSeq
    val asgRef = q.map { v =>
      cents.zipWithIndex.map { case (c, ci) =>
        (c.zip(v).map { case (a, b) => val t = b - a; t * t }.sum, ci)
      }.minBy(identity)._2.toLong
    }
    assert(asgDf === asgRef)
  }

  test("silhouette: on-centroid vectors score 1, the equidistant point 0") {
    import spark.implicits._
    val m = KMeansExact.Model(Array(
      Array(0L, 0L), Array(1000000L, 1000000L)))
    val vecs = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)),       // exactly centroid 0
      (3L, Seq(1f, 1f)), (4L, Seq(1f, 1f)),       // exactly centroid 1
      (5L, Seq(0.5f, 0.5f))                       // equidistant → s = 0,
    ).toDF("vec_id", "v")                         //   tie-assigned to 0
    val got = KMeansExact.silhouette(vecs, "vec_id", "v", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((0L, 3L, 0.666667), (1L, 2L, 1.0)))
  }

  test("silhouette: k = 1 is rejected (nearest-OTHER-centroid undefined)") {
    import spark.implicits._
    val m = KMeansExact.Model(Array(Array(0L, 0L)))
    val vecs = Seq((1L, Seq(0f, 0f))).toDF("vec_id", "v")
    intercept[IllegalArgumentException] {
      KMeansExact.silhouette(vecs, "vec_id", "v", m)
    }
  }
}
