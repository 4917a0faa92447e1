package graft.operators

import graft.SparkFunSuite

class QualityClassifierSpec extends SparkFunSuite {
  import spark.implicits._

  /** Mixed corpus: fluent stopword-rich prose vs short/punct junk. */
  private def corpus(n: Int) = {
    val good = "the quick brown fox and the lazy dog of the meadow ran over " +
      "the hill and the valley and the stream of the forest all day long"
    (0 until n).map { i =>
      if (i % 4 == 0) (i.toLong, s"@@@ ### $i !!")
      else (i.toLong, s"$good $i")
    }.toDF("doc_id", "text")
  }

  test("fit: micro-integer weights are partitioning-invariant (bit-exact)") {
    val df = corpus(120)
    val a = QualityClassifier.fit(df.repartition(7), "doc_id", "text", iters = 5)
    val b = QualityClassifier.fit(df.repartition(2), "doc_id", "text", iters = 5)
    assert(a.wMicro.toSeq === b.wMicro.toSeq)
    assert(a.bMicro === b.bMicro)
    assert(a.mean.toSeq === b.mean.toSeq && a.sd.toSeq === b.sd.toSeq)
  }

  test("trained model separates junk from prose (better than majority class)") {
    val df = corpus(200)
    val m = QualityClassifier.fit(df, "doc_id", "text")
    val scored = QualityClassifier.score(df, "doc_id", "text", m)
      .collect().map(r => (r.getDouble(1), r.getBoolean(2), r.getLong(3)))
    val neg = scored.filter(_._3 == 0L).map(_._1)
    val pos = scored.filter(_._3 == 1L).map(_._1)
    assert(neg.nonEmpty && pos.nonEmpty)
    assert(neg.max < pos.min, "score ranges should separate cleanly here")
    val tnr = scored.count(s => s._3 == 0L && !s._2).toDouble / neg.length
    val tpr = scored.count(s => s._3 == 1L && s._2).toDouble / pos.length
    assert((tnr + tpr) / 2 > 0.9, s"balanced accuracy tnr=$tnr tpr=$tpr")
  }

  test("fitSummary exposes the exact model integers") {
    val df = corpus(60)
    val m = QualityClassifier.fit(df, "doc_id", "text", iters = 4)
    val row = QualityClassifier.fitSummary(df, "doc_id", "text", iters = 4).collect()(0)
    assert(row.getLong(0) === m.n && row.getLong(1) === m.nPos)
    assert(Seq(row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5)) ===
      m.wMicro.toSeq)
    assert(row.getLong(6) === m.bMicro)
  }

  test("constant feature falls back to sd=1 (no NaN/Inf anywhere)") {
    // identical docs → every feature variance is exactly 0
    val df = (0L until 30L).map(i => (i, "same text every time ok")).toDF("doc_id", "text")
    val m = QualityClassifier.fit(df, "doc_id", "text", iters = 3)
    assert(m.sd.forall(_ == 1.0))
    val scores = QualityClassifier.score(df, "doc_id", "text", m)
      .collect().map(_.getDouble(1))
    assert(scores.forall(s => !s.isNaN && !s.isInfinite))
  }

  test("class weights derive from label counts (weighted mean is balanced)") {
    val df = corpus(100) // 25 junk / 75 prose
    val m = QualityClassifier.fit(df, "doc_id", "text", iters = 1)
    assert(m.nPos === 75L && m.n === 100L)
    assert(m.posWeight === 25 * 2.0 / 100 && m.negWeight === 75 * 2.0 / 100)
  }
}
