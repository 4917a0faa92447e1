package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Two-pass EXACT heavy hitters — the canonical way to ask "which
 * tokens make up at least share p of a 100 TB corpus" without
 * shuffling every distinct token:
 *
 *  - pass 1: one scan aggregates a Misra–Gries summary
 *    ([[graft.functions.MisraGriesAgg]]) with capacity ≥ 2·den —
 *    each task's partial is BOUNDED at `capacity` entries, so the
 *    single 1-row exchange carries at most `capacity` pairs per task
 *    no matter how many distinct tokens exist; the summary's
 *    undercount bound N/(capacity+1) < threshold guarantees every
 *    qualifying token is among the ≤ capacity candidates;
 *  - pass 2: exact counts of ONLY the candidate tokens (an `isin`
 *    literal-set filter pushed into the scan, then a groupBy over a
 *    candidate-bounded key space), thresholded at den·cnt ≥ num·N.
 *
 * Output is EXACT — (token, cnt) for every token with
 * cnt ≥ N·num/den — which is the driver row's plain SQL oracle. The
 * candidate list (≤ capacity ≤ 2·den entries) is a bounded
 * fit/report boundary, the same class as the BPE merge table.
 */
object HeavyHitters {

  /** Tokens with den·cnt ≥ num·N over the whitespace tokenization of
    * `textCol`. Output: (token, cnt), exact. */
  def heavyTokens(
      docs: DataFrame, textCol: String,
      num: Int = 1, den: Int = 1000): DataFrame = {
    require(num >= 1 && den >= num,
      s"share must satisfy 1 <= num <= den, got $num/$den")
    GraftFunctions.register(docs.sparkSession)
    val capacity = 2 * den // undercount bound N/(cap+1) < N·num/den
    val toks = docs.filter(col(textCol).isNotNull)
      .select(split(col(textCol), " ").as("__t"))
    val first = toks.agg(
      GraftFunctions.frequentItemsSketch(col("__t"), capacity).as("__sk"),
      sum(size(col("__t")).cast("long")).as("__n")).head()
    if (first.isNullAt(1)) return toks.sparkSession.emptyDataFrame
      .select(lit("").as("token"), lit(0L).as("cnt")).limit(0)
    val n = first.getLong(1)
    val candidates = first.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    toks
      .select(explode(col("__t")).as("token"))
      .filter(col("token").isin(candidates: _*))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .filter(lit(den.toLong) * col("cnt") >= lit(num.toLong) * lit(n))
  }
}
