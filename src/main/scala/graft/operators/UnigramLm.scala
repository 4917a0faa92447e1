package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM subword segmentation (Kudo 2018, the SentencePiece
 * unigram model) — the third tokenizer trainer beside [[Bpe]] and the
 * vocabulary-coverage cards: given a piece vocabulary with unigram
 * log-probabilities, segment every word by VITERBI — the maximum-
 * likelihood split `argmax Σ log p(piece)` — and roll per-document
 * piece counts and log-likelihoods up.
 *
 * Engine-portable exactness. The per-position DP is encoded as pure
 * BIGINT arithmetic so any engine replays it bit-for-bit:
 *
 *   state(i)  = total_micro(i) · 32 + (31 − pieces(i))
 *   cand(j→i) = state(j) + 32·score(word[j..i]) − 1
 *   state(i)  = max over valid j of cand(j→i),  state(0) = 31
 *
 * One BIGINT packs (total log-prob, piece count): integer order of
 * the key IS lexicographic order of (total, fewer-pieces) — the
 * documented tie-break (maximum likelihood, then fewest pieces) falls
 * out of `greatest`, which both engines define as null-skipping max.
 * Scores are micro-quantized once (`round(log10 cnt − log10 T, 6)`,
 * the package's 6-dp log discipline) and everything after is integer.
 *
 * Scale shape: the DP runs over DISTINCT WORDS (vocabulary-sized —
 * the same economics as [[Bpe]]), as `maxWordLen` chained column
 * expressions inside one scan-local projection with the vocab riding
 * a broadcast map; per-doc rollups join words back through the same
 * broadcast. Nothing corpus-sized shuffles; the driver holds nothing.
 */
object UnigramLm {

  /** Pack/unpack base: 5 bits of piece-count headroom (≤ 31 pieces —
    * enforce via maxWordLen ≤ 31). */
  private val Base = 32L

  /**
   * Fit the piece vocabulary from the corpus: all character n-grams
   * (1..`maxPiece`) of whitespace words with count ≥ `minCount` —
   * single characters are always kept (the fallback alphabet, as in
   * the reference implementation), so every in-corpus word stays
   * segmentable. Scores are unigram log-probabilities on the micro
   * grid: `round(log10 cnt − log10 T, 6)·10⁶` with T = Σ kept counts.
   *
   * @return (piece, cnt, score_micro) — score_micro < 0.
   */
  def fitVocab(
      docs: DataFrame, textCol: String,
      maxPiece: Int = 4, minCount: Long = 2L): DataFrame = {
    require(maxPiece >= 1, s"maxPiece must be >= 1, got $maxPiece")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val words = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
    val pieces = words
      .select(col("w"), explode(sequence(lit(1), length(col("w"))))
        .as("i"))
      .select(col("w"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPiece), length(col("w")) - col("i") + 1)))
          .as("l"))
      .select(expr("substring(w, i, l)").as("piece"))
    // Materialize the vocabulary-sized count relation ONCE: `counts`
    // is referenced both as the output rows and under the total-mass
    // aggregate — unmaterialized, Catalyst derives the full corpus
    // n-gram explode once per reference (two corpus passes per fit).
    val counts = pieces.groupBy("piece").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount || length(col("piece")) === 1)
      .localCheckpoint(true)
    val tot = counts.agg(sum("cnt").as("__t"))
    counts.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        ((round(log10(col("cnt")), 6).cast("decimal(28,6)") -
          round(log10(col("__t")), 6).cast("decimal(28,6)")) *
          lit(1000000)).cast("long").as("score_micro"))
  }

  /**
   * Viterbi-segment every distinct word of `words` ("word" column)
   * against `vocab` (piece, score_micro). Words longer than
   * `maxWordLen` characters emit NULL metrics (declared cap — the DP
   * unrolls one column per position), as do words containing an
   * out-of-vocabulary character.
   *
   * @return (word, n_chars, n_pieces, logp_micro)
   */
  /** Distinct words × broadcast vocab map, with the chained dp
    * columns __dp0..__dpN — the shared front half of [[segmentWords]]
    * and [[refit]]. */
  private def withDpColumns(
      words: DataFrame, vocab: DataFrame,
      maxPiece: Int, maxWordLen: Int): DataFrame = {
    require(maxWordLen >= 1 && maxWordLen <= 31,
      s"maxWordLen must be in [1, 31] (5-bit piece headroom), " +
        s"got $maxWordLen")
    val vmap = vocab.agg(map_from_entries(collect_list(
      struct(col("piece"), col("score_micro")))).as("__vm"))
    val base = words.select(col("word")).distinct()
      .crossJoin(broadcast(vmap))
    // dp(0) = 31; dp(i) = greatest over piece lengths l of
    // dp(i-l) + 32·score(word[i-l+1 .. i]) − 1 (null candidates skip)
    (1 to maxWordLen).foldLeft(
      base.withColumn("__dp0", lit(31L))) { (df, i) =>
      val cands = (1 to math.min(i, maxPiece)).map { l =>
        col(s"__dp${i - l}") +
          expr(s"try_element_at(__vm, substring(word, ${i - l + 1}, $l))") *
          Base - 1L
      }
      val best = if (cands.size == 1) cands.head else greatest(cands: _*)
      df.withColumn(s"__dp$i",
        when(length(col("word")) >= i, best).otherwise(lit(null)))
    }
  }

  def segmentWords(
      words: DataFrame, vocab: DataFrame,
      maxPiece: Int = 4, maxWordLen: Int = 16): DataFrame = {
    val withDp = withDpColumns(words, vocab, maxPiece, maxWordLen)
    val finalDp = (1 to maxWordLen).foldLeft(lit(null).cast("long")) {
      (acc, i) => when(length(col("word")) === i, col(s"__dp$i"))
        .otherwise(acc)
    }
    withDp
      .withColumn("__f", finalDp)
      .withColumn("__r", ((col("__f") % Base) + Base) % Base)
      .select(col("word"),
        length(col("word")).cast("long").as("n_chars"),
        (lit(31L) - col("__r")).as("n_pieces"),
        // exact multiple of 32 after the mod subtraction, so
        // truncating div == floor in every engine, negatives included
        expr(s"(__f - __r) div $Base").as("logp_micro"))
  }

  /**
   * One hard-EM (Viterbi-EM) refit step (Kudo 2018 §3.2, the
   * M-step over 1-best segmentations): BACKTRACE each word's
   * maximum-likelihood split into its actual pieces, recount pieces
   * over word OCCURRENCES, and rescore. The backtrace is columnar
   * like the forward pass: the dp values ride an array column, the
   * chosen last-piece length at position p is the SMALLEST l whose
   * candidate reproduces dp(p) exactly (deterministic in any engine —
   * the packed key makes achievers bit-comparable), and `maxWordLen`
   * chained position columns walk p → p − l*(p) back to zero.
   *
   * @return (piece, cnt, score_micro, viterbi_cnt, new_score_micro) —
   *         pieces the 1-best segmentations never use keep their old
   *         row with viterbi_cnt = 0 and a NULL new score (visible,
   *         not resmoothed away).
   */
  def refit(
      docs: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      maxPiece: Int = 4, maxWordLen: Int = 16): DataFrame = {
    // The vocab relation is referenced twice (the DP's broadcast map
    // AND the final recount join), and the localCheckpoint barrier in
    // the middle of this method splits the plan into two queries — so
    // without materialization the caller's fitVocab (a full corpus
    // n-gram pass) would execute once per half. Checkpoint it once up
    // front: the relation is vocabulary-sized (bounded by the n-gram
    // alphabet, not the corpus).
    val voc = vocab.localCheckpoint(true)
    val occ = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1 &&
        length(col("word")) <= maxWordLen)
    val freq = occ.groupBy("word").agg(count(lit(1)).as("__wf"))
    // materialize the dp columns before the backtrace references all
    // of them at once: the words relation is vocabulary-sized, and
    // the barrier keeps the optimizer from re-deriving the chained dp
    // projections inside the fold's lambda (tree blow-up → OOM)
    val withDp = withDpColumns(occ.select("word"), voc,
      maxPiece, maxWordLen)
      .withColumn("__dparr",
        array((0 to maxWordLen).map(i => col(s"__dp$i")): _*))
      .select(col("word"), col("__vm"), col("__dparr"))
      .localCheckpoint(true)
    // l*(p): smallest piece length whose candidate equals dp(p) —
    // element_at is 1-based, so dp(p) lives at __dparr[p + 1]
    def dpAt(p: Column) = element_at(col("__dparr"), (p + 1).cast("int"))
    def lstar(p: Column): Column =
      (1 to maxPiece).foldLeft(lit(null).cast("int")) { (acc, l) =>
        val piece = col("word").substr((p - l + 1).cast("int"), lit(l))
        val cand = dpAt(p - l) +
          call_function("try_element_at", col("__vm"), piece) * Base - 1L
        coalesce(acc, when(p >= l && dpAt(p) === cand, lit(l)))
      }
    // walk back inside ONE aggregate() fold: p → p − l*(p), emitting
    // the piece crossed at each step. The accumulator is a lambda
    // variable — a LEAF — so each step's expression stays
    // constant-sized (an iterated withColumn chain would inline the
    // previous position expression ~8× per step under projection
    // collapse: exponential tree growth, OOM at analysis)
    val walked = withDp.withColumn("__pieces",
      aggregate(
        sequence(lit(1), lit(maxWordLen)),
        struct(length(col("word")).cast("long").as("p"),
          array().cast("array<string>").as("ps")),
        (acc, _) => {
          val p = acc.getField("p")
          val l = lstar(p)
          val piece = col("word").substr((p - l + 1).cast("int"), l)
          when(p > 0 && l.isNotNull,
            struct((p - l).cast("long").as("p"),
              array_append(acc.getField("ps"), piece).as("ps")))
            .otherwise(struct(lit(0L).as("p"),
              acc.getField("ps").as("ps")))
        }).getField("ps"))
    // vocabulary-sized and referenced (through `joined`) twice — once
    // for the new total, once for the rescore projection: materialize
    // so the backtrace explode+join runs once.
    val viterbiCounts = walked
      .select(col("word"), explode(col("__pieces")).as("piece"))
      .join(broadcast(freq), "word")
      .groupBy("piece")
      .agg(sum("__wf").as("viterbi_cnt"))
      .localCheckpoint(true)
    val joined = voc.join(viterbiCounts, Seq("piece"), "left")
      .select(col("piece"), col("cnt"), col("score_micro"),
        coalesce(col("viterbi_cnt"), lit(0L)).as("viterbi_cnt"))
    val tot = joined.agg(sum("viterbi_cnt").as("__t"))
    joined.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"), col("score_micro"),
        col("viterbi_cnt"),
        when(col("viterbi_cnt") > 0,
          ((round(log10(col("viterbi_cnt")), 6).cast("decimal(28,6)") -
            round(log10(col("__t")), 6).cast("decimal(28,6)")) *
            lit(1000000)).cast("long")).as("new_score_micro"))
  }

  /**
   * Per-document rollup: each doc's word occurrences joined through
   * the broadcast word-segmentation table. Output: (idCol, n_words,
   * n_pieces, logp_micro) — documents whose every word segmented;
   * words over the length cap contribute NULLs which null the doc's
   * metrics (visible, never silently dropped).
   */
  def segmentCorpus(
      docs: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      maxPiece: Int = 4, maxWordLen: Int = 16): DataFrame = {
    val occ = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
    val seg = segmentWords(occ.select("word"), vocab, maxPiece, maxWordLen)
    occ.join(broadcast(seg), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        // SUM skips nulls, which would hide an unsegmentable word —
        // count them and poison the doc's metrics explicitly instead
        sum(when(col("n_pieces").isNull, 1L).otherwise(0L)).as("__bad"),
        sum("n_pieces").as("__np"),
        sum("logp_micro").as("__lp"))
      .select(col(idCol), col("n_words"),
        when(col("__bad") > 0, lit(null)).otherwise(col("__np"))
          .as("n_pieces"),
        when(col("__bad") > 0, lit(null)).otherwise(col("__lp"))
          .as("logp_micro"))
  }
}
