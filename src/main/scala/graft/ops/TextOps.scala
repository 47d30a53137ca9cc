package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs
import graft.functions.TextFns._

/** Text-analysis and deduplication operators over the `documents` table —
  * the training-data-pipeline surface (builder brief; SURVEY.md §7
  * phase 4). Every operator is a distributed plan: per-document work is
  * row-local array math; cross-document work (candidate generation) goes
  * through explode + shuffle-join on short keys, never a cross join.
  */
object TextOps {

  /** (doc_id, text, norm, toks) — the ONE normalize+tokenize projection
    * every text stage is built from. [[corpusCuration]] persists it so
    * its four flag stages share a single scan+tokenize of the corpus
    * instead of paying the regex normalizer once each; standalone
    * operators go through it unpersisted (same plan as before, one extra
    * no-op projection). `normalize` is idempotent, so expressions that
    * used `normalize(text)` read `norm` unchanged. */
  private[graft] def tokenized(documents: DataFrame): DataFrame =
    Par.fanned(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("text"), normalize(col("text")).as("norm"))
      .select(col("*"), split(col("norm"), " ").as("toks"))

  /** Per-document stats: token counts (whitespace + BPE-ish), char
    * counts, stopword/punctuation/digit ratios, mean token length.
    * Ratios rounded to 6dp for engine-portable comparison. */
  def docStats(documents: DataFrame): DataFrame =
    docStatsTok(tokenized(documents))

  /** The four row-local stats every quality consumer reads — the rules
    * gate, the logreg features, and the [[shingleSignatures]] cache
    * record all derive from exactly these expressions, so a value
    * cached by one is bit-valid for the others. */
  private def qualityStatCols: Seq[Column] = {
    val toks = col("toks")
    val norm = col("norm")
    val nToks = size(toks)
    Seq(
      nToks.as("n_tokens"),
      round(hitCount(toks, StopwordsEn).cast("double") / nToks, 6).as("stopword_ratio"),
      round(size(regexp_extract_all(norm, lit("[^a-z0-9 ]"), lit(0))).cast("double")
        / greatest(length(norm), lit(1)), 6).as("punct_ratio"),
      round(size(regexp_extract_all(norm, lit("[0-9]"), lit(0))).cast("double")
        / greatest(length(norm), lit(1)), 6).as("digit_ratio"))
  }

  /** [[docStats]] over a pre-[[tokenized]] frame. `bpeishTokenCount`
    * inlines against `norm` (normalize ∘ normalize = normalize, so the
    * regex sees identical input). */
  private[graft] def docStatsTok(tok: DataFrame): DataFrame = {
    val toks = col("toks")
    val norm = col("norm")
    val nToks = size(toks)
    val st = qualityStatCols
    tok.select(
      col("doc_id"),
      st(0),
      size(regexp_extract_all(norm, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .as("n_tokens_bpe"),
      length(norm).as("n_chars_norm"),
      st(1), st(2), st(3),
      round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / nToks, 6).as("mean_token_len"))
  }

  /** Quality score in [0,1]: length band + stopword presence − symbol
    * noise. A deterministic, SQL-expressible heuristic of the usual
    * pretraining-filter shape (Gopher-style length/punct/stopword rules). */
  def docQuality(documents: DataFrame): DataFrame =
    docQualityTok(tokenized(documents))

  /** [[docQuality]] over a pre-[[tokenized]] frame. */
  private[graft] def docQualityTok(tok: DataFrame): DataFrame =
    docQualityStats(docStatsTok(tok))

  /** [[docQuality]] over an already-computed stats frame (any frame
    * carrying the four [[qualityStatCols]] — [[docStatsTok]] output or
    * a [[shingleSignatures]] cache record): the rules are arithmetic on
    * the stats, so cached stats score bit-identically to a fresh scan. */
  private[graft] def docQualityStats(s: DataFrame): DataFrame = {
    val lengthOk = col("n_tokens").between(20, 100000)
    val stopOk = col("stopword_ratio") >= 0.001
    val punctOk = col("punct_ratio") <= 0.2
    val digitOk = col("digit_ratio") <= 0.3
    s.select(
      col("doc_id"),
      lengthOk.cast("int").as("length_ok"),
      stopOk.cast("int").as("stopword_ok"),
      punctOk.cast("int").as("punct_ok"),
      digitOk.cast("int").as("digit_ok"),
      round((lengthOk.cast("double") + stopOk.cast("double")
        + punctOk.cast("double") + digitOk.cast("double")) / 4, 6).as("quality_score"))
  }

  /** Distributed logistic-regression quality classifier — the "distill
    * a cheap model from heuristic labels" step of a curation pipeline
    * (label-model distillation): full-batch gradient descent on
    * row-local features (log-length, stopword/punct/digit ratios)
    * against the weak label "≥ 3 of the 4 [[docQuality]] rules pass",
    * then score every document with the learned model.
    *
    * Everything is made ENGINE-PORTABLE so the WHOLE training
    * trajectory — not just the final scores — replays in the DuckDB
    * oracle (same discipline as [[graft.ops.VectorOps.kmeans]]):
    * zero-init weights, features and per-iteration probabilities
    * rounded to 6dp, per-weight gradient contributions summed as
    * DECIMAL(28,12) (partial-aggregation order can't flip low bits),
    * one double division per step, updated weights re-rounded to 6dp.
    *
    * Scale shape: the model is five doubles — a driver literal; each
    * iteration is ONE corpus scan + one fused 5-sum aggregation with
    * map-side combine (KB collected per step, like the k-means
    * centroids). Returns (doc_id, y, p_quality, label_pred). */
  def docQualityLogreg(documents: DataFrame, iters: Int = 3,
      lr: Double = 0.5): DataFrame =
    docQualityLogregStats(docStats(documents), iters, lr)

  /** [[docQualityLogreg]] over an already-computed stats frame — a
    * pipeline that checkpointed its signature records pays each GD
    * iteration as a scan of the SMALL stats frame instead of a full
    * re-tokenize of the corpus (each [[logregStep]] is an action). */
  private[graft] def docQualityLogregStats(stats: DataFrame, iters: Int = 3,
      lr: Double = 0.5): DataFrame = {
    require(iters >= 0, s"iters=$iters must be >= 0")
    require(lr > 0, s"lr=$lr must be > 0")
    val f = logregFeaturesStats(stats)
    var w = Array.fill(5)(0.0)
    for (_ <- 1 to iters) w = logregStep(f, w, lr)
    logregScore(f, w)
  }

  /** The classifier's feature frame (doc_id, y, x1..x4) — shared with
    * the streaming refresh so batch and online training see identical
    * inputs. All row-local. */
  private[graft] def logregFeatures(documents: DataFrame): DataFrame =
    logregFeaturesStats(docStats(documents))

  /** [[logregFeatures]] from a stats frame ([[qualityStatCols]]). */
  private[graft] def logregFeaturesStats(s: DataFrame): DataFrame = {
    val yCol = ((col("n_tokens").between(20, 100000)).cast("int")
      + (col("stopword_ratio") >= 0.001).cast("int")
      + (col("punct_ratio") <= 0.2).cast("int")
      + (col("digit_ratio") <= 0.3).cast("int") >= 3).cast("int")
    s.select(col("doc_id"), yCol.as("y"),
      round(log(lit(1L) + col("n_tokens")), 6).as("x1"),
      col("stopword_ratio").as("x2"),
      col("punct_ratio").as("x3"),
      col("digit_ratio").as("x4"))
  }

  /** 6dp-rounded sigmoid of the linear score under weights `w`. */
  private[graft] def logregProb(w: Array[Double]): Column = {
    val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3") + lit(w(4)) * col("x4")
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** ONE full-batch gradient step over a feature frame: fused 5-sum
    * DECIMAL aggregation, 6dp-rounded weight update — the unit both
    * batch training (iterated) and the streaming refresh (one step per
    * micro-batch) are built from. Empty frames return `w` unchanged. */
  private[graft] def logregStep(f: DataFrame, w: Array[Double],
      lr: Double): Array[Double] = {
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val resid = col("p") - col("y")
    val grads = Seq(resid, resid * col("x1"), resid * col("x2"),
      resid * col("x3"), resid * col("x4"))
      .zipWithIndex.map { case (g, j) => sum(g.cast("decimal(28,12)")).as(s"g$j") }
    val r = f.withColumn("p", logregProb(w))
      .agg(count(lit(1)).as("n"), grads: _*).collect()(0)
    val n = r.getLong(0)
    if (n == 0L) w
    else Array.tabulate(5)(j =>
      round6(w(j) - lr * (r.getDecimal(j + 1).doubleValue / n)))
  }

  /** Score a feature frame under final weights. */
  private[graft] def logregScore(f: DataFrame, w: Array[Double]): DataFrame =
    f.withColumn("p_quality", logregProb(w))
      .select(col("doc_id"), col("y"), col("p_quality"),
        (col("p_quality") >= 0.5).cast("int").as("label_pred"))

  /** Repetition-based quality signals — the n-gram subset of the Gopher
    * repetition rules (Rae et al. 2021, §A1.1: "fraction of characters
    * in the most common n-gram", "fraction of characters in duplicated
    * n-grams"), adapted to a corpus without line structure:
    *
    *  - `dup_token_frac`: fraction of token INSTANCES that repeat an
    *    earlier token (row-local, `array_distinct`).
    *  - `top2_frac`: chars covered by all occurrences of the single most
    *    frequent 2-gram / doc chars. The only facts the fraction needs
    *    are the winner's (count, char length), so the argmax runs as a
    *    plain `max` over `cnt·2²⁴ + length` packed longs — ties on
    *    count prefer the longer gram, and equal (count, length) grams
    *    yield the same fraction, so the value is deterministic WITHOUT
    *    ordering on the gram text (which would force a non-hashable
    *    struct max / SortAggregate).
    *  - `dup3_frac`: chars covered by every 3-gram occurring ≥ 2 times
    *    / doc chars (occurrences overlap, so this can exceed 1 on
    *    degenerate loops — kept raw, as in the paper).
    *
    * Both gram sizes ride ONE explode → one (doc, n, gram) shuffle with
    * map-side partial counts; both per-doc signals then reduce in one
    * hash-aggregable doc-grain pass (no window, no sort, no per-signal
    * join). Work is |corpus tokens| × 2 rows of a few bytes — the same
    * shape at any scale and any per-document length, no corpus-wide
    * state. */
  def docRepetition(documents: DataFrame): DataFrame = {
    TextExprs.register(documents.sparkSession)
    val base = documents.select(col("doc_id"), tokens(col("text")).as("t"),
      length(normalize(col("text"))).as("n_chars"))
    base.select(
      col("doc_id"),
      size(col("t")).as("n_tokens"),
      round((size(col("t")) - size(array_distinct(col("t")))).cast("double")
        / size(col("t")), 6).as("dup_token_frac"),
      TextExprs.repetitionStats(col("t")).as("r"),
      col("n_chars"))
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        // greatest(n_chars, 1): an all-whitespace doc has n_chars = 0 and
        // zero numerators — the HOF twin and the oracle report 0.0 there,
        // and a raw /0 would return NULL instead; for every other doc the
        // divisor is unchanged, so parity stays bit-for-bit
        round((col("r.top2_cnt") * col("r.top2_len"))
          / greatest(col("n_chars"), lit(1)), 6).as("top2_frac"),
        round(col("r.dup3_chars") / greatest(col("n_chars"), lit(1)), 6)
          .as("dup3_frac"))
  }

  /** The pre-[[graft.functions.TextExprs.RepetitionStats]] formulation:
    * explode every 2-/3-gram into (doc, n, gram) rows and aggregate
    * twice. Shuffles |corpus tokens|×2 gram strings for a PER-DOCUMENT
    * result the expression computes row-locally (3.0 s → 0.3 s at
    * sf0.1) — kept as the parity cross-check, same discipline as the
    * winnowing HOF twin. */
  def docRepetitionHof(documents: DataFrame): DataFrame = {
    val Radix = 1L << 24 // glen < 16M chars per gram; cnt up to 2^39
    val base = documents.select(col("doc_id"), tokens(col("text")).as("t"),
      length(normalize(col("text"))).as("n_chars"))
    def grams(n: Int) = when(size(col("t")) >= n,
      transform(sequence(lit(1), size(col("t")) - (n - 1)),
        i => struct(lit(n).as("n"), concat_ws(" ", slice(col("t"), i, lit(n))).as("gram"))))
      .otherwise(array().cast("array<struct<n:int,gram:string>>"))
    val rep = base
      .select(col("doc_id"), col("n_chars"), explode(concat(grams(2), grams(3))).as("g"))
      .groupBy(col("doc_id"), col("n_chars"), col("g.n").as("n"), col("g.gram").as("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("n") === 2, col("cnt") * Radix + length(col("gram"))))
          .as("top2enc"),
        sum(when(col("n") === 3 && col("cnt") >= 2,
          col("cnt") * length(col("gram")))).as("dup3_chars"),
        first(col("n_chars")).as("n_chars"))
      .select(col("doc_id"),
        round(coalesce(
          shiftright(col("top2enc"), 24) * pmod(col("top2enc"), lit(Radix))
            / col("n_chars"), lit(0.0)), 6).as("top2_frac"),
        round(coalesce(col("dup3_chars"), lit(0)) / col("n_chars"), 6).as("dup3_frac"))
    base.select(col("doc_id"), size(col("t")).as("n_tokens"),
      round((size(col("t")) - size(array_distinct(col("t")))).cast("double")
        / size(col("t")), 6).as("dup_token_frac"))
      .join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("dup3_frac"), lit(0.0)).as("dup3_frac"))
  }

  /** Canonical text cleaning: lowercase, collapse whitespace, strip
    * non-alphanumerics — the normalize step every dedup/tokenize stage
    * keys on, surfaced as its own operator with shrinkage metrics and
    * the cleaned fingerprint. Entirely row-local (zero shuffles): the
    * embarrassingly-parallel shape that saturates scan bandwidth at any
    * corpus size. */
  def docNormalize(documents: DataFrame): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(normalize(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars_raw"),
      length(cleaned).as("n_chars_clean"),
      md5(cleaned).as("clean_md5"),
      round((length(col("text")) - length(cleaned)).cast("double")
        / greatest(length(col("text")), lit(1)), 6).as("shrinkage"))
  }

  /** Stopword-profile language guess + per-language hit counts. */
  def docLangId(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val hitCols = langIdExprs(toks).map { case (name, c) => c.as(s"hits_$name") }
    documents.select(
      (col("doc_id") +: hitCols :+ langId(toks).as("lang_pred")): _*)
  }

  /** Language-ID evaluation: the confusion matrix of predicted vs
    * LABELED language — the accuracy readout any corpus that carries a
    * `lang` column gets for free. One scan (prediction inlined next to
    * the label, no self-join), one |langs|²-bounded aggregate. */
  def langIdConfusion(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), langId(tokens(col("text"))).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))

  /** Content fingerprints: md5 of the canonical text (exact-dedup key)
    * plus a cheap length+checksum composite for prefilter bucketing. */
  def docFingerprint(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      fingerprint(col("text")).as("fp_md5"),
      length(normalize(col("text"))).as("fp_len"))

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS local fingerprinting scheme): hash every positional k-gram,
    * slide a `w`-gram window, keep each window's minimum hash. Guarantees
    * any shared run of ≥ w+k-1 tokens between two documents shares ≥ 1
    * fingerprint, at ~2/(w+1) of the gram count stored. Everything is
    * row-local array math over built-in HOFs (`transform`/`slice`/
    * `array_min`) — zero shuffles before the output explode, so the
    * operator is embarrassingly parallel at any corpus size. Hash =
    * first 60 bits of md5, portable to the DuckDB oracle verbatim.
    *
    * Output: one row per distinct (doc_id, fingerprint). */
  def docWinnow(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    TextExprs.register(documents.sparkSession)
    documents
      .select(col("doc_id"),
        explode(TextExprs.winnowFps(tokens(col("text")), k, w)).as("fp"))
  }

  /** The [[docWinnow]] math as pure built-in HOFs — 10× slower than the
    * compiled expression (interpreted md5+conv per gram), kept ONLY as
    * the in-engine parity cross-check (DedupSpec); the DuckDB oracle is
    * the cross-ENGINE check. */
  private[graft] def docWinnowHof(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val grams = documents
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k) // sequence(1, n<1) would count DOWN
      .select(col("doc_id"),
        transform(sequence(lit(1), size(col("t")) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(j => element_at(col("t"), i + j)): _*))
          .as("g"))
    grams
      .select(col("doc_id"),
        transform(col("g"), s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
          .as("hs"))
      .filter(size(col("hs")) >= w)
      .select(col("doc_id"),
        explode(array_distinct(
          transform(sequence(lit(1), size(col("hs")) - (w - 1)),
            i => array_min(slice(col("hs"), i, lit(w)))))).as("fp"))
  }

  /** Near-dup candidate pairs by winnowing-fingerprint blocking: two
    * documents pair when they share ≥ `minShared` fingerprints — by the
    * winnowing guarantee, any shared token run of ≥ w+k-1 tokens forces
    * a shared fingerprint, so substantial textual overlap cannot escape
    * the blocker. Same inverted-index shape (and df stop-cap) as
    * [[nearDupJaccard]], but the index is ~2/(w+1) the size: the posting
    * lists hold window-min fingerprints, not every shingle — the cheaper
    * first-stage blocker at corpus scale. */
  def nearDupWinnow(documents: DataFrame, k: Int = 3, w: Int = 4,
      minShared: Int = 2, maxDf: Int = 100): DataFrame = {
    val fps = docWinnow(documents, k, w)
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
    val postings = fps.join(rare.select("fp"), Seq("fp"))
      .groupBy(col("fp")).agg(collect_list(col("doc_id")).as("ids"))
    postings
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Delta-proportional winnow probe: incoming docs scored against the
    * EXISTING corpus's winnow-fingerprint postings (capped at `maxDf` —
    * the persisted local-fingerprint index; a boilerplate fp held by
    * more docs than that identifies nothing). Output = (incoming doc,
    * existing doc, shared fps ≥ minShared) — the winnowing guarantee
    * (any shared run of ≥ w+k−1 tokens shares ≥ 1 fingerprint) applied
    * at ingest, work ∝ delta fingerprints × bounded postings. */
  def nearDupWinnowIncremental(existing: DataFrame, incoming: DataFrame,
      k: Int = 3, w: Int = 4, minShared: Int = 2, maxDf: Int = 100): DataFrame =
    nearDupWinnowProbe(nearDupWinnowIndex(existing, k, w, maxDf), incoming,
      k, w, minShared, maxDf)

  /** The corpus half of [[nearDupWinnowIncremental]]: df-capped winnow
    * postings (fp → bounded doc list). SATURATED keys (list size =
    * maxDf+1, true df > maxDf) stay IN the frame as saturation markers —
    * the probe filters them — so a persisted index can absorb later
    * batches by capped re-aggregation and remain equivalent to a full
    * rebuild (a dropped key would otherwise "reappear" with only the
    * delta's postings and emit pairs the rebuild never would). */
  def nearDupWinnowIndex(existing: DataFrame, k: Int = 3, w: Int = 4,
      maxDf: Int = 100): DataFrame = {
    val capped = udaf(graft.functions.BoundedList.postings(maxDf + 1))
    docWinnow(existing, k, w)
      .groupBy(col("fp")).agg(capped(col("doc_id"), lit(0)).as("ids"))
  }

  /** The probe half: delta fingerprints against a prebuilt
    * [[nearDupWinnowIndex]] frame (saturated keys identify nothing and
    * are dropped here, as in the one-shot operator). */
  def nearDupWinnowProbe(index: DataFrame, incoming: DataFrame,
      k: Int = 3, w: Int = 4, minShared: Int = 2, maxDf: Int = 100): DataFrame =
    docWinnow(incoming, k, w)
      .join(index.filter(size(col("ids")).between(1, maxDf)), Seq("fp"))
      .select(col("doc_id"), explode(col("ids")).as("e"))
      .groupBy(col("doc_id"), col("e.doc_id").as("dup_of"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)

  /** Exact dedup: hash-groupBy on the md5 fingerprint; keeper = min
    * doc_id. One shuffle on the 32-char key; at 100 TB this is the
    * standard map-side-combined dedup (each group's min computed
    * partially before the shuffle). */
  def dedupExact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), fingerprint(col("text")).as("fp_md5"))
      .groupBy(col("fp_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_docs"))

  /** Ingestion-order novelty: for every document, the fraction of its
    * distinct k-shingles first seen in THIS document — present in no
    * lower-`doc_id` document. A corpus appended in id order reads this
    * as "how much of this page is new text": near-copies of earlier
    * content score ≈0, fresh content 1.0 — the graded, ordering-aware
    * signal that exact/near dedup collapse to a binary keep. (The same
    * statistic a streaming ingest would compute against its
    * already-admitted index; here as one batch pass.)
    *
    * Scale shape: NO pairwise candidate generation anywhere (so no
    * df cap is needed — a corpus-wide stop-shingle contributes one
    * min, not |df|² pairs): per-doc shingle-set sizes are row-local;
    * first-seen owners reduce through ONE map-side-combined min per
    * shingle key (8-byte keys); novel counts are a doc-grain count over
    * the |distinct shingles| first-seen rows; one doc-grain left join
    * re-attaches them. Work is linear in the exploded index at any
    * corpus size. Returns (doc_id, n_shingles, novel_shingles,
    * novelty). */
  def docNovelty(documents: DataFrame, k: Int = 3): DataFrame = {
    val tok = tokenized(documents)
    TextExprs.register(tok.sparkSession)
    val sh = tok
      .select(col("doc_id"), TextExprs.wordShingleHashes(col("toks"), k).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n_shingles"))
    val novel = sh
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("novel_shingles"))
      .withColumnRenamed("first_doc", "doc_id")
    sizes.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("novel_shingles"), lit(0L)).as("novel_shingles"),
        round(coalesce(col("novel_shingles"), lit(0L)).cast("double")
          / col("n_shingles"), 6).as("novelty"))
  }

  /** Per-document signature record: (doc_id, fp_md5, sh, n_tokens,
    * stopword_ratio, punct_ratio, digit_ratio) — the content
    * fingerprint, the k-shingle hash array [[nearDupJaccardSh]]
    * consumes, and the four [[qualityStatCols]] the rules gate +
    * logreg features read. ALL are DETERMINISTIC row-local functions of
    * the text alone (no batch-wide statistics), which is what lets
    * [[graft.incremental.IngestIndex]] cache the record keyed by
    * (doc_id, fp_md5) and a later run reuse it verbatim for
    * re-submitted docs: batch statistics (jaccard df cap, logreg
    * gradients) recompute over whatever batch the records are fed
    * into, so results from cached records are bit-identical to results
    * from re-scanned text. One tokenize scan computes everything. */
  private[graft] def shingleSignatures(documents: DataFrame, k: Int = 3): DataFrame = {
    TextExprs.register(documents.sparkSession)
    // md5(norm) ≡ [[graft.functions.TextFns.fingerprint]](text):
    // normalize is idempotent and `norm` is already materialized in the
    // tokenized frame, so the fingerprint rides the same scan free
    tokenized(documents).select(
      col("doc_id") +:
      md5(col("norm")).as("fp_md5") +:
      TextExprs.wordShingleHashes(col("toks"), k).as("sh") +:
      qualityStatCols: _*)
  }

  /** Exact n-gram-jaccard near-dup pairs via inverted-index candidate
    * generation: explode k-shingles, drop stop-shingles with document
    * frequency > `maxDf` (they only generate quadratic candidate noise —
    * at scale this cap is what keeps the self-join linear), self-join on
    * shingle, then exact jaccard from shared/distinct counts, keep pairs
    * ≥ `minJaccard`. */
  def nearDupJaccard(documents: DataFrame, k: Int = 3,
      minJaccard: Double = 0.8, maxDf: Int = 100): DataFrame =
    nearDupJaccardTok(tokenized(documents), k, minJaccard, maxDf)

  /** [[nearDupJaccard]] over a pre-[[tokenized]] frame. */
  private[graft] def nearDupJaccardTok(tok: DataFrame, k: Int = 3,
      minJaccard: Double = 0.8, maxDf: Int = 100): DataFrame = {
    TextExprs.register(tok.sparkSession)
    nearDupJaccardSh(
      tok.select(col("doc_id"),
        TextExprs.wordShingleHashes(col("toks"), k).as("sh")),
      minJaccard, maxDf)
  }

  /** Identity tag of [[nearDupJaccardSh]]'s operator parameters, folded
    * into the pair-memo key ([[graft.incremental.IngestIndex.putPairs]],
    * via [[graft.CorpusRun]]): the memoized pair frame is a function of
    * (doc set, minJaccard, maxDf), so a parameter-default change must
    * miss the memo and recompute — never silently replay a frame
    * computed under the old defaults. */
  private[graft] def nearDupJaccardParamsTag(minJaccard: Double = 0.8,
      maxDf: Int = 100): String = s"jaccard=$minJaccard,maxDf=$maxDf"

  /** [[nearDupJaccard]] over a pre-shingled (doc_id, sh) frame —
    * [[corpusCuration]] feeds this from its persisted signature frame so
    * the shingle md5s are computed exactly once. */
  private[graft] def nearDupJaccardSh(shf: DataFrame,
      minJaccard: Double = 0.8, maxDf: Int = 100): DataFrame = {
    // Shingle-set size rides ALONGSIDE each posting entry (an int per row)
    // instead of living in a separate `sizes` frame: that frame would
    // re-shingle the whole corpus in a second subplan and need two
    // doc-keyed joins to re-attach n_a/n_b to the pairs — one corpus scan
    // and two shuffles for a few bytes of freight.
    // Shingles leave each row as 60-bit md5 HASHES (8-byte shuffle keys,
    // not ~25-byte strings) — the DuckDB oracle applies the identical
    // hash, so set sizes and shared counts match exactly on both engines.
    val ex = shf
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
    // ONE bounded aggregation replaces the classic df-prefilter + join
    // two-pass: the [[graft.functions.BoundedList]] Aggregator stops
    // appending at maxDf+1 postings, so a corpus-wide stop-shingle costs
    // a cap-sized buffer (not a corpus-sized list), and the post-filter
    // on size recovers the exact df∈[2,maxDf] semantics — lists below
    // the cap are never truncated. One shuffle on the shingle key with
    // map-side partials; candidate pairs then emit ROW-LOCALLY from each
    // list (≤ maxDf² per shingle) — no self-join of the exploded index.
    val capped = udaf(graft.functions.BoundedList.postings(maxDf + 1))
    val postings = ex
      .groupBy(col("shingle"))
      .agg(capped(col("doc_id"), col("n_sh")).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
    postings
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("shared"))
      .select(
        col("doc_a"), col("doc_b"), col("shared"), col("n_a"), col("n_b"),
        round(col("shared").cast("double")
          / (col("n_a") + col("n_b") - col("shared")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Cross-corpus near-dup: exact-jaccard pairs between a NEW corpus
    * and a fixed REFERENCE corpus (e.g. "dedup this crawl against the
    * training set we already shipped") — the bipartite twin of
    * [[nearDupJaccard]]. Corpus-internal and reference-internal pairs
    * are deliberately not reported; [[nearDupJaccardIncremental]] covers
    * the within-corpus delta shape.
    *
    * Scale shape: posting lists build over the REFERENCE side only,
    * bounded by the same `maxDf` stop-shingle cap ([[graft.functions
    * .BoundedList]] — a corpus-wide boilerplate shingle costs a
    * cap-sized buffer, never a reference-sized list); the corpus side
    * stays an exploded stream joined on the 8-byte shingle key, so work
    * is |corpus index| × O(maxDf), linear in the new crawl. Returns
    * (doc_id, ref_doc, shared, n_doc, n_ref, jaccard). */
  def nearDupCross(corpus: DataFrame, reference: DataFrame, k: Int = 3,
      minJaccard: Double = 0.8, maxDf: Int = 100): DataFrame = {
    TextExprs.register(corpus.sparkSession)
    def ex(df: DataFrame) = df
      .select(col("doc_id"), TextExprs.wordShingleHashes(tokens(col("text")), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
    val capped = udaf(graft.functions.BoundedList.postings(maxDf + 1))
    val refPost = ex(reference)
      .groupBy(col("shingle"))
      .agg(capped(col("doc_id"), col("n_sh")).as("ids"))
      .filter(size(col("ids")) <= maxDf)
    ex(corpus).join(refPost, Seq("shingle"))
      .select(col("doc_id"), col("n_sh"), explode(col("ids")).as("r"))
      .groupBy(col("doc_id"), col("r.doc_id").as("ref_doc"),
        col("n_sh").as("n_doc"), col("r.n_sh").as("n_ref"))
      .agg(count(lit(1)).as("shared"))
      .select(col("doc_id"), col("ref_doc"), col("shared"), col("n_doc"), col("n_ref"),
        round(col("shared").cast("double")
          / (col("n_doc") + col("n_ref") - col("shared")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Incremental near-dup pairing: exactly the [[nearDupJaccard]] pairs
    * that TOUCH the `incoming` batch (new×old and new×new), WITHOUT
    * recomputing the all-pairs index — the daily-ingest shape of corpus
    * dedup, and the extended-surface twin of the reference's
    * watermark-delta protocol (only work proportional to the delta).
    *
    * Correctness hinges on one fact: every shingle shared by a
    * qualifying pair belongs to the pair's incoming member, so building
    * posting lists ONLY for the incoming batch's shingles (a semi-join
    * on the shingle key, before any aggregation) loses no pair and no
    * shared-shingle count; the df cap still applies over the FULL
    * corpus posting list, so results equal the batch recompute filtered
    * to incoming-touching pairs (asserted in DedupSpec and the DuckDB
    * oracle). Work scales with |incoming's index slice|, not |corpus|².
    */
  def nearDupJaccardIncremental(existing: DataFrame, incoming: DataFrame,
      k: Int = 3, minJaccard: Double = 0.8, maxDf: Int = 100): DataFrame = {
    val exInc = explodedShingleRows(incoming, k)
    val exAll = explodedShingleRows(existing, k).union(exInc)
    val capped = udaf(graft.functions.BoundedList.postings(maxDf + 1))
    val postings = exAll
      .join(exInc.select("shingle").distinct(), Seq("shingle"), "left_semi")
      .groupBy(col("shingle"))
      .agg(capped(col("doc_id"), col("n_sh")).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
    jaccardPairsTouching(postings, incoming.select(col("doc_id")).distinct(), minJaccard)
  }

  /** One document's k-shingle hashes as exploded rows (doc_id, n_sh,
    * shingle) — the shared left side of every exact-jaccard arm (inline
    * incremental above, and [[graft.incremental.IngestIndex]]'s
    * persisted postings index + delta probe, which must stay
    * bit-identical to the inline arm). */
  private[graft] def explodedShingleRows(documents: DataFrame, k: Int): DataFrame = {
    TextExprs.register(documents.sparkSession)
    documents
      .select(col("doc_id"), TextExprs.wordShingleHashes(tokens(col("text")), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
  }

  /** The pair-emit + batch-filter tail shared by the inline and the
    * indexed delta-jaccard arms: candidate pairs emit ROW-LOCALLY from
    * each df-capped posting list, old×old pairs (reachable via a
    * shingle the batch happens to share — already known) are dropped,
    * exact jaccard from shared/size counts. Both arms feed identical
    * postings frames, so their results are identical by construction. */
  private[graft] def jaccardPairsTouching(postings: DataFrame, incIds: DataFrame,
      minJaccard: Double): DataFrame =
    postings
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("shared"))
      .join(incIds.select(col("doc_id").as("doc_a"), lit(1).as("a_new")), Seq("doc_a"), "left")
      .join(incIds.select(col("doc_id").as("doc_b"), lit(1).as("b_new")), Seq("doc_b"), "left")
      .filter(col("a_new").isNotNull || col("b_new").isNotNull)
      .select(
        col("doc_a"), col("doc_b"), col("shared"), col("n_a"), col("n_b"),
        round(col("shared").cast("double")
          / (col("n_a") + col("n_b") - col("shared")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)

  /** Benchmark decontamination: flag corpus documents sharing word
    * k-gram shingles with an eval/benchmark set — the standard
    * train-test-overlap check run before pretraining (n-gram collision
    * against held-out benchmarks). Emits every corpus document with its
    * distinct-collision count so thresholds can be tuned downstream.
    *
    * Scale shape: the eval set is benchmark-sized (≪ corpus), so its
    * distinct shingle set broadcasts; the corpus side is ONE scan →
    * explode → broadcast semi-join → doc-grain count. No corpus-side
    * self-join, no shuffle wider than (doc_id, count). Shingles are the
    * portable 60-bit md5 hashes, so the DuckDB oracle applies the
    * identical collision test. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, k: Int = 5,
      minCollisions: Int = 1): DataFrame =
    decontaminateTok(tokenized(corpus), tokenized(evalSet), k, minCollisions)

  /** [[decontaminate]] over pre-[[tokenized]] frames. */
  private[graft] def decontaminateTok(corpus: DataFrame, evalSet: DataFrame,
      k: Int = 5, minCollisions: Int = 1): DataFrame = {
    require(k >= 1, s"shingle size k=$k must be >= 1")
    TextExprs.register(corpus.sparkSession)
    def sh(df: DataFrame) = df.select(col("doc_id"),
      TextExprs.wordShingleHashes(col("toks"), k).as("sh"))
    decontaminateSh(sh(corpus), sh(evalSet), minCollisions)
  }

  /** [[decontaminate]] over pre-shingled (doc_id, sh) frames. ONE corpus
    * shingle pass: sizes ride alongside the exploded stream
    * (`explode_outer` keeps zero-shingle docs), collision counts come
    * from a hit-marker left join against the broadcast eval set — the
    * previous two-subplan form (semi-join count + a separate sizes
    * frame) shingled the corpus twice and joined doc-keyed to reunite
    * them. */
  private[graft] def decontaminateSh(corpusSh: DataFrame, evalSh: DataFrame,
      minCollisions: Int = 1): DataFrame = {
    val evalShingles = evalSh.select(explode(col("sh")).as("shingle")).distinct()
    corpusSh
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        explode_outer(col("sh")).as("shingle"))
      .join(broadcast(evalShingles.withColumn("hit", lit(1))), Seq("shingle"), "left")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_collisions"))
      .select(col("doc_id"), col("n_shingles"), col("n_collisions"),
        (col("n_collisions") >= minCollisions).cast("int").as("contaminated"))
  }

  /** Greedy keep-list after near-dup pairing: drop every doc that appears
    * as the larger id in a qualifying pair (left-anti join). Cluster-
    * transitive dedup would need connected components; the greedy rule is
    * the deterministic single-pass policy. */
  def nearDupKeep(documents: DataFrame, k: Int = 3,
      minJaccard: Double = 0.8, maxDf: Int = 100): DataFrame = {
    val losers = nearDupJaccard(documents, k, minJaccard, maxDf)
      .select(col("doc_b").as("doc_id")).distinct()
    documents.select(col("doc_id"), col("lang"), col("source"))
      .join(losers, Seq("doc_id"), "left_anti")
  }

  /** Quality-aware dedup keeper: within each TRANSITIVE near-dup
    * cluster ([[nearDupClusters]]), keep the highest-[[docQuality]]
    * member — ties to the LOWER doc_id — instead of [[nearDupKeep]]'s
    * blind min-id rule. This is the curation-correct variant: when a
    * boilerplate-mangled copy has the lower id, min-id keeps the bad
    * copy and drops the clean one.
    *
    * The per-cluster argmax is `min(struct(-quality, doc_id))` — a
    * hash-aggregable single pass over the cluster membership (which is
    * edge-sparse, not corpus-sized), never a window sort. Docs in no
    * cluster keep themselves. Returns (doc_id, lang, source,
    * quality_score) of the kept set. */
  def nearDupKeepBest(documents: DataFrame, k: Int = 3,
      minJaccard: Double = 0.8, maxDf: Int = 100,
      precomputedClusters: Option[DataFrame] = None,
      precomputedQuality: Option[DataFrame] = None): DataFrame = {
    val clusters = precomputedClusters
      .getOrElse(nearDupClusters(documents, k, minJaccard, maxDf))
      .select(col("doc_id"), col("cluster_id"))
    // a precomputed frame may cover a SUPERSET of `documents` (a
    // pipeline's shared quality scan) — every use below is an inner
    // join keyed by this frame's doc_ids, so extra rows are inert
    val q = precomputedQuality.getOrElse(docQuality(documents))
      .select(col("doc_id"), col("quality_score"))
    val best = clusters.join(q, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(min(struct((-col("quality_score")).as("nq"), col("doc_id").as("id"))).as("b"))
      .select(col("b.id").as("doc_id"))
    val losers = clusters.join(best, Seq("doc_id"), "left_anti").select(col("doc_id"))
    documents.select(col("doc_id"), col("lang"), col("source"))
      .join(q, Seq("doc_id"))
      .join(losers, Seq("doc_id"), "left_anti")
  }

  /** Transitive near-dup clusters: connected components of the
    * near-dup pair graph, so a chain a~b~c~d dedups as ONE group even
    * though a and d are not directly similar (the greedy [[nearDupKeep]]
    * rule can't see that). Min-label propagation WITH pointer jumping:
    * every node starts labeled with itself; each round every node takes
    * the min over {its label, its neighbors' labels, its label's label}.
    * The last term (label(label(id)) — pointer jumping, the Shiloach-
    * Vishkin/hash-to-min shortcut) halves label-chain depth every round,
    * so convergence is O(log diameter) rounds instead of diameter: a
    * pathological similarity chain thousands of documents long still
    * converges in ~12 rounds, where plain propagation would need
    * thousands (and previously hit the maxIters cliff). Fixpoint =
    * components labeled by their min doc_id.
    *
    * Each round is two joins + one min-aggregation over the EDGE set
    * (near-dup pairs only — a sparse fraction of the corpus), with
    * `localCheckpoint` keeping the iterated plan flat. Convergence is
    * detected from Σlabels: per-node labels are monotone non-increasing
    * (the union includes the current label), so an unchanged sum ⟺
    * fixpoint — one scalar aggregate per round, not a join-and-compare
    * pass over the label table.
    *
    * Output: (doc_id, cluster_id, cluster_size) for every document that
    * appears in at least one qualifying pair.
    *
    * Physical strategy is picked at RUNTIME, AQE-style: the eager
    * `localCheckpoint` on the edge set makes its cardinality a free
    * statistic, and near-dup graphs are sparse (edge count ∝ actual
    * duplication, not corpus²), so most corpora — even 100 TB ones —
    * yield an edge set far below driver memory. Below
    * `driverEdgeLimit` edges (default 4M ≈ 64 MB of id pairs) the
    * components come from one exact union-find over the collected
    * edges: a single collect job replaces one join+agg+probe job per
    * iteration. Above the limit (or for non-integral/string doc ids)
    * the distributed log-diameter label-propagation loop runs — the
    * path that survives a pathological all-duplicate corpus. Both
    * paths emit identical frames (asserted in DedupSpec). */
  def nearDupClusters(documents: DataFrame, k: Int = 3,
      minJaccard: Double = 0.8, maxDf: Int = 100, maxIters: Int = 50,
      driverEdgeLimit: Long = 1L << 22): DataFrame =
    clustersFromPairs(nearDupJaccard(documents, k, minJaccard, maxDf),
      maxIters, driverEdgeLimit)

  /** The CC half of [[nearDupClusters]] over an ALREADY-COMPUTED
    * near-dup pair frame (doc_a, doc_b, …) — what a pipeline that needs
    * keeper + splitter + leakage audit from one similarity pass calls
    * ([[graft.CorpusRun]]: pairs materialize once via localCheckpoint,
    * every consumer derives from the same frame instead of re-running
    * the shingle/index machinery per stage). */
  private[graft] def clustersFromPairs(pairFrame: DataFrame, maxIters: Int = 50,
      driverEdgeLimit: Long = 1L << 22): DataFrame = {
    val pairs = pairFrame.select(col("doc_a"), col("doc_b"))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    val keyOrd = driverKeyOrdering(edges.schema("src").dataType)
    if (keyOrd.isDefined && edges.count() <= driverEdgeLimit)
      clustersOnDriver(edges)(keyOrd.get)
    else clustersDistributed(edges, maxIters)
  }

  /** Orderings mirroring Spark's `min` for the doc-id types the driver
    * union-find supports; `None` routes to the distributed loop. */
  private def driverKeyOrdering(
      dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    dt match {
      case LongType    => Some(Ordering.by((x: Any) => x.asInstanceOf[Long]))
      case IntegerType => Some(Ordering.by((x: Any) => x.asInstanceOf[Int]))
      case StringType  => Some(Ordering.by((x: Any) => x.asInstanceOf[String]))
      case _           => None
    }
  }

  /** Exact connected components on the driver: union-find with path
    * halving over the collected (already materialized) edge set, then
    * per-component min-id relabel so cluster ids match the distributed
    * path bit-for-bit. */
  private def clustersOnDriver(edges: DataFrame)(
      implicit ord: Ordering[Any]): DataFrame = {
    import scala.collection.mutable
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = edges.sparkSession
    val parent = mutable.HashMap.empty[Any, Any]
    def find(x0: Any): Any = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) { // path halving: point x at its grandparent
        val gp = parent.getOrElse(p, p)
        parent(x) = gp
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    edges.collect().foreach { r =>
      val (ra, rb) = (find(r.get(0)), find(r.get(1)))
      if (ra != rb) parent(ra) = rb
    }
    val members = mutable.HashMap.empty[Any, mutable.ArrayBuffer[Any]]
    parent.keysIterator.foreach { n =>
      members.getOrElseUpdate(find(n), mutable.ArrayBuffer.empty) += n
    }
    val rows = members.valuesIterator.flatMap { ms =>
      // roots are member nodes too (a node with no parent entry only
      // appears via others pointing at it) — fold them back in
      val all = (ms :+ find(ms.head)).distinct
      val label = all.min
      val size = all.size.toLong
      all.map(id => Row(id, label, size))
    }.toSeq
    val keyType = edges.schema("src").dataType
    val schema = StructType(Seq(
      StructField("doc_id", keyType),
      StructField("cluster_id", keyType),
      StructField("cluster_size", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** The scale path: min-label propagation with pointer jumping (see
    * [[nearDupClusters]] scaladoc for the algorithm notes). */
  private def clustersDistributed(edges: DataFrame, maxIters: Int): DataFrame = {
    // Initial labels already fold the 1-hop neighborhood: label(id) =
    // min(id, min neighbor) from one aggregation over the (symmetric)
    // edge set — star-shaped components are final after THIS step, and
    // every chain starts one hop ahead of the identity initialization
    // (one fewer iteration of the loop below, i.e. one fewer Spark job).
    // Lazy checkpoint: round 1's Σlabel probe materializes it.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(first(col("src")), min(col("dst"))).as("label"))
      .localCheckpoint(false)
    var prevSum = Option.empty[Long]
    // A clean corpus (zero qualifying pairs) has no nodes: the Σlabel
    // probe below would read sum() over zero rows as null, so converge
    // immediately with the (empty) label table.
    var converged = labels.isEmpty
    var it = 0
    while (!converged && it < maxIters) {
      val viaEdges = labels.join(edges, col("id") === col("src"))
        .select(col("dst").as("id"), col("label"))
      // pointer jump: follow the current label one more hop. Every label
      // value is itself a node id (labels start as ids and only min-merge),
      // so the inner self-join is total.
      val viaPointer = labels.as("x")
        .join(labels.select(col("id").as("pid"), col("label").as("plabel")),
          col("x.label") === col("pid"))
        .select(col("x.id").as("id"), col("plabel").as("label"))
      // lazy checkpoint: the Σlabel probe below is the job that
      // materializes it, so each round costs ONE Spark job, not two
      val next = labels.union(viaEdges).union(viaPointer)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val labelSum = Option(next.agg(sum(col("label"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      converged = prevSum.contains(labelSum)
      prevSum = Some(labelSum)
      labels = next
      it += 1
    }
    require(converged, s"nearDupClusters did not converge in $maxIters rounds")
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    // no broadcast hint: `sizes` is one row PER CLUSTER — unbounded in
    // corpus size, so forcing it driver-side would OOM at web scale.
    // AQE picks the join strategy at runtime and broadcasts exactly when
    // the frame is actually small (the common case).
    labels.join(sizes, Seq("label"))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
  }

  /** Sequence packing for pretraining: concatenate documents in doc_id
    * order and split the token stream at fixed `budget` boundaries —
    * every document learns which training sequence(s) it lands in
    * (`seq_id`), where it starts (`offset_in_seq`), and how many
    * boundaries it straddles (`n_splits`).
    *
    * The global prefix sum runs as a TWO-LEVEL cumsum (the pattern any
    * global ordering needs at scale): range-partition on doc_id, window
    * cumsum within each range, then per-partition totals — a
    * #partitions-row frame — collect once and broadcast back as each
    * partition's base offset. No single-partition window over the
    * corpus, no driver traffic beyond one row per partition. Output is
    * invariant to the number of range buckets (asserted in DedupSpec). */
  def packSequences(documents: DataFrame, budget: Int = 2048,
      nBuckets: Int = 32): DataFrame = {
    require(budget >= 1, s"token budget $budget must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("doc_id"))
    val local = documents
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .repartitionByRange(nBuckets, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .withColumn("local_end", sum(col("n_tokens")).over(w))
      .localCheckpoint(false)
    val totals = local.groupBy(col("pid")).agg(max(col("local_end")).as("ptotal"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val bases = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _)).toMap // pid -> sum of earlier ranges
    val base = totals.map(_._1).foldRight(lit(0L)) { case (pid, rest) =>
      when(col("pid") === pid, lit(bases(pid))).otherwise(rest)
    }
    local
      .withColumn("start", base + col("local_end") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("start") / budget).as("seq_id"),
        (col("start") % budget).as("offset_in_seq"),
        (floor((col("start") + col("n_tokens") - 1) / budget)
          - floor(col("start") / budget)).as("n_splits"))
  }

  /** Fixed-length token chunking with overlap — the context-window
    * splitter for long documents (RAG/pretraining shape). Chunks start
    * every `chunkLen - overlap` tokens; the last chunk may be short.
    * Entirely row-local (sequence + explode + slice), so it scales as a
    * pure map — no shuffle at all. Chunk content rides as an md5 over
    * the joined tokens to keep rows narrow. */
  def docChunks(documents: DataFrame, chunkLen: Int = 32, overlap: Int = 8): DataFrame = {
    require(chunkLen >= 1 && overlap >= 0 && overlap < chunkLen,
      s"need 0 <= overlap($overlap) < chunkLen($chunkLen)")
    val stride = chunkLen - overlap
    val start = col("chunk_ix") * stride + 1
    documents.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0),
          floor((size(col("t")) - 1) / stride).cast("int"))).as("chunk_ix"))
      .select(col("doc_id"), col("chunk_ix"), start.as("start_tok"),
        size(slice(col("t"), start, lit(chunkLen))).as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("t"), start, lit(chunkLen)))).as("chunk_md5"))
  }

  /** [[docChunks]] via the custom [[graft.functions.TextExprs.ChunkRows]]
    * Catalyst `Generator` — the table-function extension point. Same
    * output bit-for-bit (asserted in TextExprsSpec and by sharing
    * `doc_chunks`'s oracle), but one pass over the token array per row
    * instead of sequence+explode carrying the whole array once per
    * chunk row before slicing. */
  def docChunksGen(documents: DataFrame, chunkLen: Int = 32, overlap: Int = 8): DataFrame = {
    TextExprs.register(documents.sparkSession)
    documents.select(col("doc_id"),
      TextExprs.chunkRows(tokens(col("text")), chunkLen, overlap))
  }

  /** PageRank over the near-dup similarity graph: which documents sit at
    * the CENTER of duplication clusters (high rank = many/central
    * near-dup relations — the doc to keep, or to inspect, when a
    * cluster is large). Fixed `iters` rounds of
    * `r' = (1−d) + d·Σ_incoming r/deg` over the symmetric pair graph —
    * a FIXED iteration count, so the whole computation is one linear
    * plan of join+agg stages (no driver loop, no convergence probes,
    * no checkpoints; Spark executes all rounds in a single job).
    * Every node of a symmetric graph has in-edges, so there is no
    * dangling-mass term. Per round the work is |edges| message rows —
    * the scalable message-passing shape. Deterministic: the only
    * float accumulation is a per-node sum, and ranks round to 6dp
    * (asserted against a DuckDB oracle running the same unrolled
    * rounds). */
  def nearDupPageRank(documents: DataFrame, k: Int = 3,
      minJaccard: Double = 0.8, maxDf: Int = 100, iters: Int = 5,
      // 0.75: exact in binary AND decimal, so the teleport constant is
      // the same bit pattern whether an engine parses it as DOUBLE or
      // DECIMAL (0.85 would differ by 1 ulp between the two routes)
      damping: Double = 0.75): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val pairs = nearDupJaccard(documents, k, minJaccard, maxDf)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint() // reused every round: materialize once
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iters) {
      ranks = ranks
        .join(deg, Seq("id"))
        .join(edges, col("id") === col("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("contrib"))
        .groupBy(col("id"))
        .agg((lit(1.0 - damping) + lit(damping) * sum(col("contrib"))).as("rank"))
    }
    ranks.select(col("id").as("doc_id"), round(col("rank"), 6).as("rank"))
  }

  /** Structural stats of the near-dup similarity graph, one row: node /
    * edge counts, max degree, triangle count. Triangles come from the
    * canonical a<b<c double join over the deduped upward edge list —
    * each triangle counted exactly once, two hash joins on node keys
    * over the SPARSE near-dup edge set (the standard distributed
    * triangle count; no per-node adjacency list ever materializes, so
    * a high-degree node costs join rows, not memory). The pair set is
    * EAGERLY checkpointed — the scalar branches run as concurrent
    * broadcast jobs, and off a lazy checkpoint each raced to
    * (re)materialize the candidate-pair index, multiplying the dominant
    * cost (measured: 14 s, 4× its family). Nodes/edges/max-degree fuse
    * into ONE aggregation pass (degree rollup, then a 1-row agg), so
    * only triangles run as a second job. */
  def nearDupGraphStats(documents: DataFrame, k: Int = 3,
      minJaccard: Double = 0.8, maxDf: Int = 100): DataFrame = {
    val pairs = nearDupJaccard(documents, k, minJaccard, maxDf)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val degStats = pairs.select(col("doc_a").as("id"))
      .union(pairs.select(col("doc_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .agg(count(lit(1)).as("n_nodes"),
        // each undirected pair contributes one endpoint row per side
        (coalesce(sum(col("deg")), lit(0L)) / 2).cast("long").as("n_edges"),
        max(col("deg")).as("max_degree"))
    val tri = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .join(pairs.select(col("doc_a").as("b2"), col("doc_b").as("c")),
        col("b") === col("b2"))
      .join(pairs.select(col("doc_a").as("a3"), col("doc_b").as("c3")),
        col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"))
    degStats.crossJoin(tri)
  }

  /** Adjacent-bigram collocation strength: lift = P(w₁w₂) / (P(w₁)·P(w₂))
    * — the exponential of PMI, kept as a RATIO so no transcendental log
    * (libm-dependent, engine-divergent in the last ulps) ever evaluates;
    * ranking by lift ≡ ranking by PMI. Bigrams extract row-locally
    * (transform over the token array — no window, no self-join), counts
    * reduce map-side, the corpus totals ride a broadcast 1-row cross
    * join. The unigram joins carry NO broadcast hint: a natural-language
    * vocabulary is KB–MB (Catalyst broadcasts it from stats anyway),
    * but a 100 TB web corpus's token table can reach 10⁸ rows — a
    * forced hint would push that through the driver, while the unhinted
    * plan degrades gracefully to a shuffle join on the token key. All
    * inputs to the final double expression are exact integers, so the
    * 6dp round is engine-portable. The classic collocation/vocab-merge
    * signal for tokenizer construction. */
  def vocabCollocations(documents: DataFrame, minCount: Int = 5,
      topN: Int = 50): DataFrame = {
    val toks = documents.select(tokens(col("text")).as("t"))
    val unis = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val bigr = toks.filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt_b"))
    val totals = unis.agg(sum(col("cu")).as("t_uni"))
      .crossJoin(bigr.agg(sum(col("cnt_b")).as("t_bi")))
    bigr.filter(col("cnt_b") >= minCount)
      .join(unis.select(col("w").as("w1"), col("cu").as("cu1")), Seq("w1"))
      .join(unis.select(col("w").as("w2"), col("cu").as("cu2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("cnt_b"),
        round((col("cnt_b").cast("double") * col("t_uni") * col("t_uni")) /
          (col("t_bi").cast("double") * col("cu1") * col("cu2")), 6).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Deterministic hash-stratified sampling: keep a document iff the
    * first 16 bits of `md5(doc_id)` mod 100 fall under its stratum's
    * percentage — the standard reproducible corpus downsampler (no RNG
    * state, stable under re-runs and repartitioning, engine-portable).
    * Strata come from the `lang` column; unlisted languages get
    * `defaultPct`. */
  def sampleStratified(documents: DataFrame,
      rates: Map[String, Int] = Map("en" -> 50, "de" -> 25),
      defaultPct: Int = 10): DataFrame = {
    val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("int") % 100).as("sample_bucket")
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (lang, p)) =>
      when(col("lang") === lang, lit(p)).otherwise(acc)
    }
    documents.select(col("doc_id"), col("lang"), col("source"), bucket)
      .filter(col("sample_bucket") < pct)
  }

  /** End-to-end corpus curation: the composed keep/drop decision a
    * pretraining data pipeline actually ships — per (non-eval) document,
    * four independent flags and their conjunction:
    *
    *  - `quality_ok`: [[docQuality]] score ≥ 0.75 (≥ 3 of 4 rules pass)
    *  - `canonical`: the document IS the min-id member of its exact
    *    [[fingerprint]] group (others are byte-dup copies)
    *  - `neardup_ok`: not dropped by the greedy [[nearDupKeep]] rule
    *    (never the larger id of a qualifying jaccard pair)
    *  - `clean`: zero 5-gram collisions with the eval slice
    *    ([[decontaminate]], doc_id % 10 = 0 plays the benchmark)
    *
    * Dedup flags are computed CORPUS-WIDE (an eval copy of a document
    * still disqualifies the train copy from canonical), contamination
    * only against the eval slice. Every stage is a doc_id-keyed frame,
    * so the flag joins co-partition; nothing joins wider than
    * (doc_id, flag). */
  def corpusCuration(documents: DataFrame): DataFrame = {
    TextExprs.register(documents.sparkSession)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    // ONE persisted SIGNATURE pass feeds all four flag stages (round-5
    // plan audit: quality, canonical, near-dup, and decontamination each
    // re-scanned and re-tokenized `documents`). The persisted frame
    // holds only what the stages consume — four quality scalars, the
    // md5 fingerprint, and the two shingle-hash sets (k=3 near-dup,
    // k=5 decontamination) — so the expensive row-local work (regex
    // normalize, tokenize, per-shingle md5) runs exactly once per doc
    // and the cache stores compact longs, never text or token arrays.
    // Dataset persist defaults to MEMORY_AND_DISK (spills, never
    // evicts-and-recomputes); Bench/CorpusRun session hygiene frees it.
    val tok = tokenized(documents)
    val norm = col("norm")
    val nToks = size(col("toks"))
    val sig = tok.select(
      col("doc_id"),
      nToks.as("n_tokens"),
      round(hitCount(col("toks"), StopwordsEn).cast("double") / nToks, 6)
        .as("stopword_ratio"),
      round(size(regexp_extract_all(norm, lit("[^a-z0-9 ]"), lit(0))).cast("double")
        / greatest(length(norm), lit(1)), 6).as("punct_ratio"),
      round(size(regexp_extract_all(norm, lit("[0-9]"), lit(0))).cast("double")
        / greatest(length(norm), lit(1)), 6).as("digit_ratio"),
      md5(norm).as("fp"),
      TextExprs.wordShingleHashes(col("toks"), 3).as("sh3"),
      TextExprs.wordShingleHashes(col("toks"), 5).as("sh5")).persist()
    val corpusSig = sig.filter(col("doc_id") % 10 =!= 0)
    val evalSig = sig.filter(col("doc_id") % 10 === 0)
    // same arithmetic as docQuality's quality_score (4-rule mean,
    // rounded) >= 0.75 — the indicators and rounding are bit-identical
    val quality = corpusSig.select(col("doc_id"),
      (round((col("n_tokens").between(20, 100000).cast("double")
        + (col("stopword_ratio") >= 0.001).cast("double")
        + (col("punct_ratio") <= 0.2).cast("double")
        + (col("digit_ratio") <= 0.3).cast("double")) / 4, 6) >= 0.75)
        .cast("int").as("quality_ok"))
    val canon = sig.select(col("doc_id"), col("fp"))
      .withColumn("canonical",
        (col("doc_id") === min(col("doc_id")).over(w)).cast("int"))
      .select(col("doc_id"), col("canonical"))
    val losers = nearDupJaccardSh(sig.select(col("doc_id"), col("sh3").as("sh")))
      .select(col("doc_b").as("doc_id")).distinct().withColumn("nd_drop", lit(1))
    val clean = decontaminateSh(
      corpusSig.select(col("doc_id"), col("sh5").as("sh")),
      evalSig.select(col("doc_id"), col("sh5").as("sh")))
      .select(col("doc_id"), (col("contaminated") === 0).cast("int").as("clean"))
    quality
      .join(canon, Seq("doc_id"))
      .join(clean, Seq("doc_id"))
      .join(losers, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_ok"), col("canonical"),
        when(col("nd_drop").isNull, 1).otherwise(0).as("neardup_ok"), col("clean"))
      .withColumn("keep",
        col("quality_ok") * col("canonical") * col("neardup_ok") * col("clean"))
  }

  /** Fused text+vector curation: [[corpusCuration]]'s verdict AND
    * surviving the embedding-side [[VectorOps.semanticDedup]] — the two
    * independent dedup modalities (lexical shingles, semantic cosine)
    * joined on the shared doc/vec id. One doc_id-keyed LEFT join; docs
    * whose embedding was semantically deduped away flip to keep=0 even
    * when every text signal passed. */
  def corpusCurationSemantic(documents: DataFrame, embeddings: DataFrame,
      k: Int = 8, iters: Int = 2, minCos: Double = 0.45): DataFrame = {
    val text = corpusCuration(documents)
      .select(col("doc_id"), col("keep").as("text_keep"))
    val sem = VectorOps.semanticDedup(embeddings, k, iters, minCos)
      .select(col("vec_id").as("doc_id"), lit(1).as("semantic_ok"))
    text.join(sem, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text_keep"),
        coalesce(col("semantic_ok"), lit(0)).as("semantic_ok"))
      .withColumn("keep", col("text_keep") * col("semantic_ok"))
  }

  /** Fixed-SIZE deterministic sample per group: exactly `nPer` documents
    * per language (fewer if the stratum is smaller), chosen by md5 hash
    * order — "k examples per class", reproducible across runs and
    * engines. Runs through the bounded [[graft.functions.TopK]]
    * Aggregator, so each task ships ≤ `nPer` rows per language into the
    * shuffle — no per-group sort of the full corpus, the same scale
    * shape as [[graft.ops.EventOps.topKPerTypeAgg]]. Output includes the
    * in-sample rank so downstream can take any prefix. */
  def samplePerGroup(documents: DataFrame, nPer: Int = 20): DataFrame = {
    require(nPer >= 1, s"sample size $nPer must be >= 1")
    val pick = udaf(graft.functions.TopK.hashSampleK(nPer))
    documents
      .select(col("lang"), md5(col("doc_id").cast("string")).as("hk"), col("doc_id"))
      .groupBy(col("lang"))
      .agg(pick(col("hk"), col("doc_id")).as("picked"))
      .select(col("lang"), posexplode(col("picked")).as(Seq("i", "p")))
      .select(col("lang"), col("p.doc_id").as("doc_id"),
        (col("i") + 1).cast("int").as("sample_rank"))
  }

  /** Feature-hashing document embedding (the hashing trick): each token
    * maps to dimension `md5₆₀(token) mod dims` with a ±1 sign drawn
    * from an independent hash bit, weights = signed term frequency —
    * the deterministic, vocabulary-free text→vector bridge (sparse
    * (doc, dim, weight) rows; zero-weight dims stay absent). No trained
    * state, no driver round-trip, two shuffles ((doc, token) grain then
    * (doc, dim)); the portable 60-bit md5 means the DuckDB oracle
    * hashes identically. */
  def docEmbedHash(documents: DataFrame, dims: Int = 64): DataFrame = {
    require(dims >= 1, s"dims=$dims must be >= 1")
    val hk = conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long")
    documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), pmod(hk, lit(dims)).cast("int").as("dim"),
        // sign bit comes from hk >> 32 — independent of the dim modulus
        ((pmod(shiftright(hk, 32), lit(2)) * 2 - 1) * col("tf")).as("contrib"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("contrib")).as("weight"))
      .filter(col("weight") =!= 0)
  }

  /** Top-k retrieval over the [[docEmbedHash]] sparse vectors — the
    * cheap text-only proxy for dense-embedding similarity ("more like
    * this" without an embedding model). Sparse cosine: one dim-keyed
    * join between the (tiny, broadcastable) query slice and the hashed
    * index, exact integer dot products, per-query top-k window over the
    * candidate set. [[RetrievalEval.metrics]] scores this ranking
    * against dense truth — that pairing is the registered evaluation
    * query. */
  def searchHashedTopK(documents: DataFrame, nQueries: Int = 10,
      kTop: Int = 10, dims: Int = 64): DataFrame = {
    require(nQueries >= 1 && kTop >= 1, s"bad nQueries=$nQueries / kTop=$kTop")
    val he = docEmbedHash(documents, dims)
    val norms = he.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("weight") * col("weight")).cast("double")).as("nrm"))
    val q = he.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("dim"), col("weight").as("qw"))
    val dots = broadcast(q).join(he, Seq("dim"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qw") * col("weight")).as("dot"))
    val qn = norms.select(col("doc_id").as("query_id"), col("nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("doc_id"))
    dots
      .join(broadcast(qn), Seq("query_id"))
      .join(norms, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"),
        round(col("dot").cast("double") / (col("qn") * col("nrm")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
  }

  /** Domain-mixture sampling weights over `lang`: per-domain doc/token
    * counts and the temperature-scaled mixture probability
    * p_i ∝ n_tokens_i^α with α = 1/2 — the standard rebalancing between
    * proportional (α=1) and uniform (α=0) domain sampling when
    * assembling a multi-domain pretraining mix (exponent-smoothed
    * sampling, mBERT-style). α is pinned to 1/2 deliberately: x^0.5 is
    * `sqrt`, IEEE-754 correctly rounded in every engine, where a general
    * `pow(x, α)` is only ~1-ulp and could flip the 6dp rounding
    * cross-engine. The irrational weights pass through DECIMAL(28,10)
    * before totalling so the normalizer is an exact, order-independent
    * sum. Two aggregations, both output-tiny; the 1-row total broadcasts
    * back onto the |domains|-row frame. */
  def corpusMixture(documents: DataFrame): DataFrame = {
    val counts = documents
      .select(col("lang"), size(tokens(col("text"))).as("nt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val weighted = counts.withColumn("w",
      sqrt(col("n_tokens").cast("double")).cast("decimal(28,10)"))
    val total = weighted.agg(sum(col("w")).as("wt"))
    weighted.crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("w").cast("double") / col("wt").cast("double"), 6)
          .as("mix_weight"))
  }

  /** Quality-weighted Bernoulli sampling, derandomized: a document is
    * kept iff u(doc) < its [[docQuality]] score, where
    * u = md5₆₀(doc_id)/2⁶⁰ is a uniform [0,1) hash draw. Acceptance
    * probability per document equals its score exactly, but the decision
    * is a pure function of doc_id — reruns, repartitions, and other
    * engines keep THE SAME documents (no `rand()`, which would make the
    * sample non-reproducible and break retry idempotence at scale).
    * Row-local on top of the docQuality scan; 2⁶⁰ is a power of two, so
    * the division is exact-by-scaling in IEEE doubles. */
  /** The shared uniform-in-[0,1) hash every derandomized decision in this
    * file keys on: md5₆₀(id)/2⁶⁰ — one definition, so the sampler and the
    * splitter can never diverge. 2⁶⁰ is a power of two: the division is
    * exact-by-scaling in IEEE doubles. */
  private def md5Uniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(1152921504606846976.0)

  def sampleWeighted(documents: DataFrame): DataFrame =
    docQuality(documents)
      .select(col("doc_id"), col("quality_score"),
        md5Uniform(col("doc_id")).as("u"))
      .filter(col("u") < col("quality_score"))

  /** Deterministic train/val/test assignment: each document's split is a
    * pure function of doc_id (md5 60-bit uniform → cumulative weight
    * buckets), so reruns, repartitions, engines, and INCREMENTAL ingest
    * all agree — a document added tomorrow lands in the same split it
    * would have landed in today, and no doc ever migrates between splits
    * when the corpus grows (the property `rand()`-based splitting
    * destroys). Row-local, zero shuffle. Weights need not be normalized. */
  val DefaultSplitWeights: Seq[(String, Double)] =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** The cumulative-bucket CASE over a pre-projected `u` column —
    * shared by [[splitAssign]] and the fused [[splitDriftPsi]] scan.
    * `u` must be projected ONCE upstream: inlining the md5 subtree into
    * every when-branch would re-run it per compared bound (CaseWhen
    * predicates don't reliably share subexpressions). */
  private def splitFromU(weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), s"bad weights: $weights")
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    weights.zip(cum).init.foldRight(lit(weights.last._1)) {
      case (((name, _), bound), rest) => when(col("u") < bound, name).otherwise(rest)
    }
  }

  def splitAssign(documents: DataFrame,
      weights: Seq[(String, Double)] = DefaultSplitWeights): DataFrame =
    documents.select(col("doc_id"), col("lang"), md5Uniform(col("doc_id")).as("u"))
      .select(col("doc_id"), col("lang"), splitFromU(weights).as("split"))

  /** Split-hygiene audit: near-duplicate pairs whose members landed in
    * DIFFERENT train/val/test splits — every such pair leaks training
    * signal into a holdout (the eval numbers go soft even though
    * documents-grain decontamination passed, because the splitter hashes
    * doc_id, not content). Composes the near-dup pair machinery with the
    * split assignment; output is one row per unordered split pair with
    * the leaked-pair count and the worst jaccard. Fixing the leak is
    * [[nearDupKeep]]/cluster-aware splitting — this operator is the
    * detector that says you need it. */
  def splitLeakage(documents: DataFrame, minJaccard: Double = 0.8,
      weights: Seq[(String, Double)] = DefaultSplitWeights): DataFrame =
    leakageOf(documents, splitAssign(documents, weights), minJaccard)

  /** [[splitLeakage]] against an arbitrary (doc_id, split) assignment —
    * how the spec proves [[splitAssignClusterAware]] leaks nothing. */
  private[graft] def leakageOf(documents: DataFrame, assignment: DataFrame,
      minJaccard: Double): DataFrame = {
    val splits = assignment.select(col("doc_id"), col("split"))
    nearDupJaccard(documents, minJaccard = minJaccard)
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .groupBy(
        least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"))
      .agg(count(lit(1)).as("n_leaked_pairs"), max(col("jaccard")).as("max_jaccard"))
  }

  /** Cluster-aware split assignment — the FIX [[splitLeakage]] calls
    * for: the split key is the near-dup CLUSTER id (min member) when the
    * doc belongs to one, its own id otherwise, so every near-dup cluster
    * lands whole in one split and cross-split leakage at the same
    * jaccard threshold is structurally zero. Costs one clusters pass
    * (bounded pair machinery + CC) on top of the hash assignment; the
    * split distribution stays ≈ weights because clusters are tiny
    * relative to the corpus. */
  def splitAssignClusterAware(documents: DataFrame,
      weights: Seq[(String, Double)] = DefaultSplitWeights,
      minJaccard: Double = 0.8,
      precomputedClusters: Option[DataFrame] = None): DataFrame = {
    val clusters = precomputedClusters
      .getOrElse(nearDupClusters(documents, minJaccard = minJaccard))
      .select(col("doc_id"), col("cluster_id"))
    documents.select(col("doc_id"), col("lang"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        md5Uniform(coalesce(col("cluster_id"), col("doc_id"))).as("u"))
      .select(col("doc_id"), col("lang"), splitFromU(weights).as("split"))
  }

  /** Split-drift check: Population Stability Index of the quality-score
    * distribution between the train split and each holdout split — the
    * standard "did my deterministic splitter accidentally bias a
    * holdout" audit a curation pipeline runs before shipping an eval
    * set. Bins are the discrete [[docQuality]] score values; both
    * per-split distributions are add-α smoothed over the corpus-wide
    * bin set (so a bin empty on one side contributes a finite, stable
    * term instead of ±∞), and
    * PSI = Σ_bins (p − q) · ln(p / q), rounded to 6dp after a
    * DECIMAL(28,12) sum. PSI < 0.1 is the classic "no shift" band —
    * the md5 splitter should land ≈ 0.
    *
    * Plan: one corpus pass for (split, score) counts, one tiny
    * aggregation per split — the joined frame is |bins × splits| rows
    * (KB); corpus size never enters a join. */
  def splitDriftPsi(documents: DataFrame, alpha: Double = 0.5,
      splits: Option[DataFrame] = None): DataFrame = {
    require(alpha > 0, s"alpha=$alpha must be > 0 (unsmoothed PSI is infinite on empty bins)")
    // split and score are BOTH row-local functions of the document, so
    // the default path computes them in ONE corpus scan — a custom
    // split frame is the only case that pays a doc_id join
    val quality = docQuality(documents).select(col("doc_id"), col("quality_score"))
    val scored = splits match {
      case Some(df) => df.select(col("doc_id"), col("split")).join(quality, Seq("doc_id"))
      case None => quality
        .withColumn("u", md5Uniform(col("doc_id")))
        .withColumn("split", splitFromU(DefaultSplitWeights))
        .drop("u")
    }
    // The downstream grid needs cnt from FOUR branches (bins, per-split
    // totals, the bin count, the grid join) — left as a plan subtree,
    // each branch re-runs the corpus scan and its regex features. cnt
    // is |splits × bins| rows (score has ≤ 5 distinct values), so it
    // collects to a KB literal and the corpus is scanned ONCE — the
    // same gated-materialization discipline as the k-means centroids.
    val spark = documents.sparkSession
    val cntLocal = scored.groupBy(col("split"), col("quality_score"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val cnt = spark.createDataFrame(cntLocal).toDF("split", "quality_score", "c")
    val bins = cnt.select(col("quality_score")).distinct()
    val splitsTot = cnt.groupBy(col("split")).agg(sum(col("c")).as("n"))
    val k = bins.agg(count(lit(1)).as("k"))
    // dense (split × bin) grid so empty bins smooth instead of vanish
    val grid = splitsTot.crossJoin(bins)
      .join(cnt, Seq("split", "quality_score"), "left_outer")
      .crossJoin(broadcast(k))
      .select(col("split"), col("quality_score"),
        ((coalesce(col("c"), lit(0L)) + lit(alpha))
          / (col("n") + lit(alpha) * col("k"))).as("p"))
    val train = grid.filter(col("split") === "train")
      .select(col("quality_score"), col("p").as("p_train"))
    grid.filter(col("split") =!= "train")
      .join(train, Seq("quality_score"))
      .select(col("split"), col("quality_score"),
        ((col("p") - col("p_train")) * log(col("p") / col("p_train")))
          .cast("decimal(28,12)").as("term"))
      .groupBy(col("split"))
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
  }

  /** BM25 keyword retrieval: score each document against a fixed bag of
    * query `terms`, return the global top-`kTop`. Robertson–Spärck Jones
    * BM25 with idf = ln(1 + (N − df + ½)/(df + ½)).
    *
    * Plan shape: per-doc length and (doc, matched-term) tf both derive
    * from ONE corpus explode; the literal term filter runs BEFORE the tf
    * aggregation, so scoring works on |docs × |terms|| rows at most. The
    * df table and the (N, total-token) stats are output-tiny and
    * broadcast. Per-term scores pass through DECIMAL(28,12) so the
    * per-doc sum is order-exact; the final top-k is an orderBy+limit —
    * Spark plans TakeOrdered (per-partition heaps + driver merge of k),
    * never a full global sort. */
  def searchBm25(documents: DataFrame,
      terms: Seq[String] = Seq("join", "vector", "stream"),
      k1: Double = 1.2, b: Double = 0.75, kTop: Int = 10): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    require(kTop >= 1, s"kTop=$kTop must be >= 1")
    val ex = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val dl = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = ex.filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val avgdl = col("total_tokens").cast("double") / col("n_docs")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val score = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))
    tf.join(broadcast(dfreq), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), score.cast("decimal(28,12)").as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_terms_matched"),
        round(sum(col("s")).cast("double"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(kTop)
  }

  /** Hybrid retrieval: the lexical [[searchBm25]] ranking fused with an
    * embedding-cosine ranking by Reciprocal Rank Fusion
    * (Cormack et al. 2009): score(d) = Σ_arms 1/(kRrf + rank_arm(d)),
    * summed over the arms that retrieved d at all. RRF needs no score
    * calibration between arms — only ranks — which is why it is the
    * standard first fusion for lexical+dense retrieval.
    *
    * The query is "more-like-this" on `queryVecId`: the lexical arm
    * scores the fixed `terms` bag, the dense arm ranks by cosine to
    * that document's embedding (itself excluded). Each arm retrieves a
    * `kPool`-deep candidate list; fusion happens on the union.
    *
    * Scale shape: each arm ends in an orderBy+limit — TakeOrdered
    * (per-partition heaps + driver merge), never a global sort — so the
    * fusion join touches 2×kPool rows regardless of corpus size. The
    * dense arm here is the brute-force scorer (one row-local cosine
    * projection per doc); at real scale the same fusion runs over
    * [[VectorOps.annIvf]]/[[VectorOps.annLsh]] candidates instead —
    * the arms are interchangeable because RRF only consumes ranks. */
  def searchHybrid(documents: DataFrame, embeddings: DataFrame,
      terms: Seq[String] = Seq("join", "vector", "stream"),
      queryVecId: Long = 0L, kPool: Int = 50, kRrf: Int = 60,
      kTop: Int = 10): DataFrame = {
    require(kPool >= 1 && kTop >= 1, s"need kPool($kPool) >= 1 and kTop($kTop) >= 1")
    require(kRrf >= 1, s"kRrf=$kRrf must be >= 1")
    import graft.functions.VecDot
    import org.apache.spark.sql.expressions.Window
    VecDot.register(documents.sparkSession)
    // both arm pools are kPool rows: the rank window is a driver-sized
    // single partition ON PURPOSE (post-TakeOrdered), not a scale risk
    val lex = searchBm25(documents, terms, kTop = kPool)
      .withColumn("rank_lex",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank_lex"))
    val p = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("vd"))
    val qv = p.filter(col("vec_id") === queryVecId).select(col("vd").as("qd"))
    val sem = p.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(VecDot(col("vd"), col("qd"))
          / (sqrt(VecDot(col("vd"), col("vd"))) * sqrt(VecDot(col("qd"), col("qd")))),
          6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(kPool)
      .withColumn("rank_sem",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank_sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_sem"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_lex")), lit(0.0))
            + coalesce(lit(1.0) / (lit(kRrf) + col("rank_sem")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(kTop)
  }

  /** Unigram cross-entropy under the corpus's own language model — the
    * perplexity-style quality signal (CCNet-shape: score text against an
    * LM; here the LM is the corpus unigram distribution itself, additive-
    * smoothed: p(tok) = (c+α)/(T+αV)). Low cross-entropy = typical text;
    * high = rare-token soup (boilerplate, noise, wrong language).
    *
    * Plan: corpus token counts (one shuffle), then a token-keyed join at
    * (doc, DISTINCT token) grain — tf multiplies the per-type nll, so
    * the join moves |doc-vocab| rows, not |tokens|. The (T, V) scalars
    * ride as a broadcast 1-row aggregate. Per-type contributions pass
    * through DECIMAL(28,12) so each doc's sum is order-exact. */
  def docCrossEntropy(documents: DataFrame, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha=$alpha must be > 0 (unsmoothed would log(0) on ties)")
    val ex = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = ex.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val counts = ex.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("t"), count(lit(1)).as("v"))
    tf.join(counts, Seq("token"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("tf"),
        (col("tf") * -log((col("c") + lit(alpha)) / (col("t") + lit(alpha) * col("v"))))
          .cast("decimal(28,12)").as("nll"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("nll")).cast("double") / sum(col("tf")), 6).as("cross_entropy"))
  }

  /** Bigram language-model cross-entropy per document — the proper
    * perplexity-style quality filter (the unigram [[docCrossEntropy]]
    * scores vocabulary typicality; this scores SEQUENCE typicality:
    * shuffled word soup has normal unigram stats but rare transitions).
    * The corpus itself is the model: conditional probabilities are
    * add-α smoothed over the corpus bigram/unigram tables,
    * p(w₂|w₁) = (c₂(w₁,w₂)+α) / (c₁(w₁)+αV).
    *
    * Plan: corpus bigram + unigram counts (each one shuffle with
    * map-side combine), then joins at (doc, DISTINCT bigram) grain —
    * tf multiplies the per-type nll, so the join moves |doc bigram
    * vocabulary| rows, not |tokens|. The vocabulary-size scalar rides
    * as a broadcast 1-row aggregate; per-type contributions pass
    * through DECIMAL(28,12) so each doc's sum is order-exact (same
    * discipline as [[docCrossEntropy]] — ln's last-ulp noise is below
    * the 12dp cast). Docs with <2 tokens have no bigrams and drop out. */
  def docPerplexityBigram(documents: DataFrame, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha=$alpha must be > 0 (unsmoothed would log(0))")
    val t = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    val bi = t.select(col("doc_id"), explode(when(size(col("t")) >= 2,
      zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val btf = bi.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = documents
      .select(explode(tokens(col("text"))).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    btf.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("tf"),
        (col("tf") * -log((col("c2") + lit(alpha))
          / (col("c1") + lit(alpha) * col("v"))))
          .cast("decimal(28,12)").as("nll"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / sum(col("tf")), 6)
          .as("bigram_cross_entropy"))
  }

  /** Interpolated trigram cross-entropy per document — the sequence-
    * typicality score one order above [[docPerplexityBigram]], with the
    * standard Jelinek–Mercer linear interpolation as the backoff:
    * p(w₃|w₁,w₂) = λ₃·p₃ + λ₂·p₂ + λ₁·p₁, each component add-α smoothed
    * over the corpus count tables
    * (p₃ = (c₃+α)/(c₂ᶜᵗˣ+αV), p₂ = (c₂+α)/(c₁(w₂)+αV),
    * p₁ = (c₁(w₃)+α)/(N+αV)). The interpolation is why the trigram
    * order is usable at all: most trigrams of an unseen document are
    * corpus singletons or absent, and the λ₂/λ₁ mass keeps their
    * probability anchored to observed lower-order statistics instead of
    * the α floor — scrambled text (common words, novel transitions)
    * still scores high CE while natural-but-unseen phrasing does not.
    *
    * Plan: corpus trigram/bigram/unigram count tables (one shuffle each
    * with map-side combine), then joins at (doc, DISTINCT trigram)
    * grain — tf multiplies per-type nll, so the joins move |doc trigram
    * vocabulary| rows, not |tokens|. The bigram table is joined twice
    * (as (w₁,w₂) context and (w₂,w₃) bigram), the unigram table twice
    * (w₂ denominator, w₃ numerator); the (N, V) scalars ride as one
    * broadcast 1-row aggregate. Per-type contributions go through
    * DECIMAL(28,12) before the per-doc sum (order-exact; ln's last-ulp
    * noise is below the 12dp cast — same discipline as the bigram).
    * Docs with <3 tokens have no trigrams and drop out. */
  def docPerplexityTrigram(documents: DataFrame, alpha: Double = 0.5,
      l3: Double = 0.6, l2: Double = 0.3, l1: Double = 0.1): DataFrame = {
    require(alpha > 0, s"alpha=$alpha must be > 0 (unsmoothed would log(0))")
    require(l3 >= 0 && l2 >= 0 && l1 >= 0 && math.abs(l3 + l2 + l1 - 1.0) < 1e-9,
      s"interpolation weights ($l3, $l2, $l1) must be non-negative and sum to 1")
    val t = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    val tri = t.filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("t")) - 2),
        i => struct(
          element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2"),
          element_at(col("t"), i + 2).as("w3")))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
    val bi = t.filter(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
    val ttf = tri.groupBy(col("w1"), col("w2"), col("w3"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val c3 = tri.groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c3"))
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = documents.select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    // one broadcast row: vocabulary size and corpus token count
    val nv = c1.agg(count(lit(1)).as("v"), sum(col("c1")).as("n_tok"))
    val ctx = c2.select(col("w1"), col("w2"), col("c2").as("c2ctx"))
    val big = c2.select(col("w1").as("w2"), col("w2").as("w3"), col("c2").as("c2bi"))
    val uw2 = c1.select(col("w").as("w2"), col("c1").as("c1w2"))
    val uw3 = c1.select(col("w").as("w3"), col("c1").as("c1w3"))
    val p3 = (col("c3") + lit(alpha)) / (col("c2ctx") + lit(alpha) * col("v"))
    val p2 = (col("c2bi") + lit(alpha)) / (col("c1w2") + lit(alpha) * col("v"))
    val p1 = (col("c1w3") + lit(alpha)) / (col("n_tok") + lit(alpha) * col("v"))
    ttf
      .join(c3, Seq("w1", "w2", "w3"))
      .join(ctx, Seq("w1", "w2"))
      .join(big, Seq("w2", "w3"))
      .join(uw2, Seq("w2"))
      .join(uw3, Seq("w3"))
      .crossJoin(broadcast(nv))
      .select(col("doc_id"), col("tf"),
        (col("tf") * -log(lit(l3) * p3 + lit(l2) * p2 + lit(l1) * p1))
          .cast("decimal(28,12)").as("nll"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_trigrams"),
        round(sum(col("nll")).cast("double") / sum(col("tf")), 6)
          .as("trigram_cross_entropy"))
  }

  /** Duplicated-passage detection — chunk-grain exact dedup: chunk every
    * document ([[docChunks]] windows), then keep chunk hashes appearing
    * in ≥ 2 DISTINCT documents. Whole-doc dedup misses these (two mostly
    * different documents sharing one boilerplate paragraph); substring-
    * level duplication is what drives memorization in trained models
    * (Lee et al. 2021, "Deduplicating Training Data…"). One
    * distinct + one count aggregation on the 32-char hash key — the
    * by-construction-scalable shape; no pairwise joins. */
  def dupPassages(documents: DataFrame, chunkLen: Int = 32,
      overlap: Int = 8): DataFrame =
    docChunks(documents, chunkLen, overlap)
      // full windows only: ragged tail chunks are 1..chunkLen-1 tokens,
      // and a 2-token tail colliding across documents is noise, not a
      // duplicated passage
      .filter(col("n_chunk_tokens") === chunkLen)
      .select(col("chunk_md5"), col("doc_id"))
      // overlapping windows can emit the same chunk twice within one doc
      .distinct()
      .groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)

  /** Top TF-IDF terms per document: term frequency from one
    * (doc, token) aggregation, document frequency from a token-grain
    * aggregation over the same exploded frame, smoothed IDF
    * `ln((N+1)/(df+1))`, then a per-document top-k window. Two shuffles
    * (doc×token grain, token grain) + one token-keyed join; the corpus
    * size N rides along as a broadcast 1-row aggregate, not a driver
    * round-trip. */
  def docTopTerms(documents: DataFrame, kTop: Int = 5): DataFrame = {
    val ex = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = ex.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    // tf is already (doc, token)-distinct: df counts ITS rows per token —
    // no second explode + distinct pass over the corpus
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_total") + 1).cast("double") / (col("df") + 1)), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= kTop)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"), col("rn"))
  }

  /** Corpus vocabulary: top-k tokens by occurrence (document frequency
    * alongside) — explode + count, one shuffle at token grain with
    * map-side combine, then a global top-k (TakeOrdered, no full sort). */
  def vocabTopK(documents: DataFrame, k: Int = 100): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)

  /** Top-k vocabulary coverage curve — the tokenizer-budget readout
    * ("what fraction of corpus token mass does a k-entry vocab cover?").
    * One token-count aggregate (vocabulary-sized, map-side combined);
    * the ranking then touches only the max(ks) CANDIDATE tokens via
    * orderBy+limit — Spark plans TakeOrdered (per-partition heaps +
    * driver merge of max(ks) rows), so no unpartitioned window ever
    * sees the full vocabulary (a web corpus's distinct-token set is
    * itself hundreds of millions of rows — the one frame here that is
    * NOT small). Total token mass comes from a separate scalar
    * aggregate over all counts; one fold evaluates every k at once and
    * unpivots via stack. Ties rank by (count desc, token asc) so the
    * curve is engine-reproducible. */
  def vocabCoverage(documents: DataFrame, ks: Seq[Int] = Seq(10, 50, 100)): DataFrame = {
    val counts = documents
      .select(explode(tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = counts
      .orderBy(col("cnt").desc, col("token")).limit(ks.max)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cnt").desc, col("token"))))
    def cov(k: Int) =
      sum(when(col("rk") <= k, col("cnt")).otherwise(lit(0L))).as(s"cov_$k")
    val covs = ranked.agg(cov(ks.head), ks.tail.map(cov): _*)
    val agg = covs.crossJoin(
      counts.agg(sum(col("cnt")).as("total")))
    val stackArgs = ks.map(k =>
      s"$k, cov_$k, round(cov_$k / CAST(total AS DOUBLE), 6)").mkString(", ")
    agg.selectExpr("total AS total_tokens",
        s"stack(${ks.size}, $stackArgs) AS (k, covered, coverage)")
      .select(col("k"), col("covered"), col("total_tokens"), col("coverage"))
  }

  /** MinHash+LSH near-dup pairs: shingle → `numPerms` minhash signature →
    * `bands` band keys → candidates share a band bucket → filter by the
    * signature-estimated jaccard. No pairwise work outside shared
    * buckets; band keys are 8 longs/doc, so the shuffle is tiny compared
    * to the shingle join. Bands/perms give an S-curve threshold of
    * (1/bands)^(bands/numPerms) ≈ 0.7 for the defaults. */
  def nearDupMinhash(documents: DataFrame, k: Int = 3, numPerms: Int = 64,
      bands: Int = 8, minEstJaccard: Double = 0.8): DataFrame = {
    TextExprs.register(documents.sparkSession)
    val sig = documents
      .select(col("doc_id"), TextExprs.wordShingles(tokens(col("text")), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), TextExprs.minhashSig(col("sh"), numPerms).as("sig"))
    val banded = sig.select(
      col("doc_id"), col("sig"),
      explode(minhashBands(col("sig"), bands, numPerms)).as("band"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        round(minhashEstimate(col("sig_a"), col("sig_b")), 6).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** SimHash near-dup pairs: 64-bit signatures, banded blocking (a pair
    * with hamming < bands shares ≥1 of the `bands` bit-slices — the
    * pigeonhole guarantee), exact hamming check on candidates. */
  def nearDupSimhash(documents: DataFrame, bands: Int = 8,
      maxHamming: Int = 5): DataFrame = {
    require(maxHamming < bands, "pigeonhole: need maxHamming < bands for exact recall")
    TextExprs.register(documents.sparkSession)
    val sig = documents.select(col("doc_id"), TextExprs.simhash64(tokens(col("text"))).as("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(simhashBands(col("sig"), bands)).as("band"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Corpus snapshot diff: per-status document and char counts between
    * two versions of a corpus, keyed on `doc_id` with content compared
    * by fingerprint — the dataset-versioning audit every refreshed
    * training corpus needs ("what changed between crawl N and N+1").
    * One full-outer join on the key, then a 4-row aggregate: no content
    * ever crosses the shuffle (md5 fingerprints travel instead of
    * text), so the plan is key-join-shaped at any corpus size. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("fp_old"),
      length(col("text")).cast("long").as("chars_old"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("fp_new"),
      length(col("text")).cast("long").as("chars_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .otherwise("changed").as("status"),
        coalesce(col("chars_new"), col("chars_old")).as("chars"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("n_chars"))
      .orderBy(col("status"))
  }

  /** PII scan + redaction audit: per-document counts of email / phone /
    * IPv4 / 16-digit-card patterns and the fingerprint of the redacted
    * text — the pre-release privacy pass of a training pipeline.
    * Entirely row-local (regex projections, zero shuffle). Patterns are
    * deliberately lookaround-free and written with explicit character
    * classes so Java regex (Spark) and RE2 (the DuckDB oracle) agree
    * byte-for-byte. */
  def docPii(documents: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"
    val ipv4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val card = "[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}"
    def hits(pat: String) = size(regexp_extract_all(col("text"), lit(pat), lit(0)))
    val redacted = Seq(email -> "<EMAIL>", card -> "<CARD>", phone -> "<PHONE>",
      ipv4 -> "<IP>").foldLeft(col("text")) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }
    documents.select(
      col("doc_id"),
      hits(email).as("n_emails"),
      hits(phone).as("n_phones"),
      hits(ipv4).as("n_ips"),
      hits(card).as("n_cards"),
      md5(redacted).as("redacted_md5"))
  }

  /** Round-0 BPE pair statistics: global counts of adjacent character
    * pairs weighted by word frequency — the first-iteration signal of
    * byte-pair-encoding tokenizer training, and the SQL-expressible
    * slice of it (the oracle replays it in DuckDB). The corpus
    * collapses to the distinct-word frequency table first (classic BPE
    * trains on word counts, not raw text), so per-round work is
    * vocabulary-sized, not corpus-sized. */
  def vocabBpePairs(documents: DataFrame, topN: Int = 30): DataFrame = {
    val words = documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    words
      .select(col("cnt"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => struct(
          col("w").substr(i, lit(1)).as("a"),
          col("w").substr(i + 1, lit(1)).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("a"), col("b"))
      .limit(topN)
  }

  /** One learned merge: rank order, the pair, its corpus count. */
  final case class BpeMerge(rank: Int, left: String, right: String,
      merged: String, pair_count: Long)

  /** Distributed BPE tokenizer training: `nMerges` rounds of
    * count-adjacent-pairs → merge-the-argmax over the word-frequency
    * table (Sennrich et al. 2016). Scale shape: the corpus collapses
    * ONCE to distinct words + counts (the only corpus-sized pass);
    * training then runs as vocabulary-sized aggregate jobs with small
    * driver collects. Ties break deterministically (count desc, then
    * pair lexicographic).
    *
    * == Batched rounds: several merges per Spark job ==
    *
    * The naive protocol pays one argmax job + one state
    * materialization PER MERGE — 32k Spark jobs for a real vocabulary.
    * Each round here instead collects the top-`batchK` ranked pairs and
    * accepts the longest prefix that is PROVABLY the sequential-greedy
    * prefix, then applies all accepted merges in one fold + one
    * checkpoint. The acceptance proof, per candidate `p_i` in rank
    * order (strictly after `p_1`):
    *
    *  - `p_i`'s symbol set {a, b, a+b} is disjoint from every accepted
    *    merge's {a, b, a+b} — INCLUDING the created symbols on both
    *    sides. Disjoint pairs' counts are INVARIANT under the accepted
    *    merges ("a b"→"ab" elsewhere in a word never creates or
    *    destroys a (c,d) adjacency), so their relative ranks hold; a
    *    candidate that CONTAINS an accepted output (('t','h') accepted,
    *    ('th','e') later) has a stale pre-batch count, and a candidate
    *    whose OUTPUT is an accepted input (('xy','z') accepted,
    *    ('x','y') later) would make the single combined fold fire a
    *    rule on a symbol another rule creates within the same pass —
    *    both are excluded. The scan stops at the
    *    first overlapping candidate: anything an accepted merge might
    *    have demoted ranked below `p_i` already (demotion only lowers
    *    counts, and the original tie-break favored `p_i`).
    *  - `n(p_i)` strictly exceeds every accepted merge's CREATED-pair
    *    bound: a merge (a,b) only creates pairs touching the new symbol
    *    `ab` — (x,ab) with count ≤ min(n(x,a), n(a,b)) and (ab,y) with
    *    count ≤ min(n(b,y), n(a,b)) (the (ab,ab) run case is ≤ n(b,a),
    *    covered by the (x,a) side). The maxima over n(·,a) / n(b,·)
    *    come from the COLLECTED top-K rows themselves, floored by the
    *    K-th count (any pair outside the top-K counts at most that) —
    *    a sound bound with ZERO extra jobs.
    *
    * Under those two conditions the batch replays sequential greedy
    * EXACTLY (CorpusOpsSpec pins batched ≡ batchK=1 on the real corpus
    * and both against an independent replay; the generated DuckDB
    * oracle still replays round-by-round). Applying a batch is ONE
    * fold: disjointness means at most one rule can fire at any
    * position, so a single left-to-right pass with a when-chain equals
    * the sequential per-merge folds. Measured at sf0.1 with
    * nMerges = 100 (BASELINE.md): the corpus's 89 learnable merges
    * train in 168 Spark jobs / ~5.9 s warm vs 270 jobs / ~10.3 s for
    * the strictly-sequential protocol — 1.9 vs 3.0 jobs per merge. The
    * per-round driver sync is inherent to greedy BPE; batching divides
    * it by the mean accepted-prefix length, which is what a 32k-merge
    * vocabulary needs. */
  /** Longest prefix of a ranked top-K that provably replays sequential
    * greedy (the acceptance proof in [[vocabBpe]]'s doc), capped at
    * `maxLen`. Exposed package-private so the adversarial conflict
    * shapes — which a natural corpus rarely exhibits — are unit-testable
    * without engineering a corpus that reaches them. */
  private[graft] def bpeAcceptedPrefix(top: Seq[(String, String, Long)],
      batchK: Int, maxLen: Int): Seq[(String, String, Long)] = {
    // created-pair bounds from the collected rows alone: a pair
    // outside the top-K counts at most the K-th count, so
    // max(n(·,s)) = max(seen in top-K, floor) is sound
    val floor = if (top.length < batchK) 0L else top.last._3
    def maxIn(s: String) =
      math.max(floor, (top.filter(_._2 == s).map(_._3) :+ 0L).max)
    def maxOut(s: String) =
      math.max(floor, (top.filter(_._1 == s).map(_._3) :+ 0L).max)
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var stop = false
    top.take(maxLen).foreach { case cand @ (a, b, n) =>
      if (!stop) {
        // conflict set includes each accepted merge's CREATED symbol
        // a+b, and the candidate's own created symbol: an accepted
        // ('t','h') must block a later ('th','e') in the same batch
        // (its count is stale — the accepted merge boosts it), and an
        // accepted ('xy','z') must block a later ('x','y') (the
        // combined fold would fire rule1 on a symbol rule2 creates
        // within the same pass). Checking {a, b, a+b} on both sides
        // keeps the batch conservative and sequential-greedy exact.
        val used = accepted.flatMap(m => Seq(m._1, m._2, m._1 + m._2)).toSet
        val overlaps = used(a) || used(b) || used(a + b)
        val createdBound = accepted.map { case (aj, bj, nj) =>
          math.max(math.min(maxIn(aj), nj), math.min(maxOut(bj), nj))
        }.maxOption.getOrElse(Long.MinValue)
        if (accepted.isEmpty) accepted += cand
        else if (overlaps || n <= createdBound) stop = true
        else accepted += cand
      }
    }
    accepted.toSeq
  }

  def vocabBpe(documents: DataFrame, nMerges: Int = 10,
      batchK: Int = 16): Seq[BpeMerge] = {
    // `batchK` is the CAP on the per-round candidate collect; the
    // working round size adapts to the corpus's conflict density: a
    // round that accepted EVERYTHING it collected is evidence the next
    // prefix is long too (double it), a round that used under a
    // quarter wasted sort+collect freight on rows the conflict scan
    // discarded (halve it). Acceptance stays per-round provably
    // sequential for ANY k (the proof never depends on the round
    // size), so adaptivity moves cost, never results. With the default
    // cap 16 the knob is inert; large-vocabulary calls (nMerges in the
    // thousands) pass a bigger cap and let rounds grow.
    var k = math.min(16, batchK)
    var words = documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      // split(w, "") keeps a trailing "" under Spark's limit=-1 — drop it
      .select(filter(split(col("w"), ""), x => length(x) > 0).as("syms"),
        col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val pairFrame = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(
            element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
      val top = pairFrame
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(k).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        val accepted =
          bpeAcceptedPrefix(top.toSeq, k, nMerges - merges.size)
        if (accepted.size == top.length) k = math.min(k * 2, batchK)
        else if (accepted.size * 4 < k) k = math.max(16, k / 2)
        accepted.foreach { case (a, b, n) =>
          merges += BpeMerge(merges.size + 1, a, b, a + b, n)
        }
        // ONE left-to-right non-overlapping fold applies the whole
        // accepted batch: rules fire on (trailing acc symbol, current
        // symbol); disjoint symbol sets make the firing rule unique.
        def lt(s: String) = lit(s)
        val rules = accepted
        words = words.select(
          aggregate(col("syms"),
            array().cast("array<string>"),
            (acc, x) => {
              def cond(m: (String, String, Long)) =
                size(acc) > 0 && element_at(acc, size(acc)) === lt(m._1) && x === lt(m._2)
              def fire(m: (String, String, Long)) =
                concat(slice(acc, lit(1), size(acc) - 1), array(lt(m._1 + m._2)))
              rules.tail
                .foldLeft(when(cond(rules.head), fire(rules.head)))(
                  (w, m) => w.when(cond(m), fire(m)))
                .otherwise(concat(acc, array(x)))
            }).as("syms"),
          col("cnt"))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** [[vocabBpe]] as a DataFrame (driver-query surface). */
  def vocabBpeDf(documents: DataFrame, nMerges: Int = 10): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    vocabBpe(documents, nMerges).toDF()
      .select(col("rank"), col("left"), col("right"), col("merged"), col("pair_count"))
  }

  /** The ENCODE half of the tokenizer whose TRAIN half is [[vocabBpe]]:
    * apply a learned merge list, in rank order, to every word of every
    * document — each merge is the same left-to-right non-overlapping
    * greedy fold the trainer used, so train→encode round-trips exactly
    * (encoding the training corpus with its own merges reproduces the
    * trainer's final word states). Emits the per-document token
    * accounting a tokenizer audit wants: whitespace-word baseline,
    * post-BPE token count, chars-per-token compression.
    *
    * Scale shape: the model (the merge list) is a KB-sized driver Seq
    * shipped into generated code as one reference object; the whole
    * merge loop runs as a single compiled kernel per row
    * ([[graft.functions.TextExprs.BpeTokenCount]] — the nested
    * `aggregate`-fold form paid an array copy per symbol per merge:
    * 14.7 s vs 2.9 s end-to-end at sf0.1), all row-local; the only shuffle is
    * whatever the caller does with the doc-grain output. Not
    * SQL-replayable (the
    * greedy fold has no faithful string-replace form — same-symbol runs
    * diverge), so the driver check is rows-only and CorpusOpsSpec pins
    * the semantics against an independent single-threaded replay. */
  def bpeEncodeWith(documents: DataFrame, merges: Seq[BpeMerge]): DataFrame = {
    TextExprs.register(documents.sparkSession)
    val words = filter(split(col("text"), " "), w => length(w) > 0)
    documents.select(
      col("doc_id"),
      size(words).as("n_words"),
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).as("n_chars"),
      TextExprs.bpeTokenCount(words, merges.map(m => (m.left, m.right)))
        .as("n_bpe_tokens"))
      .select(col("*"),
        round(col("n_chars").cast("double")
          / greatest(col("n_bpe_tokens"), lit(1L)), 6).as("chars_per_token"))
  }

  /** [[bpeEncodeWith]] under merges trained on the same corpus — the
    * driver-query form (train 10 merges, then one encode pass). */
  def bpeEncode(documents: DataFrame, nMerges: Int = 10): DataFrame =
    bpeEncodeWith(documents, vocabBpe(documents, nMerges))

  /** Intra-corpus duplicated-PASSAGE spans, the exact-substring
    * complement to document-grain near-dup (the "dedup the span, keep the
    * doc" operation of Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better"): slide `width`-char windows at
    * `stride` over the normalized text; a window whose content occurs in
    * ≥2 DISTINCT documents marks its [start, start+width) range
    * duplicated; per doc, overlapping/touching ranges merge
    * (gaps-and-islands over one window spec) into maximal spans. Output
    * per doc (all docs ≥ width chars): span count, duplicated chars,
    * duplicated fraction of the normalized length.
    *
    * Scale shape: windows are (doc_id, start, key) triples — the text
    * itself never re-shuffles. The dup-key set is found by one
    * map-side-combined aggregate on the window key; occurrences re-join
    * that set on the same key (shuffle reuse), and span-merge is one
    * window function over (doc_id, start) — no pairwise doc×doc work
    * anywhere, cost linear in Σ windows. The window KEY here is the
    * substring itself so the DuckDB oracle replays bit-for-bit; at
    * 100 TB key on `xxhash64(w)` instead (16× narrower shuffle; a
    * collision only over-marks a span — dedup-tolerant). */
  /** (doc_id, norm, len) for docs long enough to window. */
  private def normFrame(documents: DataFrame, width: Int): DataFrame =
    documents
      .select(col("doc_id"), normalize(col("text")).as("norm"))
      .select(col("doc_id"), col("norm"), length(col("norm")).as("len"))
      .filter(col("len") >= width)

  /** The sliding-window frame both span operators share:
    * (doc_id, len, start, w). */
  private def winFrame(base: DataFrame, width: Int, stride: Int): DataFrame =
    base.select(
        col("doc_id"), col("len"),
        explode(sequence(lit(1), col("len") - width + 1, lit(stride))).as("start"),
        col("norm"))
      .select(col("doc_id"), col("len"), col("start"),
        col("norm").substr(col("start"), lit(width)).as("w"))

  /** Span merge + per-doc accounting shared by the batch and delta span
    * detectors: `occ` = (doc_id, start) dup-window occurrences, `base` =
    * (doc_id, norm, len) of the docs being scored. */
  private def spanAccounting(base: DataFrame, occ: DataFrame, width: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ordered = W.partitionBy(col("doc_id")).orderBy(col("start"))
    val spans = occ
      .withColumn("prev_end", max(col("start") + width)
        .over(ordered.rowsBetween(W.unboundedPreceding, -1)))
      .withColumn("span_id", sum(
          when(col("prev_end").isNull || col("start") > col("prev_end"), 1)
            .otherwise(0))
        .over(ordered.rowsBetween(W.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg((max(col("start") + width) - min(col("start"))).as("span_len"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("span_len")).as("dup_chars"))
    base.select(col("doc_id"), col("len"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        round(coalesce(col("dup_chars"), lit(0L)).cast("double") / col("len"), 6)
          .as("dup_frac"))
  }

  def docDupSpans(documents: DataFrame, width: Int = 40, stride: Int = 10,
      hashKey: Boolean = true): DataFrame = {
    val base = normFrame(documents, width)
    val wins = winFrame(base, width, stride)
    // dup marking in ONE pass over the window frame: key-grain window
    // aggregates replace aggregate + join-back (which would recompute
    // the explode/substr subtree and shuffle it twice). The marking
    // itself needs only "≥ 2 distinct holders", which min≠max over the
    // key answers with CONSTANT-size buffers — a boilerplate window held
    // by millions of docs (license headers, templates) costs two longs,
    // not a collected doc-id set. `hashKey` (default) shuffles
    // xxhash64(w) — 8 bytes instead of the 40-char substring (SURVEY
    // §8); the substring keying stays as the oracle/parity twin
    // (DedupSpec pins bit-equality; a 64-bit collision would merge two
    // unrelated windows, odds ~n²/2⁶⁵ — negligible against the md5
    // fingerprints this corpus machinery already trusts).
    val W = org.apache.spark.sql.expressions.Window
    val byKey = W.partitionBy(if (hashKey) xxhash64(col("w")) else col("w"))
    val occ = wins
      .withColumn("mn_doc", min(col("doc_id")).over(byKey))
      .withColumn("mx_doc", max(col("doc_id")).over(byKey))
      .filter(col("mn_doc") =!= col("mx_doc"))
      .select(col("doc_id"), col("start"))
    spanAccounting(base, occ, width)
  }

  /** Delta-proportional twin of [[docDupSpans]]: spans in INCOMING docs
    * whose windows already occur in the EXISTING corpus (the ingest-time
    * contamination check — "is this new doc copying something we already
    * hold?"). The corpus contributes only its DISTINCT window-key set
    * (built once, reusable across batches — at 100 TB this is the
    * persisted index, not a rescan) and the join is a left-semi on the
    * key, so per-batch work is Σ delta windows, never corpus × delta.
    * Incoming-incoming duplication is deliberately out of scope here —
    * that's the batch operator's job on the delta alone. */
  /** Delta-proportional exact dedup: incoming docs whose canonical
    * fingerprint already exists in the corpus, each with the canonical
    * holder (min doc_id) it duplicates — the ingest-time "have we seen
    * this exact document?" check. The corpus contributes only its
    * (fingerprint → min doc) index (one aggregate, persisted at scale);
    * the join is fingerprint-keyed, so per-batch work ∝ delta. The
    * within-batch duplicate question belongs to the batch operator
    * ([[dedupExact]]) over the delta alone — same division of labor as
    * [[docDupSpansIncremental]]. */
  def dedupExactIncremental(existing: DataFrame, incoming: DataFrame): DataFrame =
    dedupExactProbe(dedupExactIndex(existing), incoming)

  /** The corpus half of [[dedupExactIncremental]]: the (fingerprint →
    * canonical holder) index. Built once and PERSISTED at scale
    * ([[graft.incremental.IngestIndex]]) so per-batch probe work is
    * delta-proportional — the inline form above rebuilds it per call and
    * exists for the single-shot/oracle shape. */
  def dedupExactIndex(existing: DataFrame): DataFrame =
    existing
      .select(col("doc_id"), fingerprint(col("text")).as("fp_md5"))
      .groupBy(col("fp_md5")).agg(min(col("doc_id")).as("dup_of"))

  /** The probe half: incoming fingerprints against a prebuilt
    * [[dedupExactIndex]] frame (inline or loaded from parquet — the
    * frames are identical, so results and oracles are too). */
  def dedupExactProbe(index: DataFrame, incoming: DataFrame): DataFrame =
    incoming
      .select(col("doc_id"), fingerprint(col("text")).as("fp_md5"))
      .join(index, Seq("fp_md5"))
      .select(col("doc_id"), col("fp_md5"), col("dup_of"))

  /** [[dedupExactIncremental]] behind a Bloom pre-probe — the 100 TB
    * ingest shape: the corpus's fingerprints compress to a KB-scale
    * literal bitset ([[BloomJoin]] machinery), the delta probes it
    * ROW-LOCALLY at its own scan (no join, no shuffle for the clean
    * majority), and only bloom hits — true dups plus the filter's tiny
    * false-positive tail — pay the fingerprint join, which also kills
    * the false positives. No false negatives by construction, so the
    * composed result is bit-identical to the exact probe and shares its
    * oracle.
    *
    * The bitset build is COST-GATED like the persisted-index pruning
    * ([[graft.incremental.IngestIndex]]): below `minCorpusRows` the
    * extra fingerprint pass + aggregate + collect the bitset costs
    * outweigh the small join it shrinks (measured 5× the plain probe at
    * sf0.1: 1.97 s vs 0.37 s), so the operator falls through to the
    * plain probe — identical results either way, only the plan moves.
    * The gate probe is a doc_id-only count (column-pruned scan), an
    * order of magnitude cheaper than the md5-over-text bitset build it
    * decides about. */
  def dedupExactIncrementalBloom(existing: DataFrame, incoming: DataFrame,
      numBits: Int = 1 << 20, k: Int = 5,
      minCorpusRows: Long = 5000000L): DataFrame = {
    val index = dedupExactIndex(existing)
    if (existing.count() < minCorpusRows) dedupExactProbe(index, incoming)
    else {
      val bits = BloomJoin.bloomFilterBits(index, "fp_md5", numBits, k)
      dedupExactProbeBloom(bits, index, incoming, numBits, k)
    }
  }

  /** The probe half of [[dedupExactIncrementalBloom]], against a
    * prebuilt index + bitset (persisted at scale): the bloom kills the
    * clean majority row-locally at the delta scan; hits (true dups + FP
    * tail) pay the index join, which removes the FPs. */
  def dedupExactProbeBloom(bits: Array[Long], index: DataFrame,
      incoming: DataFrame, numBits: Int = 1 << 20, k: Int = 5): DataFrame =
    incoming
      .select(col("doc_id"), fingerprint(col("text")).as("fp_md5"))
      .filter(BloomJoin.mightContain(bits, col("fp_md5"), numBits, k))
      .join(index, Seq("fp_md5"))
      .select(col("doc_id"), col("fp_md5"), col("dup_of"))

  /** The corpus's DISTINCT window-key set — the persisted probe index
    * shared by [[docDupSpansIncremental]] and the streaming span probe
    * ([[graft.streaming.DocStream.spanProbe]]). Keys default to
    * xxhash64(w): the stored index and the probe's shuffle both move
    * 8-byte longs instead of 40-char substrings; probes detect the key
    * type from the index schema, so both keyings interoperate. */
  def dupSpanIndex(existing: DataFrame, width: Int = 40, stride: Int = 10,
      hashKey: Boolean = true): DataFrame = {
    val wins = winFrame(normFrame(existing, width), width, stride)
    (if (hashKey) wins.select(xxhash64(col("w")).as("w")) else wins.select(col("w")))
      .distinct()
  }

  /** Hash the probe side's `w` iff `index` carries hashed keys — one
    * schema peek keeps string- and hash-keyed indexes interchangeable. */
  private[graft] def matchSpanKey(wins: DataFrame, index: DataFrame): DataFrame =
    if (index.schema("w").dataType == org.apache.spark.sql.types.LongType)
      wins.withColumn("w", xxhash64(col("w")))
    else wins

  def docDupSpansIncremental(existing: DataFrame, incoming: DataFrame,
      width: Int = 40, stride: Int = 10): DataFrame =
    docDupSpansProbe(dupSpanIndex(existing, width, stride), incoming, width, stride)

  /** The probe half of [[docDupSpansIncremental]], against a prebuilt
    * [[dupSpanIndex]] frame (persisted at scale): delta windows
    * left-semi join the corpus key set, spans merge per incoming doc. */
  def docDupSpansProbe(index: DataFrame, incoming: DataFrame,
      width: Int = 40, stride: Int = 10): DataFrame = {
    val inBase = normFrame(incoming, width)
    val inWins = matchSpanKey(winFrame(inBase, width, stride), index)
    val occ = inWins.join(index, Seq("w"), "left_semi")
      .select(col("doc_id"), col("start"))
    spanAccounting(inBase, occ, width)
  }

  /** Cross-source contamination matrix: for every pair of sources, how
    * many DISTINCT duplicate windows they share — "which corpora copy
    * from each other", the provenance-grain view of [[docDupSpans]].
    * One pass: distinct (window, source), collect the (tiny) source set
    * per window key, expand pairs ROW-LOCALLY (a source set has at most
    * |sources| elements, not |docs|), count per pair. No self-join, no
    * re-scan; the DuckDB oracle computes the identical matrix via the
    * naive (w,source)⋈(w,source) form. */
  def sourceOverlap(documents: DataFrame, width: Int = 40, stride: Int = 10,
      hashKey: Boolean = true): DataFrame = {
    val base = documents
      .select(col("source"), normalize(col("text")).as("norm"))
      .select(col("source"), col("norm"), length(col("norm")).as("len"))
      .filter(col("len") >= width)
    // Only the GROUPING identity of a window matters here (the key never
    // reaches the output), so the default shuffles xxhash64(w) — same
    // 8-byte-vs-40-char trade, same substring parity twin, as
    // [[docDupSpans]].
    val wKey: Column => Column = if (hashKey) xxhash64(_) else identity
    val ws = base.select(
        col("source"),
        explode(sequence(lit(1), col("len") - width + 1, lit(stride))).as("start"),
        col("norm"))
      .select(col("source"), wKey(col("norm").substr(col("start"), lit(width))).as("w"))
      .distinct()
    val sets = ws.groupBy(col("w"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    sets
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("source_a"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("shared_windows"))
  }

  /** Post-dedup effective size per source — the mixture-planning input
    * ("how much UNIQUE data does each corpus actually contribute?"):
    * [[docDupSpans]] per doc, rolled up to source grain with the
    * normalized char mass. Docs shorter than `width` are below span
    * resolution and excluded (consistently with the span operator). */
  def sourceEffectiveSize(documents: DataFrame, width: Int = 40, stride: Int = 10): DataFrame = {
    val lens = documents.select(col("doc_id"), col("source"),
      length(normalize(col("text"))).as("len"))
    docDupSpans(documents, width, stride)
      .join(lens, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("len")).as("total_chars"),
        sum(col("dup_chars")).as("dup_chars"),
        (sum(col("len")) - sum(col("dup_chars"))).as("effective_chars"),
        round(sum(col("dup_chars")).cast("double") / sum(col("len")), 6)
          .as("dup_rate"))
  }

  /** Duplicated-passage EXCISION — the rewrite half of [[docDupSpans]]
    * (Lee et al. 2021 keep-one-copy): for every cross-document duplicate
    * window, the lowest doc_id holding it is the canonical copy; every
    * occurrence in OTHER docs is excised. Excised ranges merge into
    * maximal spans (same gaps-and-islands), the complement segments are
    * stitched back together, and the operator returns per-doc
    * (n_cuts, removed_chars, clean_len, clean_md5) — the md5 stands in
    * for the cleaned text so the result stays narrow and
    * engine-comparable; a caller wanting the text itself takes the same
    * plan minus the md5.
    *
    * Scale shape: adds to [[docDupSpans]]'s linear pipeline one
    * min(doc_id) carried by the same collect_set window (no extra
    * shuffle) and one segment-stitch per affected doc — a window over
    * that doc's few spans plus one hash aggregate; the full text of a
    * doc appears in exactly one stitch group, never crosses docs. */
  /** The text-bearing form of the excision: per doc (≥ width chars),
    * (n_cuts, removed_chars, clean_len, clean) where `clean` is the
    * stitched NORMALIZED text (untouched docs pass their norm through) —
    * what a pipeline consumes when it actually rewrites the corpus
    * (CorpusRun's gated excise stage). */
  def docDupExciseText(documents: DataFrame, width: Int = 40, stride: Int = 10,
      hashKey: Boolean = true): DataFrame = {
    val base = normFrame(documents, width)
    val wins = winFrame(base, width, stride)
    val W = org.apache.spark.sql.expressions.Window
    // Same bounded keying as [[docDupSpans]]: xxhash64 shuffle key,
    // min/max windows instead of a collected set (excision consumes
    // only the canonical min(doc_id) and the ≥2-distinct-holders test).
    val byKey = W.partitionBy(if (hashKey) xxhash64(col("w")) else col("w"))
    // occurrences to excise: window shared by >= 2 docs, holder not
    // canonical. `len` rides along so the whole span/segment pipeline
    // below never re-touches the text — TEXT IS READ EXACTLY TWICE
    // (window pass here, stitch join at the end; PlanSpec pins it).
    val occ = wins
      .withColumn("min_doc", min(col("doc_id")).over(byKey))
      .withColumn("max_doc", max(col("doc_id")).over(byKey))
      .filter(col("min_doc") =!= col("max_doc") && col("doc_id") =!= col("min_doc"))
      .select(col("doc_id"), col("len"), col("start"))
    val ordered = W.partitionBy(col("doc_id")).orderBy(col("start"))
    // ONE aggregation chain carries everything to doc grain: islands →
    // (doc, span) rows → per-doc SORTED span array + cut stats. The span
    // frame has a single consumer, so Spark derives the whole window
    // pipeline from a single scan (a second reference would silently
    // re-run it — measured as 4 scans in the first cut of this operator).
    val affected = occ
      .withColumn("prev_end", max(col("start") + width)
        .over(ordered.rowsBetween(W.unboundedPreceding, -1)))
      .withColumn("span_id", sum(
          when(col("prev_end").isNull || col("start") > col("prev_end"), 1)
            .otherwise(0))
        .over(ordered.rowsBetween(W.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(first(col("len")).as("len"),
        min(col("start")).as("s"), (max(col("start") + width)).as("e"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_cuts"),
        sum(col("e") - col("s")).as("removed_chars"),
        sort_array(collect_list(struct(col("s"), col("e")))).as("sps"))
    // complement segments + stitch, all ROW-LOCAL over the sorted span
    // array at the single text join: gap k runs from span k-1's end (doc
    // head for k=0) to span k's start; the tail runs from the last end to
    // len+1. Zero-length segments vanish in the filter, so a fully-
    // excised doc stitches to "" with no special case.
    def stitch(norm: Column, len: Column, sps: Column): Column = {
      val gaps = transform(sps, (x, i) => struct(
        when(i === 0, lit(1))
          .otherwise(element_at(sps, i).getField("e")).as("seg_start"),
        (x.getField("s") - when(i === 0, lit(1))
          .otherwise(element_at(sps, i).getField("e"))).as("seg_len")))
      val tail = struct(
        element_at(sps, size(sps)).getField("e").as("seg_start"),
        (len - element_at(sps, size(sps)).getField("e") + 1).as("seg_len"))
      val segs = filter(concat(gaps, array(tail)), p => p.getField("seg_len") > 0)
      array_join(
        transform(segs, p => norm.substr(p.getField("seg_start"), p.getField("seg_len"))),
        "")
    }
    val cleanCol = when(col("n_cuts").isNull, col("norm"))
      .otherwise(stitch(col("norm"), col("len"), col("sps")))
    base.select(col("doc_id"), col("norm"), col("len"))
      .join(affected, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_cuts"), lit(0L)).as("n_cuts"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        (col("len") - coalesce(col("removed_chars"), lit(0L))).as("clean_len"),
        cleanCol.as("clean"))
  }

  /** [[docDupExciseText]] narrowed to engine-comparable stats: the md5
    * stands in for the cleaned text (the driver-query form). */
  def docDupExcise(documents: DataFrame, width: Int = 40, stride: Int = 10,
      hashKey: Boolean = true): DataFrame =
    docDupExciseText(documents, width, stride, hashKey)
      .select(col("doc_id"), col("n_cuts"), col("removed_chars"),
        col("clean_len"), md5(col("clean")).as("clean_md5"))
}
