package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators over a document corpus (north-star mandate:
  * language ID, quality scoring, token counting, fingerprinting). All
  * pure codegen'd column expressions — no UDFs, no collects — so every
  * one of them whole-stage-compiles and scales linearly with the corpus.
  *
  * Determinism contract: every score is integer-count arithmetic
  * followed by a single double division (IEEE-deterministic on both
  * Spark and the DuckDB oracle), never an order-dependent double sum.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish token count: runs of letters, runs of digits, or any single
    * non-space-non-alnum char — the classic pre-tokenizer regex. */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(bpeTokenPattern))

  /** Distinct-token (vocabulary) count. */
  def distinctTokenCount(text: Column): Column = size(array_distinct(split(text, " ")))

  /** PII patterns for redaction — the pre-training scrub every public
    * corpus goes through. Deliberately engine-portable: explicit
    * character classes (no \d, no \b, no lookaround, no backrefs), so
    * Java regex (Spark codegen) and RE2 (the DuckDB oracle) match the
    * identical spans. Each is a structural detector, not a validator —
    * redaction wants recall; `999.999.999.999` is not a real IP but
    * absolutely should not survive a scrub that removes IPs. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}"
  val ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Redact emails, then phone numbers, then IPv4s to typed placeholder
    * tags — a pure codegen'd column expression (three regexp_replace
    * passes, no UDF). Order matters and is part of the contract: emails
    * go first so their digit runs can't half-match the phone pattern,
    * and the placeholders themselves contain no digits or '@', so later
    * passes can never match inside an earlier replacement. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>"),
      ipv4Pattern, "<IP>")

  /** Per-class PII match counts (pre-redaction), for audit metrics. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(emailPattern)),
     regexp_count(text, lit(phonePattern)),
     regexp_count(text, lit(ipv4Pattern)))

  /** Self-trained unigram LM score: avg log P(w) per token, with P from
    * the corpus's own unigram counts — the cheap perplexity-family
    * quality filter (an implausibly-worded document scores far below
    * the corpus mean). The count join is a broadcast of the vocabulary
    * against the token stream; per-token log-probs round to 6 dp BEFORE
    * the per-doc sum and the sum runs in DECIMAL, so the cross-engine
    * double-summation-order trap can't bite. Output: (doc_id, n_tokens,
    * avg_logprob). */
  def unigramLogProb(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("w"))
    val cnts = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = cnts.groupBy().agg(sum(col("c")).as("n"))
    tok.join(broadcast(cnts), Seq("w"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        round(log(col("c").cast("double") / col("n").cast("double")), 6).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lp").cast("decimal(20,6)")).cast("double") /
          count(lit(1)), 6).as("avg_logprob"))
  }

  /** Self-trained bigram LM score: avg log P(w_i | w_{i-1}) per bigram,
    * with the conditional from the corpus's own bigram / left-context
    * counts — one step up the perplexity ladder from
    * [[unigramLogProb]] (it punishes implausible word ORDER, which a
    * unigram can't see). Docs with fewer than 2 tokens have no bigrams
    * and drop out. The count joins are plain equi-joins on (p, c) / p —
    * deliberately NOT broadcast: the bigram vocabulary grows with the
    * corpus (unlike the unigram vocab) and must be allowed to shuffle
    * at 100 TB; AQE still broadcasts it when it happens to be small.
    * Same determinism contract as unigram: per-bigram log-probs round
    * to 6 dp before a DECIMAL sum. Output: (doc_id, n_bigrams,
    * avg_logprob). */
  def bigramLogProb(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val withW = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val bg = withW.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(element_at(col("w"), i).as("p"),
            element_at(col("w"), i + 1).as("c")))).as("pc"))
      .select(col("doc_id"), col("pc.p").as("p"), col("pc.c").as("c"))
    val cb = bg.groupBy(col("p"), col("c")).agg(count(lit(1)).as("nb"))
    val cl = bg.groupBy(col("p")).agg(count(lit(1)).as("np"))
    bg.join(cb, Seq("p", "c")).join(cl, Seq("p"))
      .select(col("doc_id"),
        round(log(col("nb").cast("double") / col("np").cast("double")), 6).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp").cast("decimal(20,6)")).cast("double") /
          count(lit(1)), 6).as("avg_logprob"))
  }

  /** Kneser-Ney smoothed bigram LM score (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1998) — the perplexity rung
    * above [[bigramLogProb]]'s raw MLE, and the smoothing every real
    * LM-quality filter (KenLM-style) runs:
    *
    *   P(c|p) = max(c(p,c) − d, 0)/c(p·) + d·N1+(p·)/c(p·) · Pcont(c)
    *   Pcont(c) = N1+(·c) / N1+(··)
    *
    * with the standard discount d = 0.75. MLE assigns unseen-in-context
    * bigrams zero (−∞ log) and over-trusts one-occurrence contexts; KN
    * backs off to CONTINUATION counts — "how many distinct contexts
    * does this word follow" — which is what separates a plausible-but-
    * unseen word order from a genuinely alien one. Smoothing makes the
    * score defined for EVERY bigram of the corpus vocabulary, so no
    * document drops to −∞.
    *
    * Determinism: all counts are exact integers from three grouped
    * aggregations (bigram counts, left-context totals + distinct-right
    * fan-out in one pass, continuation counts); each bigram's
    * probability is ONE double chain over those integers (the discount
    * subtraction, two divisions, multiply-add — bit-identical on both
    * engines), its log rounds to 7 dp — NOT the family's usual 6: at
    * 6 dp one sf0.1 term's shortest decimal representation lands
    * exactly on a x.5e-6 boundary, where Spark's round (BigDecimal of
    * the shortest string) and DuckDB's (binary value) disagree; such a
    * value is an exact 7-dp decimal, i.e. maximally FAR from every
    * 7-dp boundary, and all fixture scales clear 7 dp — and the
    * per-doc aggregate is the exact DECIMAL SUM, not an average: the
    * avg's `sum/count` division re-manufactures a representation tie
    * (a fixture doc's sum/49 sits exactly on a x.5e-6 boundary, where
    * the engines' round implementations disagree), while the sum cast
    * to double is EXACT (7-dp-scaled sums stay far under 2^53).
    * Consumers divide by n_bigrams themselves when they want the
    * average. Scale: the count joins
    * are plain equi-joins on (p, c)/p/c (NOT broadcast — the bigram
    * vocabulary grows with the corpus; AQE broadcasts when small), one
    * token-stream shuffle each. Output: (doc_id, n_bigrams,
    * sum_logprob); higher sum/n = more corpus-plausible word order. */
  def knBigramLogProb(docs: DataFrame, textCol: String,
                      idCol: String): DataFrame = {
    // NO pre-explode repartition here (r16 negative A/B, recorded in
    // OPTIMIZATION_r16.md): the bigram frame is evaluated ~7× in this
    // plan (marginals + final join sides), so widening the scan to 32
    // tasks multiplied per-task fixed costs across every evaluation —
    // measured 2.0 → 2.4 s at sf0.1, the split/explode itself being too
    // cheap to amortize the fan-out (unlike the md5/window gram builds)
    val withW = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val bg = withW.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(element_at(col("w"), i).as("p"),
            element_at(col("w"), i + 1).as("c")))).as("pc"))
      .select(col("doc_id"), col("pc.p").as("p"), col("pc.c").as("c"))
    val cb = bg.groupBy(col("p"), col("c")).agg(count(lit(1)).as("nb"))
    // left-context totals AND distinct-right fan-out N1+(p·) ride ONE
    // aggregation of the bigram-type table (cb) plus the raw totals
    val cl = bg.groupBy(col("p")).agg(count(lit(1)).as("np"))
    val fan = cb.groupBy(col("p")).agg(count(lit(1)).as("n1p"))
    // continuation counts: in how many distinct left contexts does c
    // appear; N1+(··) = total distinct bigram types (1-row broadcast)
    val cont = cb.groupBy(col("c")).agg(count(lit(1)).as("n1c"))
    val total = cb.groupBy().agg(count(lit(1)).as("nbt"))
    bg.join(cb, Seq("p", "c")).join(cl, Seq("p")).join(fan, Seq("p"))
      .join(cont, Seq("c")).crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(log(
          greatest(col("nb").cast("double") - lit(0.75d), lit(0d))
            / col("np").cast("double")
          + lit(0.75d) * col("n1p").cast("double") / col("np").cast("double")
            * (col("n1c").cast("double") / col("nbt").cast("double"))), 7)
          .as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast("decimal(21,7)")).cast("double").as("sum_logprob"))
  }

  /** PMI collocation ranking (Church & Hanks 1990): adjacent word
    * pairs scored by pointwise mutual information — the classic
    * multi-word-expression extractor a tokenizer/vocab pipeline runs
    * before merging phrases. Scored by the EXACT integer ratio
    * `r = (N · c(x,y) · 10^6) div (c(x,·) · c(·,y))` — a monotone
    * transform of PMI = ln(r) − 6·ln(10) — so the ranking AND the
    * score column are integers with no float log anywhere and the
    * oracle replays them bit-for-bit. Marginals are positional (x as
    * left word, y as right) so Σ_xy p(x,y) = 1 exactly. `minCount`
    * applies the standard low-frequency cutoff (a 1-occurrence pair
    * maximizes PMI; every collocation extractor thresholds).
    *
    * Scale: one grouped pair count + two grouped marginal counts + a
    * 1-row broadcast total; the joins run pair-table × vocab-table on
    * single-word keys, and only ≥minCount pairs reach the scoring
    * join. The 128-bit-safe DECIMAL(38,0) product keeps
    * `N · c(x,y) · 10^6` exact to N ~ 1e12 bigrams per corpus. Output:
    * topK (p, c, n_pair, pmi_ratio_ppm), ties broken (p, c). */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Int, topK: Int): DataFrame = {
    val withW = docs.select(split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val bg = withW.select(
        explode(transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(element_at(col("w"), i).as("p"),
            element_at(col("w"), i + 1).as("c")))).as("pc"))
      .select(col("pc.p").as("p"), col("pc.c").as("c"))
    val pair = bg.groupBy(col("p"), col("c")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val leftM = bg.groupBy(col("p")).agg(count(lit(1)).as("n_left"))
    val rightM = bg.groupBy(col("c")).agg(count(lit(1)).as("n_right"))
    val total = bg.agg(count(lit(1)).as("n_total"))
    pair.join(leftM, Seq("p")).join(rightM, Seq("c"))
      .crossJoin(broadcast(total))
      .select(col("p"), col("c"), col("n_pair"),
        expr("(CAST(n_total AS DECIMAL(38,0)) * n_pair * 1000000) div " +
          "(CAST(n_left AS DECIMAL(38,0)) * n_right)").as("pmi_ratio_ppm"))
      .orderBy(col("pmi_ratio_ppm").desc, col("p"), col("c"))
      .limit(topK)
  }

  /** SymSpell-style spelling correction (Garbe's symmetric-deletion
    * matching, the data-cleaning normalizer OCR/web-crawl corpora run
    * before tokenization), restricted to deletion distance 1: a noisy
    * token matches vocabulary word v iff it IS v (distance 0) or it is
    * v minus one character — so the candidate join is a pure EQUI-join
    * between the noisy stream and a precomputed deletion index of
    * Σ len(v) short strings, never an edit-distance cross product. The
    * best candidate is (distance, −count, v)-minimal: exact match
    * first, then the most frequent vocabulary word, lexicographic tie.
    *
    * The noisy stream is a planted fixture derivation (the
    * [[redactPii]] discipline — both engines replay it): tokens of
    * length ≥ 3 whose md5(doc_id_pos_w) ends in '0' (1/16) lose the
    * character at an md5-chosen position; the vocabulary with counts
    * comes from the clean corpus.
    *
    * Scale: the deletion index is vocab-linear (words × length) and
    * joins on short string keys; the noisy side shuffles once; the
    * per-(doc,pos) argmin is a bounded window over candidate sets of
    * at most a few vocabulary words. Unmatched typos survive with a
    * null correction (left join) — silently dropping unfixable tokens
    * would corrupt the accounting. Output: (doc_id, pos, typo,
    * corrected, dist, cand_count). */
  def spellCorrect(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val h = md5(concat_ws("_", col("doc_id"), col("pos"), col("w")))
    val noisy = toks.withColumn("h", h)
      .filter(length(col("w")) >= 3 && substring(col("h"), 32, 1) === "0")
      .withColumn("dp",
        (conv(substring(col("h"), 1, 6), 16, 10).cast("long") %
          length(col("w")).cast("long") + 1L).cast("int"))
      .select(col("doc_id"), col("pos"),
        concat(expr("substring(w, 1, dp - 1)"), expr("substring(w, dp + 1)"))
          .as("typo"))
    val vocab = toks.groupBy(col("w").as("v")).agg(count(lit(1)).as("cnt"))
    val dels = vocab
      .select(col("v"), col("cnt"),
        explode(sequence(lit(1), length(col("v")))).as("i"))
      .select(col("v"), col("cnt"),
        concat(expr("substring(v, 1, i - 1)"), expr("substring(v, i + 1)"))
          .as("key"))
      .distinct() // "aa" deletes to "a" twice; one index row is enough
    val cand = noisy
      .join(vocab.select(col("v"), col("cnt"), col("v").as("key")),
        col("typo") === col("key"))
      .select(col("doc_id"), col("pos"), col("typo"), col("v"), col("cnt"),
        lit(0).as("dist"))
      .unionAll(noisy.join(dels, col("typo") === col("key"))
        .select(col("doc_id"), col("pos"), col("typo"), col("v"), col("cnt"),
          lit(1).as("dist")))
    val w = Window.partitionBy(col("doc_id"), col("pos"))
      .orderBy(col("dist"), col("cnt").desc, col("v"))
    val best = cand.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("doc_id"), col("pos"), col("v").as("corrected"),
        col("dist"), col("cnt").as("cand_count"))
    noisy.join(best, Seq("doc_id", "pos"), "left")
      .select(col("doc_id"), col("pos"), col("typo"), col("corrected"),
        col("dist"), col("cand_count"))
  }

  /** Character-level Shannon entropy per document — the classic
    * gibberish/boilerplate detector (natural prose sits ~4 bits/char;
    * base64 blobs and aaaa… runs sit far off it in either direction).
    * Per-char-class terms `p·ln p` round to 9 dp before the DECIMAL
    * sum (the unigram determinism pattern); `abs` of the (≤ 0) sum
    * avoids a cross-engine -0.0. Output: (doc_id, n_chars_total,
    * distinct_chars, entropy_nats). */
  def charEntropy(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ch = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), "")).as("ch"))
    val cc = ch.groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("k"))
    val n = cc.groupBy(col("doc_id")).agg(sum(col("k")).as("n"),
      count(lit(1)).as("distinct_chars"))
    cc.join(n, Seq("doc_id"))
      .select(col("doc_id"), col("n"), col("distinct_chars"),
        round((col("k").cast("double") / col("n").cast("double")) *
          log(col("k").cast("double") / col("n").cast("double")), 9).as("t"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_chars_total"),
        max(col("distinct_chars")).as("distinct_chars"),
        round(abs(sum(col("t").cast("decimal(20,9)"))).cast("double"), 6)
          .as("entropy_nats"))
  }

  /** Temperature-flattened domain mixing weights — the `p_s ∝ n_s^α`
    * resampling a pretraining mix applies so small domains are not
    * drowned by raw-size sampling (α = 1 keeps raw proportions, α = 0
    * is uniform). Fixed at α = 1/2, whose power is IEEE `sqrt` —
    * correctly rounded in every IEEE-754 engine, so `floor(sqrt(·))` is
    * bit-stable cross-engine where a general `pow(x, 0.7)` is not.
    *
    * Exact recipe: per group, token mass t_s; s_s = floor(sqrt(t_s ·
    * 10^6)) (sqrt in milli-units for granularity; t_s·10^6 must stay
    * under 2^52 to be exactly representable — fine to ~4.5e9 tokens per
    * group, beyond which scale the milli-factor down); weight_ppm =
    * s_s · 10^6 DIV Σ s_s — integer division over an integer sum, so
    * no float accumulation order exists anywhere. The 1-row total
    * broadcasts back; the corpus streams once. */
  def mixTemperatureWeights(docs: DataFrame, groupCol: String,
                            textCol: String): DataFrame = {
    val per = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol))).as("sum_tokens"))
      .withColumn("sq",
        floor(sqrt(col("sum_tokens").cast("double") * 1000000.0d)).cast("long"))
    val tot = per.agg(sum(col("sq")).as("sq_total"))
    per.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("sum_tokens"),
        expr("sq * 1000000 DIV sq_total").as("weight_ppm"))
  }

  /** Epoch/repeat sampling plan for a temperature-flattened mix — the
    * actionable "data recipe" a trainer executes downstream of
    * [[mixTemperatureWeights]]: with token budget B = total div 2,
    * each source owes target = B·w_ppm div 10⁶ tokens, delivered as
    * `target div mass` FULL passes over the source plus a partial pass
    * that walks documents in md5(id) order until the token remainder
    * is covered (small sources repeat — upsampling; large sources
    * truncate — the α=1/2 flattening made concrete). Everything is
    * exact integer arithmetic — the one product that can outgrow
    * int64 (budget·w_ppm, past ~9.2e12 corpus tokens) rides
    * DECIMAL(38,0), good to ~1e31; the partial-pass cut is a per-source
    * prefix-sum window (prev < remainder), so selection is exact to
    * the document and both engines replay it bit-for-bit.
    *
    * Scale: the plan table is |sources| rows (broadcast); the
    * selection pass is one per-source sort window over doc token
    * counts — the same window contract as every per-group entry, with
    * the [[stratifiedSample]] hash-threshold prune the documented
    * swap-in when a single source outgrows a task. Output: (group,
    * n_docs, sum_tokens, weight_ppm, target_tokens, full_epochs,
    * n_partial_docs, partial_tokens). */
  def mixEpochPlan(docs: DataFrame, groupCol: String, textCol: String,
                   idCol: String): DataFrame = {
    val w = mixTemperatureWeights(docs, groupCol, textCol)
    val budget = w.agg(expr("CAST(sum(sum_tokens) DIV 2 AS BIGINT)").as("budget"))
    // budget·weight_ppm through DECIMAL(38,0) (the pmiCollocations
    // route): in int64 the product overflows past ~9.2e12 total corpus
    // tokens — Spark with ANSI off would wrap silently while DuckDB
    // errors, a cross-engine divergence exactly at scale. DECIMAL(38,0)
    // carries the product exactly to ~1e31 before the integer divide
    val plan = w.crossJoin(broadcast(budget))
      .select(col(groupCol), col("n_docs"), col("sum_tokens"),
        col("weight_ppm"),
        expr("CAST(CAST(budget AS DECIMAL(38,0)) * weight_ppm DIV 1000000 AS BIGINT)")
          .as("target_tokens"))
      .withColumn("full_epochs", expr("target_tokens DIV sum_tokens"))
      .withColumn("rem_tokens", expr("target_tokens % sum_tokens"))
    val toks = docs.select(col(groupCol), col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("long").as("tk"))
    val win = Window.partitionBy(col(groupCol))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sel = toks
      .withColumn("prev", coalesce(sum(col("tk")).over(win), lit(0L)))
      .join(plan.select(col(groupCol), col("rem_tokens")), Seq(groupCol))
      .filter(col("prev") < col("rem_tokens"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_partial_docs"),
        sum(col("tk")).as("partial_tokens"))
    plan.join(sel, Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs"), col("sum_tokens"),
        col("weight_ppm"), col("target_tokens"), col("full_epochs"),
        coalesce(col("n_partial_docs"), lit(0L)).as("n_partial_docs"),
        coalesce(col("partial_tokens"), lit(0L)).as("partial_tokens"))
  }

  /** Top word-n-gram coverage (the other Gopher repetition family
    * member next to [[repetitionRatio]]): per document, the most
    * frequent word n-gram (ties → lexicographically smallest) and the
    * fraction of token slots its occurrences cover, in EXACT integer
    * permille (occ·n·1000 DIV tokens — overlaps counted, like the
    * paper's character-fraction form, so a pathological "x x x …" loop
    * scores above 1000 by design). Template boilerplate and chorus-loop
    * spam score high where the distinct-ratio signal can stay low.
    * Documents shorter than n tokens have no n-gram slot and are
    * excluded (the census contract is per-SLOTTED-doc). Scale shape:
    * one explode (Σ tokens rows), one partial-aggregated count, one
    * per-doc top-1 window — no joins, no driver state. */
  def topNgramCoverage(docs: DataFrame, textCol: String, idCol: String,
                       n: Int = 2): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("w"))
      .withColumn("total", size(col("w")))
      .filter(col("total") >= n)
    val grams = toks.select(col("doc_id"), col("total"),
      explode(expr(s"transform(sequence(1, size(w) - ${n - 1}), " +
        s"i -> concat_ws(' ', slice(w, i, $n)))")).as("g"))
    grams.groupBy(col("doc_id"), col("total"), col("g"))
      .agg(count(lit(1)).as("occ"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("occ").desc, col("g"))))
      .filter(col("r") === 1)
      .select(col("doc_id"), col("g").as("top_gram"), col("occ"),
        expr(s"occ * $n * 1000 DIV total").as("coverage_permille"))
  }

  /** Repetition signal (the Gopher/C4-family quality heuristic):
    * fraction of word n-gram slots occupied by a repeat of an earlier
    * n-gram — 0 for fully novel text, → 1 for a loop of one phrase.
    * distinct counts ride the same codegen'd shingle kernel the dedup
    * family uses; documents shorter than n tokens score 0 (their single
    * all-tokens shingle is trivially unique). */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = greatest(size(split(text, " ")) - lit(n - 1), lit(1))
    val distinct = size(graft.functions.Shingles.wordShingles(text, n))
    round(lit(1.0) - distinct.cast("double") / total.cast("double"), 6)
  }

  /** Tiny public-knowledge stopword profiles for the n-gram/stopword
    * language-ID heuristic. Scoring = number of token occurrences that
    * hit the language's profile; argmax with alphabetical tie-break. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人"))

  /** Stopword-hit count for one profile (token occurrences, with
    * multiplicity). */
  def profileHits(text: Column, words: Seq[String]): Column =
    size(filter(split(text, " "), t => t.isin(words.map(lit(_)): _*)))

  /** Tiny public-knowledge character-bigram profiles (most frequent
    * bigrams per language) for the char-n-gram language-ID variant. */
  val charNgramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("en", "er", "ch", "de", "ei"),
    "en" -> Seq("th", "he", "in", "er", "an"),
    "es" -> Seq("de", "en", "os", "es", "la"),
    "fr" -> Seq("es", "le", "de", "re", "en"),
    "zh" -> Seq("的", "是", "不", "了", "在"))

  /** Character-n-gram hits: non-overlapping occurrences of any of the
    * profile's bigrams (regexp alternation — identical counting
    * semantics in Spark and RE2-based engines). */
  def charNgramHits(text: Column, ngrams: Seq[String]): Column =
    regexp_count(text, lit(ngrams.mkString("|")))

  /** Char-n-gram language ID: argmax bigram-profile hits, alphabetical
    * tie-break — the classic character-n-gram heuristic. Backed by the
    * codegen'd single-pass kernel ([[graft.functions.NgramLangIdExpr]]);
    * [[langIdNgramFold]] is the column-fold twin (five regexp scans)
    * kept for the equivalence spec. */
  def langIdNgram(text: Column): Column =
    graft.functions.LangIdKernels.ngramLangIdCol(text)

  def langIdNgramFold(text: Column): Column = {
    val scored = charNgramProfiles.map { case (code, ngs) => (code, charNgramHits(text, ngs)) }
    scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bestCode, bestScore), (code, score)) =>
        (when(score > bestScore, lit(code)).otherwise(bestCode),
         when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Heuristic language ID: argmax profile hits, ties broken by
    * alphabetical language code (profiles are pre-sorted). Backed by
    * the codegen'd single-pass kernel; [[langIdFold]] is the
    * interpreted column-fold twin kept for the equivalence spec. */
  def langId(text: Column): Column =
    graft.functions.LangIdKernels.tokenLangIdCol(text)

  def langIdFold(text: Column): Column = {
    val scored = langProfiles.map { case (code, words) => (code, profileHits(text, words)) }
    // strictly-greater fold keeps the FIRST (alphabetically smallest)
    // language on ties.
    scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bestCode, bestScore), (code, score)) =>
        (when(score > bestScore, lit(code)).otherwise(bestCode),
         when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Quality metrics per document — lengths, token counts, type-token
    * ratio, stopword ratio, mean token length (the length/punct/
    * stopword heuristic family used to filter training corpora) — plus
    * a composite score in [0,1]: blend of type-token ratio, an in-range
    * length band, and stopword presence.
    *
    * The score is an exact rational of integer counts:
    *   score = (4·nDistinct + 3·nTok·bandFlag + 3·min(3·nStop, nTok))
    *           / (10·nTok)
    * and its 6-dp HALF_UP rounding is computed IN INTEGER ARITHMETIC
    * (ppm = ⌊(2·10⁶·num + den) / (2·den)⌋) before one final double
    * division by 10⁶ — rounding the double approximation instead parks
    * scores that are exactly k.5×10⁻⁷ (common, the denominator is a
    * small integer) within an ulp of the rounding boundary, where
    * Spark's BigDecimal HALF_UP and the oracle's multiply-based round
    * can disagree (bit one doc at sf0.1). */
  /** The quality score in exact parts-per-million (a LONG) — the form
    * thresholds should compare and aggregates should average: the
    * double `quality_score` is ppm/1e6, and 1e6 is not a power of two,
    * so round-tripping through the double re-derives a DIFFERENT long
    * for some values. Same half-up rational rounding as
    * [[quality]]'s score (they share the expression). */
  def qualityPpm(text: Column): Column = qualityPpmExpr(text).cast("long")

  private def qualityPpmExpr(t: Column): Column = {
    val nTokI = tokenCount(t)
    val nDisI = distinctTokenCount(t)
    val nStopI = profileHits(t, langProfiles.toMap.apply("en"))
    val bandFlag = when(nTokI.between(10, 1000), 1).otherwise(0)
    val num = (lit(4) * nDisI + lit(3) * nTokI * bandFlag +
      lit(3) * least(lit(3) * nStopI, nTokI)).cast("long")
    val den = (lit(10) * nTokI).cast("long")
    floor((lit(2000000L) * num + den).cast("double") /
      (lit(2L) * den).cast("double"))
  }

  def quality(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val nTokI = tokenCount(t)
    val nTok = nTokI.cast("double")
    val nDisI = distinctTokenCount(t)
    val nStopI = profileHits(t, langProfiles.toMap.apply("en"))
    val ppm = qualityPpmExpr(t)
    docs.select(
      col(idCol).as("doc_id"),
      length(t).as("n_chars"),
      nTokI.as("n_tokens"),
      nDisI.as("n_distinct_tokens"),
      bpeTokenCount(t).as("n_bpe_tokens"),
      round(nDisI.cast("double") / nTok, 6).as("type_token_ratio"),
      round(nStopI.cast("double") / nTok, 6).as("stopword_ratio"),
      round((length(t) - (nTokI - lit(1))).cast("double") / nTok, 6).as("mean_token_len"),
      (ppm.cast("double") / lit(1000000.0d)).as("quality_score"))
  }

  /** Deterministic stratified sampling to per-group quotas — the corpus
    * MIXING step of a training-data pipeline ("cap en at N docs, keep
    * low-resource languages whole"): within each group, rank documents
    * by a content-independent md5 hash of their id (so the DuckDB
    * oracle replays the choice exactly) and keep the `quota(g)` lowest
    * — EXACTLY quota docs per group (the whole group when it is
    * smaller), uniform over the group, reproducible across runs and
    * cluster layouts (no rand(), no row_number over an arbitrary
    * order). Groups without a quota are dropped.
    *
    * Scale shape: a per-group row_number window sorts EVERY row of a
    * group inside one task — a giant group (the usual case: "en" is
    * most of the corpus) is a one-task sort of most of the corpus. So
    * the window runs on a HASH-PRUNED survivor set instead: hashes are
    * uniform in [0, 2^60), so the quota-th smallest hash of an m-row
    * group concentrates at ~(2^60/m)·q, and keeping only rows below
    * (2^60/m)·q·`pruneMargin` (per-group m from one broadcast count)
    * passes ~q·margin rows per group to the exact window — the
    * two-phase top-k, with phase 1 a stateless filter. At margin 8 the
    * probability the prune cuts a true selection is e^{-Ω(q·margin)}
    * (vanishing even for q = 1, and fixed-dataset runs are
    * deterministic either way); the q_mix_quota oracle runs the
    * UNPRUNED window in SQL, so the correctness gate itself is the
    * prune-equals-plain proof. Groups with m ≤ q·margin skip the prune
    * entirely (threshold would cover everything). */
  def stratifiedSample(docs: DataFrame, groupCol: String, idCol: String,
                       quotas: Map[String, Long],
                       pruneMargin: Int = 8): DataFrame = {
    val h = Dedup.md5Hash60(col(idCol).cast("string"))
    val quotaCol = quotas.foldLeft(lit(null).cast("long")) {
      case (acc, (g, q)) => when(col(groupCol) === g, lit(q)).otherwise(acc)
    }
    val cnt = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__m"))
    val withQ = docs.withColumn("__h", h)
      .withColumn("__q", quotaCol)
      .filter(col("__q").isNotNull)
      .join(broadcast(cnt), Seq(groupCol))
    val pruned = withQ
      // (2^60 / m) · q·margin never overflows: for m > q·margin the
      // product is < 2^60; for m ≤ q·margin the prune is skipped
      .filter(col("__m") <= col("__q") * pruneMargin ||
        col("__h") < (lit(1L << 60) / col("__m")) * (col("__q") * pruneMargin))
    def windowed(in: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(groupCol)).orderBy(col("__h"), col(idCol))
      in.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= col("__q"))
        .drop("__rn", "__h", "__m", "__q")
    }
    // Runtime guard on the probabilistic prune: the prune keeps exactly
    // the rows with hash below the threshold, and the true selection is
    // the q SMALLEST hashes — so a pruned group that still holds ≥ q
    // survivors provably kept its whole selection, while one with < q
    // survivors (probability ~e^{-q·margin}) may have lost part of it.
    // On violation fall back to the exact unpruned window instead of
    // silently returning an under-quota (or different) sample. The
    // check is one cheap aggregation pass (tiny grouped counts); it
    // makes the sampler eager at call time, which a sampler can afford.
    val violated = pruned.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__survivors"),
        first(col("__q")).as("__qv"), first(col("__m")).as("__mv"))
      .filter(col("__mv") > col("__qv") * pruneMargin &&
        col("__survivors") < col("__qv"))
      .limit(1).count() > 0
    windowed(if (violated) withQ else pruned)
  }

  /** Polynomial rolling-hash content fingerprint over the text's
    * characters: h = fold(31·h + ascii(c)) mod 1e9+7, seeded with 7.
    * Stays in Long range (h < 1e9, 31·h + 127 < 2^35), so the identical
    * fold is expressible in the DuckDB oracle via list_reduce. A cheap
    * order-sensitive fingerprint (unlike the bag-of-words md5) — the
    * rolling-hash family used for content-defined chunking. */
  def rollingHash(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => length(c) > 0),
      lit(7L),
      (acc, c) => (acc * lit(31L) + ascii(c)) % lit(1000000007L))

  /** Sparse TF-IDF weights as (doc_id, term, weight) ROWS — the
    * oracle-checkable surface (a map column can't be hash-compared
    * cross-engine). Same inverted-index shape as BM25: one (doc, term)
    * tf aggregation shuffle, df broadcast.
    * tfidf = (tf / dl) · ln((N + 1)/(df + 1)). */
  def tfidfTerms(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
    val tok = base.select(col("doc_id"), size(col("w")).as("dl"), explode(col("w")).as("t"))
    val tf = tok.groupBy(col("doc_id"), col("dl"), col("t")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val n = base.agg(count(lit(1)).cast("double").as("n_docs"))
    tf.join(broadcast(dfT), Seq("t"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("t").as("term"),
        ((col("tf").cast("double") / col("dl")) *
          log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))).as("weight"))
  }

  /** Sparse TF-IDF document vectors as a `map<token, double>` column —
    * the sparse twin of the dense `embeddings` fixture, assembled per
    * doc with `map_from_entries` over [[tfidfTerms]]. */
  def tfidfVectors(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    tfidfTerms(docs, textCol, idCol)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("term"), col("weight")))))
        .as("tfidf"))

  /** BM25 keyword search: top-k documents for a bag of query terms.
    * Pure relational formulation — inverted index (explode) → per-doc
    * term frequencies → document frequencies (broadcast) → corpus stats
    * (broadcast 1-row) → per-term partial scores summed per doc. At
    * scale the only shuffle is the (doc, term) tf aggregation; df and
    * corpus stats are tiny broadcasts. Scores are rounded to 4 dp and
    * tie-broken by doc id so ranking is deterministic cross-engine
    * (ln() may differ in the last ulp between libms). */
  def bm25Search(docs: DataFrame, textCol: String, idCol: String,
                 queryTerms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(lit(_))
    val base = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("w"))
    val withDl = base.select(col("doc_id"), col("w"), size(col("w")).as("dl"))
    val tok = withDl.select(col("doc_id"), col("dl"), explode(col("w")).as("t"))
      .filter(col("t").isin(terms: _*))
    val tf = tok.groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val stats = withDl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val scored = tf
      .join(broadcast(dfT), Seq("t"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("t"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"))
    // one column per query term, added in FIXED order: a bare sum(s)
    // would add term contributions in partition order, which is not
    // deterministic across runs/engines for doubles
    val termSums = queryTerms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("t") === t, col("s"))), lit(0.0)).as(s"__s$i")
    }
    scored.groupBy(col("doc_id"))
      .agg(termSums.head, termSums.tail: _*)
      .select(col("doc_id"),
        round(queryTerms.indices.map(i => col(s"__s$i")).reduce(_ + _), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Overlapping fixed-size character windows per document — the RAG /
    * retrieval chunking primitive ([[Pack]] assembles fixed token
    * budgets across documents; this slices within one). Windows start
    * every `stride` chars; the last window starts at the final stride
    * boundary before (or at) `len − window` rounded UP, so every char is
    * covered and no window is ever empty. Pure codegen projection + one
    * explode — no shuffle at all; chunk volume is len/stride per doc,
    * each chunk fingerprinted for downstream chunk-level dedup. */
  def chunkWindows(docs: DataFrame, textCol: String, idCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride, "need stride > 0, window >= stride")
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("__nw",
        expr(s"1 + (greatest(length(__t) - $window, 0) + ${stride - 1}) DIV $stride"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("__nw") - 1)).as("chunk_idx"), col("__t"))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"substr(__t, chunk_idx * $stride + 1, $window)").as("__c"))
      .select(col("doc_id"), col("chunk_idx"),
        length(col("__c")).as("chunk_len"), md5(col("__c").cast("binary")).as("fp"))
  }

  /** DSIR-shaped data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw-pool
    * document by how target-like its hashed-unigram distribution is,
    * and keep the top `quota`. The published method uses hashed n-gram
    * bag ratios between a small target corpus and the raw pool; this
    * implementation keeps the exact same structure — tokens hashed into
    * `buckets` buckets, add-1-smoothed per-bucket frequency ratio
    * target/raw — but scores in exact integer parts-per-million (the
    * bucket weight is the smoothed probability RATIO in ppm; the doc
    * score is the per-token mean weight) instead of summed float logs,
    * so both engines agree bit-for-bit. The ppm-ratio score is not the
    * log-sum (it is a mean-of-ratios rather than a sum-of-log-ratios)
    * but induces the same "looks like the target" ordering signal and
    * is float-free.
    *
    * Target = documents with `langCol == targetLang` (the stand-in for
    * a curated high-quality corpus); scored pool = everything else.
    *
    * Scale: two grouped bucket counts (one over the target's tokens,
    * one over all tokens) reduce the corpus to ≤ 2·buckets rows; the
    * weight table is broadcast back (buckets rows), so scoring is one
    * map-side join + one grouped integer mean per doc; selection is a
    * TakeOrdered top-`quota`, never a global sort. The weight product
    * routes through DECIMAL(38,0) so counts to ~1e12 tokens stay
    * exact (the [[pmiCollocations]] bound). Output: top-`quota`
    * (doc_id, lang, n_tokens, score_ppm), ties broken by doc_id. */
  def dsirSelect(docs: DataFrame, textCol: String, idCol: String,
                 langCol: String, targetLang: String,
                 buckets: Int = 256, quota: Int = 50): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        explode(split(col(textCol), " ")).as("t"))
      .withColumn("bkt",
        // single-pass 6-hex-digit md5 kernel (= the conv(substring(md5))
        // chain, pinned bit-identical by Md5Hash60Spec)
        graft.functions.Md5Hash60.md5HashHex(col("t"), 6) % buckets)
    // raw and target bucket counts fold in ONE conditional aggregation
    // (the corpus streams through tokenization once for the whole model
    // build), and the corpus totals re-aggregate the ≤`buckets`-row
    // count table instead of scanning the corpus a third time
    val counts = tok.groupBy(col("bkt")).agg(
      count(lit(1)).as("rc"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("tc"))
    val totals = counts.agg(
      sum(col("rc")).as("raw_total"), sum(col("tc")).as("tgt_total"))
    // weight table: buckets rows — add-1 smoothing keeps never-seen
    // buckets finite and the ratio integer-exact in DECIMAL(38,0)
    val weights = counts
      .crossJoin(broadcast(totals))
      .select(col("bkt"),
        expr(s"CAST(((tc + 1) * CAST(raw_total + $buckets AS DECIMAL(38,0)) " +
          s"* 1000000) div ((rc + 1) * CAST(tgt_total + $buckets AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("w_ppm"))
    tok.filter(col("lang") =!= targetLang)
      .join(broadcast(weights), Seq("bkt"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        expr("CAST(sum(w_ppm) div count(1) AS BIGINT)").as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(quota)
  }

  /** Vocabulary-growth / Heaps-law curve: cumulative distinct-token
    * count (and token volume) over `slices` equal corpus fractions in
    * content-free md5(doc_id) order — the tokenizer-sizing diagnostic a
    * corpus report carries ("how fast does the vocabulary still grow at
    * the corpus tail?"). A token's first slice is min(slice) over its
    * occurrences, so the cumulative vocabulary at slice s = # tokens
    * with first-slice ≤ s — two grouped aggregations and a
    * `slices`-row cumulative window; the corpus is never sorted and no
    * per-token global rank exists anywhere (the same
    * threshold-not-rank trick as the stratified-split bounds join).
    * Output: one row per slice — (slice, docs, tokens_cum, vocab_cum). */
  def vocabGrowth(docs: DataFrame, textCol: String, idCol: String,
                  slices: Int = 10): DataFrame = {
    require(slices >= 1 && slices <= 256, "need 1 <= slices <= 256")
    val sliced = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("__h",
        graft.functions.Md5Hash60.md5HashHex(col("doc_id").cast("string"), 2))
      .withColumn("slice", expr(s"CAST((__h * $slices) div 256 AS INT)"))
      .drop("__h")
    val tok = sliced.select(col("slice"), col("doc_id"),
      explode(split(col("__t"), " ")).as("t"))
    val docsBy = sliced.groupBy(col("slice")).agg(count(lit(1)).as("n_docs"))
    val occBy = tok.groupBy(col("slice")).agg(count(lit(1)).as("n_tok"))
    val vocabBy = tok.groupBy(col("t")).agg(min(col("slice")).as("slice"))
      .groupBy(col("slice")).agg(count(lit(1)).as("n_new"))
    // spine = 0..slices-1 so empty slices still emit a row; the
    // cumulative window runs over `slices` rows (require-capped at
    // 256) — BoundedFrame.enforce makes the cap executable in-plan
    val spine = docsBy.sparkSession.range(slices.toLong)
      .select(col("id").cast("int").as("slice"))
    val w = Window.orderBy(col("slice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    BoundedFrame.enforce(spine.join(docsBy, Seq("slice"), "left_outer")
      .join(occBy, Seq("slice"), "left_outer")
      .join(vocabBy, Seq("slice"), "left_outer"), 256L, "vocabGrowth slices")
      .select(col("slice"),
        coalesce(col("n_docs"), lit(0L)).as("nd"),
        coalesce(col("n_tok"), lit(0L)).as("nt"),
        coalesce(col("n_new"), lit(0L)).as("nn"))
      .select(col("slice"), sum(col("nd")).over(w).as("docs_cum"),
        sum(col("nt")).over(w).as("tokens_cum"),
        sum(col("nn")).over(w).as("vocab_cum"))
  }

  /** Tokenizer fertility per group — tokens-per-word by language, THE
    * multilingual tokenizer-fairness metric (a language with fertility
    * 3× pays 3× the context budget for the same text; reported by
    * every tokenizer paper): BPE-ish pre-tokenizer count over
    * whitespace word count, as exact integer ppm from two summed
    * counts. One codegen pass + one grouped sum. Output: (g, n_docs,
    * n_words, n_bpe, fertility_ppm). */
  def tokenizerFertility(docs: DataFrame, textCol: String,
                         groupCol: String): DataFrame =
    docs.select(col(groupCol).as("g"),
        tokenCount(col(textCol)).cast("long").as("nw"),
        bpeTokenCount(col(textCol)).cast("long").as("nb"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
        sum(col("nb")).as("n_bpe"))
      .select(col("g"), col("n_docs"), col("n_words"), col("n_bpe"),
        expr("CAST(n_bpe * 1000000 div n_words AS BIGINT)")
          .as("fertility_ppm"))

  /** Per-source KL divergence from the corpus unigram distribution —
    * the mixture-health metric behind reweighting decisions ("which
    * source is distributionally farthest from the mix", the
    * DoReMi-family signal): KL(P_src ‖ P_corpus) =
    * Σ_w (c_sw / N_s) · ln(c_sw·N_c / (N_s·c_cw)), every count exact,
    * each log term ONE double chain over integers rounded to 7 dp (the
    * [[knBigramLogProb]] recipe), weighted by the INTEGER count c_sw
    * inside an exact DECIMAL sum, divided once by N_s at the end — so
    * summation order is immaterial and both engines agree bitwise.
    * Source vocabularies are subsets of the corpus vocabulary by
    * construction, so no term is ever log(x/0). Scale: one token pass
    * feeds both count tables; the per-(source, word) join is a plain
    * equi-join on the word. Output: (src, n_tokens, kl_sum) by src —
    * kl per token = kl_sum / n_tokens, the consumer's division. */
  def sourceKl(docs: DataFrame, textCol: String,
               srcCol: String): DataFrame = {
    val tok = docs.select(col(srcCol).as("src"),
      explode(split(col(textCol), " ")).as("w"))
    val cs = tok.groupBy(col("src"), col("w")).agg(count(lit(1)).as("csw"))
    val cc = tok.groupBy(col("w")).agg(count(lit(1)).as("ccw"))
    val ns = tok.groupBy(col("src")).agg(count(lit(1)).as("ns"))
    val nc = tok.agg(count(lit(1)).as("nct"))
    cs.join(cc, Seq("w"))
      .join(broadcast(ns), Seq("src"))
      .crossJoin(broadcast(nc))
      .select(col("src"), col("ns"),
        // ratio in DOUBLE space (t1 = c_sw·N_c, t2 = N_s·c_cw, then one
        // divide — overflow-free at any corpus size, IEEE-identical in
        // the oracle's same-shaped expression); the weighted sum stays
        // the exact DECIMAL total — kl per token is the consumer's one
        // division (emitting sum/count re-manufactures rounding ties)
        (col("csw").cast("decimal(21,7)") *
          round(log((col("csw").cast("double") * col("nct").cast("double")) /
            (col("ns").cast("double") * col("ccw").cast("double"))), 7)
            .cast("decimal(21,7)"))
          .as("term"))
      .groupBy(col("src"), col("ns"))
      .agg(sum(col("term")).as("s"))
      .select(col("src"), col("ns").as("n_tokens"),
        col("s").cast("double").as("kl_sum"))
      .orderBy(col("src"))
  }

  /** Curation-funnel attrition report — the table every corpus release
    * publishes (the RefinedWeb/Gopher convention): documents flow
    * through the gate cascade IN ORDER and each stage reports what
    * survives it cumulatively, so "which gate costs the corpus most"
    * is visible at a glance instead of buried in per-gate queries.
    * Stages: token-count band [10, 1000] → composite quality ≥ 0.5
    * (the exact-ppm form, never the double round-trip) → trigram
    * repetition ≤ 0.2 → exact-dedup keeper (min doc id per content).
    *
    * Scale: the three heuristic flags are one codegen pass over the
    * corpus; the dedup stage is the [[graft.operators.Dedup]] 16-byte
    * hash groupBy; the funnel itself aggregates to ONE row of running
    * conjunction counts and unpivots to 5 — no per-stage rescans.
    * Output: (stage, gate, n_kept, n_cut, kept_ppm), stage order. */
  def curationFunnel(docs: DataFrame, textCol: String,
                     idCol: String): DataFrame = {
    val t = col(textCol)
    // the CANONICAL exact-dedup survivor rule (one definition repo-wide)
    val keepers = graft.operators.Dedup.exactGroups(docs, textCol, idCol)
      .select(col("keep_doc_id").as("doc_id"), lit(1L).as("keep"))
    val flagged = docs
      .select(col(idCol).as("doc_id"),
        (tokenCount(t).between(10, 1000)).cast("long").as("f1"),
        (qualityPpm(t) >= 500000L).cast("long").as("f2"),
        (repetitionRatio(t) <= 0.2d).cast("long").as("f3"))
      .join(keepers, Seq("doc_id"), "left_outer")
      .select(col("f1"), (col("f1") * col("f2")).as("g2"),
        (col("f1") * col("f2") * col("f3")).as("g3"),
        (col("f1") * col("f2") * col("f3") * coalesce(col("keep"), lit(0L)))
          .as("g4"))
    funnelFromFlags(flagged)
  }

  /** Feature-hashed document vectors — the hashing trick (Weinberger
    * et al., ICML'09): every token hashes to one of `dims` components
    * (md5-salted, so the oracle replays it) with an independent ±1
    * sign hash, and the component is the SIGNED token count — integer
    * exact, so the assembled vector is bit-identical cross-engine and
    * the cosine over it is the usual IEEE ratio of exact integers.
    * This is the no-model text→vector bridge: the output feeds every
    * vector operator (bruteForceTopK, IVF, semanticDedup, silhouette)
    * without an embedding model in the loop, and on this corpus it
    * surfaces the planted near-dups at cosine ≈ 0.99. One token
    * explode + two grouped aggregates; docs with no tokens produce no
    * vector (nothing to hash), zero vectors are the caller's
    * [[graft.operators.Similarity.vectorHealth]] gate. Output:
    * (doc_id, vec array<double> of length `dims`). */
  def hashedDocVectors(docs: DataFrame, textCol: String, idCol: String,
                       dims: Int = 64): DataFrame = {
    require(dims > 0, "dims must be positive")
    val md5h = graft.operators.Dedup.md5Hash60 _
    val comp = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("t"))
      .filter(col("t") =!= "")
      .select(col("doc_id"),
        pmod(md5h(concat(lit("fh_"), col("t"))), lit(dims.toLong)).as("pos"),
        when(pmod(md5h(concat(lit("fs_"), col("t"))), lit(2L)) === 0L, lit(1L))
          .otherwise(lit(-1L)).as("sgn"))
      .groupBy(col("doc_id"), col("pos"))
      .agg(sum(col("sgn")).as("w"))
    comp.groupBy(col("doc_id")).agg(
      array((0 until dims).map(i =>
        coalesce(max(when(col("pos") === i, col("w"))), lit(0L))
          .cast("double")): _*).as("vec"))
  }

  /** The funnel's finishing stage over per-doc running-conjunction
    * flags (f1, g2, g3, g4) — shared by [[curationFunnel]] and the
    * streaming twin so the live attrition report carries the exact
    * batch semantics: one aggregate + the stage/ppm stack. */
  def funnelFromFlags(flagged: DataFrame): DataFrame =
    flagged
      .agg(count(lit(1)).as("n0"),
        coalesce(sum(col("f1")), lit(0L)).as("n1"),
        coalesce(sum(col("g2")), lit(0L)).as("n2"),
        coalesce(sum(col("g3")), lit(0L)).as("n3"),
        coalesce(sum(col("g4")), lit(0L)).as("n4"))
      .select(expr(
        "stack(5, 0, 'total',       n0, CAST(0 AS BIGINT), " +
          "1, 'token_band',  n1, n0 - n1, " +
          "2, 'quality',     n2, n1 - n2, " +
          "3, 'repetition',  n3, n2 - n3, " +
          "4, 'exact_dedup', n4, n3 - n4) AS (stage, gate, n_kept, n_cut)"),
        expr("CAST(n0 AS BIGINT) AS __n0"))
      .select(col("stage"), col("gate"), col("n_kept"), col("n_cut"),
        // empty corpus → NULL ppm, not an ANSI division error
        expr("CASE WHEN __n0 > 0 THEN CAST(n_kept * 1000000 div __n0 AS BIGINT) END")
          .as("kept_ppm"))

  /** A trained multinomial Naive-Bayes model, all as (unmaterialized)
    * DataFrames so batch and streaming scorers share the identical
    * estimate stage: `wordCounts` = (l, w, c) per-class token counts
    * (grows with vocab × classes — shuffled, never broadcast);
    * `classTotals` = (l, nl, v, lprior) one row per class carrying the
    * class token total, the train vocabulary size, and the 7-dp-rounded
    * log prior (classes are few — broadcast at score time); `vocab` =
    * the train vocabulary (w) for the OOV semi-join. */
  final case class NbModel(wordCounts: DataFrame, classTotals: DataFrame,
                           vocab: DataFrame)

  /** Train a multinomial Naive-Bayes text classifier — the fastText-class
    * linear filter every corpus-curation pipeline runs (language ID,
    * quality tiers, domain routing) expressed as pure counting, which is
    * why it is the one classifier whose training is exactly replayable
    * in SQL: the "model" is three grouped aggregations (per-class token
    * counts, per-class totals, class priors) and add-1 smoothing.
    *
    * Scale: one pass over the train token stream; `wordCounts` is the
    * only corpus-sized frame and flows through plain equi-joins. */
  def nbTrain(train: DataFrame, textCol: String, labelCol: String): NbModel = {
    val tok = train.select(col(labelCol).as("l"),
      explode(split(col(textCol), " ")).as("w"))
    val cw = tok.groupBy(col("l"), col("w")).agg(count(lit(1)).as("c"))
    val vocab = cw.select(col("w")).distinct()
    val v = vocab.agg(count(lit(1)).as("v"))
    val cls = tok.groupBy(col("l")).agg(count(lit(1)).as("nl"))
    val prior = train.groupBy(col(labelCol).as("l"))
      .agg(count(lit(1)).as("dl"))
    val nd = train.agg(count(lit(1)).as("nd"))
    val classTotals = cls.join(prior, Seq("l"))
      .crossJoin(broadcast(v)).crossJoin(broadcast(nd))
      .select(col("l"), col("nl"), col("v"),
        round(log(col("dl").cast("double") / col("nd").cast("double")), 7)
          .as("lprior"))
    NbModel(cw, classTotals, vocab)
  }

  /** Score documents against a trained [[NbModel]]: for each doc and
    * class, log P(class) + Σ_tokens log((c(l,w)+1)/(nl+V)), argmax over
    * classes. Tokens outside the train vocabulary drop (the standard
    * restrict-to-vocab NB contract) — a doc whose tokens are ALL
    * out-of-vocabulary emits no row; callers wanting prior-only
    * fallbacks handle those upstream.
    *
    * Determinism: every count is exact; each token's log term is ONE
    * double chain over integers rounded to 7 dp (the [[knBigramLogProb]]
    * recipe — 6 dp has known x.5e-N boundary ties in this corpus
    * family), summed in DECIMAL so order is immaterial; the argmax
    * tie-breaks by class name, and ties are exact DECIMAL equality, so
    * both engines pick the same class.
    *
    * Scale: vocab semi-join prunes OOV tokens at the source; the token
    * stream multiplies by the (few) classes via a broadcast of
    * `classTotals`; the (l, w) count join is a shuffled equi-join
    * (vocab × classes grows with the corpus); per-doc argmax is a
    * hash-partitioned window over `classes` rows per doc. Returns
    * (doc_id, pred, score) — `score` is the exact DECIMAL sum cast to
    * double (7-dp-scaled sums stay far under 2^53). */
  def nbScore(test: DataFrame, textCol: String, idCol: String,
              model: NbModel): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("l"))
    nbScoreAll(test, textCol, idCol, model)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("doc_id"), col("l").as("pred"),
        col("score").cast("double").as("score"))
  }

  /** Per-(doc, class) NB scores BEFORE the argmax, as exact DECIMALs —
    * the shared estimate stage under [[nbScore]] (argmax) and
    * [[nbCalibration]] (winner-vs-runner-up margins, which must
    * subtract in DECIMAL: a double-space subtraction re-manufactures
    * the representation ties the 7-dp recipe exists to avoid). */
  def nbScoreAll(test: DataFrame, textCol: String, idCol: String,
                 model: NbModel): DataFrame = {
    val tetok = test.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("w"))
      .join(model.vocab, Seq("w"), "left_semi")
    val term = tetok.crossJoin(broadcast(model.classTotals))
      .join(model.wordCounts, Seq("l", "w"), "left_outer")
      .select(col("doc_id"), col("l"), col("lprior"),
        round(log((coalesce(col("c"), lit(0L)).cast("double") + 1.0d) /
          (col("nl").cast("double") + col("v").cast("double"))), 7).as("lp"))
    term.groupBy(col("doc_id"), col("l"), col("lprior"))
      .agg(sum(col("lp").cast("decimal(21,7)")).as("s"))
      .select(col("doc_id"), col("l"),
        (col("s") + col("lprior").cast("decimal(21,7)")).as("score"))
  }

  /** Score-ranked calibration of the NB filter: test docs bucket into
    * `buckets` equal groups by classification MARGIN (winner score
    * minus runner-up, the NB confidence signal — subtracted in exact
    * DECIMAL), and each bucket reports its accuracy in integer ppm.
    * This is the artifact that turns a classifier into a curation
    * POLICY: "above which confidence do I trust the filter
    * unsupervised, below which does it go to review" — without it a
    * threshold is a guess. The ntile runs over the TEST split only —
    * an eval artifact bounded by construction (the [[nbClassify]]
    * id-mod split), not a corpus-sized sort; production calibrates on
    * a sample for the same reason. Output: (bucket, n, n_correct,
    * acc_ppm, min_margin, max_margin), margins as doubles cast from
    * the exact decimals. */
  def nbCalibration(docs: DataFrame, textCol: String, labelCol: String,
                    idCol: String, testMod: Int = 5,
                    buckets: Int = 5): DataFrame = {
    require(testMod >= 2 && buckets >= 1, "need testMod >= 2, buckets >= 1")
    val test = docs.filter(col(idCol) % testMod === 0)
    val model = nbTrain(docs.filter(col(idCol) % testMod =!= 0),
      textCol, labelCol)
    val rkw = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("l"))
    val top2 = nbScoreAll(test, textCol, idCol, model)
      .withColumn("rk", row_number().over(rkw)).filter(col("rk") <= 2)
    val pair = top2.groupBy(col("doc_id"))
      .agg(max(when(col("rk") === 1, col("score"))).as("s1"),
        max(when(col("rk") === 2, col("score"))).as("s2"),
        max(when(col("rk") === 1, col("l"))).as("pred"))
    val j = pair
      .join(test.select(col(idCol).as("doc_id"), col(labelCol).as("actual")),
        Seq("doc_id"))
      .select(col("doc_id"),
        (col("s1") - coalesce(col("s2"), col("s1"))).as("margin"),
        (col("actual") === col("pred")).cast("long").as("correct"))
    // global NTILE without the single-task window (`Window.orderBy`
    // with no partition funnels the whole scored test split through
    // one task): range-repartition on the order key, sort within
    // partitions, and number rows with zipWithIndex — partition
    // prefix sums, the same distributed running-counter shape as the
    // scan-dump counter (Scan.scala). RangePartitioner's partitions
    // are range-disjoint and ascending, so (partition, in-partition
    // position) IS the total (margin, doc_id) order regardless of
    // where its sampled boundaries fall. The checkpoint pins the
    // frame so the size job and the rank pass read one
    // materialization instead of re-scoring the classifier twice.
    val ordered = j.repartitionByRange(col("margin"), col("doc_id"))
      .sortWithinPartitions(col("margin"), col("doc_id"))
      .localCheckpoint()
    val n = ordered.count()
    val sess = docs.sparkSession
    val rankedSchema = ordered.schema
      .add("rk", org.apache.spark.sql.types.LongType)
    val ranked = sess.createDataFrame(
      ordered.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L)) },
      rankedSchema)
    // exact NTILE(b) from the 1-based rank: the first (n mod b)
    // buckets take ceil(n/b) rows, the rest floor(n/b) — matching the
    // oracle's ntile bucket-for-bucket so the hash gate still applies
    val q = n / buckets
    val rem = n % buckets
    val cut = rem * (q + 1)
    // integer DIV keeps the bucket arithmetic exact at any rank (no
    // double rounding); q=0 (fewer rows than buckets) never reaches
    // the otherwise branch — every rank is <= cut — but the max guard
    // keeps the expression total
    val bucket = expr(s"CAST(IF(rk <= $cut, (rk - 1) DIV ${q + 1} + 1, " +
      s"$rem + (rk - $cut - 1) DIV ${math.max(q, 1L)} + 1) AS INT)")
    ranked
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("correct")).as("n_correct"),
        min(col("margin")).as("mn"), max(col("margin")).as("mx"))
      .select(col("bucket"), col("n"), col("n_correct"),
        expr("CAST(n_correct * 1000000 div n AS BIGINT)").as("acc_ppm"),
        col("mn").cast("double").as("min_margin"),
        col("mx").cast("double").as("max_margin"))
  }

  /** End-to-end NB classification eval on a deterministic id-mod split:
    * train on `id % testMod != 0`, score the rest, emit per-test-doc
    * (doc_id, actual, pred, score, correct). The held-out accuracy this
    * yields is the rollout gate for a classifier-based curation filter
    * (the analogue of [[graft.operators.Similarity]]'s recallAtK for
    * ANN). */
  def nbClassify(docs: DataFrame, textCol: String, labelCol: String,
                 idCol: String, testMod: Int = 5): DataFrame = {
    require(testMod >= 2, "need testMod >= 2 so the train split is non-empty")
    val test = docs.filter(col(idCol) % testMod === 0)
    val model = nbTrain(docs.filter(col(idCol) % testMod =!= 0),
      textCol, labelCol)
    nbScore(test, textCol, idCol, model)
      .join(test.select(col(idCol).as("doc_id"),
        col(labelCol).as("actual")), Seq("doc_id"))
      .select(col("doc_id"), col("actual"), col("pred"), col("score"),
        (col("actual") === col("pred")).cast("long").as("correct"))
  }

  /** χ²-based term–label association (the classic feature-selection
    * statistic; Yang & Pedersen 1997): for every (label, term) with
    * document frequency ≥ `minDf` inside the label, the one-vs-rest
    * 2×2 contingency χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) over
    * DISTINCT (doc, term) presence. Emitted as exact integer ppm —
    * numerator and denominator are pure count products folded in
    * DECIMAL(38,0) (every factor cast BEFORE multiplying), and the
    * final `(num·1e6) div den` truncating division is floor on the
    * non-negative numerator in both engines — so selection against
    * `thresholdPpm` can never flip on a rounding boundary. The default
    * threshold is the χ²₁ 5% critical value (3.841459).
    *
    * Scale: one distinct-presence explode (the [[unigramLogProb]]
    * token pass), then counts at (term, label) / term / label
    * granularity — vocabulary-sized frames joined with the label and
    * corpus totals broadcast. No pair joins, no windows. Headroom:
    * N·(ad−bc)²·1e6 ≤ N⁵·1e6 must fit 38 digits → N ≤ ~2.5e6 docs per
    * chi2 run; beyond that, drop the ·1e6 onto the denominator side or
    * sample. Output: (label, term, df_in, chi2_ppm). */
  def chi2Terms(docs: DataFrame, textCol: String, labelCol: String,
                idCol: String, minDf: Long = 5,
                thresholdPpm: Long = 3841459L): DataFrame = {
    val dec = "decimal(38,0)"
    val td = docs.select(col(idCol).as("doc_id"), col(labelCol).as("lbl"),
      explode(split(col(textCol), " ")).as("w")).distinct()
    val n = docs.groupBy().agg(count(lit(1)).as("n"))
    val nl = docs.groupBy(col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("nl"))
    val a = td.groupBy(col("w"), col("lbl")).agg(count(lit(1)).as("a"))
    val ta = a.groupBy(col("w")).agg(sum(col("a")).as("ta"))
    a.join(ta, Seq("w")).join(broadcast(nl), Seq("lbl")).crossJoin(broadcast(n))
      .select(col("lbl"), col("w"), col("a"),
        (col("ta") - col("a")).as("b"), (col("nl") - col("a")).as("c"),
        (col("n") - col("nl") - (col("ta") - col("a"))).as("d"),
        col("n"), col("nl"), col("ta"))
      // a term present in EVERY doc (ta = n), or a single-label corpus
      // (nl = n), zeroes the denominator — both carry no information
      // for selection, so exclude them instead of dividing by zero
      .filter(col("a") >= minDf && col("ta") < col("n") &&
        col("nl") < col("n"))
      .withColumn("num", col("n").cast(dec) *
        ((col("a").cast(dec) * col("d") - col("b").cast(dec) * col("c")) *
         (col("a").cast(dec) * col("d") - col("b").cast(dec) * col("c"))) *
        lit(1000000L))
      .withColumn("den", col("ta").cast(dec) * (col("n") - col("ta")) *
        col("nl") * (col("n") - col("nl")))
      .withColumn("chi2_ppm", expr("CAST(num div den AS BIGINT)"))
      .filter(col("chi2_ppm") >= thresholdPpm)
      .select(col("lbl").as("label"), col("w").as("term"),
        col("a").as("df_in"), col("chi2_ppm"))
  }

  /** Multi-phrase blocklist scan — the curation staple every corpus
    * release runs (toxicity / NSFW / boilerplate phrase lists), in the
    * anchor-and-verify shape that scales to large lists: one token
    * explode ANCHORS candidate positions by joining each token against
    * the broadcast map of phrase FIRST words (an Aho-Corasick-style
    * prefix gate — a doc with no anchor word costs one hash probe per
    * token, never |phrases| scans), then only anchor-bearing positions
    * re-join their doc's token array and verify the full window with
    * one codegen'd slice+join compare. Overlapping occurrences count
    * (every matching start position is a hit). Output: one row per doc
    * with ≥1 verified hit — (doc_id, n_hits, n_phrases). The verify
    * re-join shuffles anchors + docs by doc id and ships each doc's
    * token array ONCE (anchors fold to a per-doc array first); carrying
    * the array THROUGH the explode would duplicate every document per
    * token, and joining per ANCHOR row would duplicate it per anchor —
    * both strictly worse at corpus scale. */
  def blocklistHits(docs: DataFrame, textCol: String, idCol: String,
                    phrases: Seq[String]): DataFrame =
    verifiedBlocklistMatches(docs, textCol, idCol, phrases)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        count_distinct(col("p")).as("n_phrases"))

  /** The verified (doc_id, p) match stream [[blocklistHits]] and
    * [[blocklistPhraseStats]] aggregate — one anchor-and-verify
    * definition so the two reports can never disagree on what counts
    * as a hit. */
  def verifiedBlocklistMatches(docs: DataFrame, textCol: String,
                               idCol: String, phrases: Seq[String],
                               broadcastPhrases: Boolean = true): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.trim.nonEmpty),
      "blocklist needs non-empty phrases")
    // a duplicated phrase would double-count hits here while a GROUP BY
    // oracle folds it into one row — structurally different results
    require(phrases.distinct == phrases,
      s"blocklist phrases must be distinct: $phrases")
    val spark = docs.sparkSession
    import spark.implicits._
    // the driver-side phrase list broadcasts by default (it IS small —
    // it came in as a Seq). A million-phrase list arriving as a TABLE
    // uses the same chain with broadcastPhrases=false: the anchor stage
    // becomes a shuffle join of tokens against the phrase first-word
    // frame (bucket both on the word for a co-located join), and
    // everything downstream is unchanged — the escape is a hint, not a
    // different operator
    val ph0 = phrases.map { p =>
      val ws = p.split(" "); (ws.head, p, ws.length)
    }.toDF("w0", "p", "l")
    blocklistMatchCore(docs, textCol, idCol,
      if (broadcastPhrases) broadcast(ph0) else ph0)
  }

  /** The million-phrase route as a first-class TABLE operator: phrases
    * arrive as a DataFrame (column `p`) — never through the driver —
    * and the identical anchor-and-verify chain runs with NO broadcast
    * hint, so Catalyst sizes the anchor join from statistics (a small
    * list still broadcasts on its own merits; a million-phrase table
    * shuffles, bucket both sides on the first word for co-location —
    * which is the point of the escape). Duplicates fold in-plan
    * (DISTINCT) — the driver never sees the list, so the Seq variant's
    * distinctness require is replaced by construction. Output =
    * [[blocklistHits]]'s (doc_id, n_hits, n_phrases). */
  def blocklistHitsTable(docs: DataFrame, textCol: String, idCol: String,
                         phrases: DataFrame): DataFrame = {
    val ph0 = phrases.select(col("p").cast("string").as("p")).distinct()
      .select(element_at(split(col("p"), " "), 1).as("w0"), col("p"),
        size(split(col("p"), " ")).as("l"))
    blocklistMatchCore(docs, textCol, idCol, ph0)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        count_distinct(col("p")).as("n_phrases"))
  }

  /** The anchor-and-verify chain itself, phrase frame (w0, p, l)
    * supplied by the caller — [[verifiedBlocklistMatches]] passes the
    * broadcast-hinted driver list, [[blocklistHitsTable]] the unhinted
    * table. ONE implementation so the routes cannot diverge. */
  private def blocklistMatchCore(docs: DataFrame, textCol: String,
                                 idCol: String, ph: DataFrame): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("ws"))
    val anchors = base
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("i", "w")))
      .join(ph, col("w") === col("w0"))
      .select(col("doc_id"), col("i"), col("p"), col("l"))
    // anchors fold to ONE array row per doc before the verify re-join,
    // so each doc's token array is shipped and joined exactly once —
    // an adversarial list whose first words are stopword-frequent
    // ("the …") makes anchor volume ≈ token volume, and a per-anchor
    // join would materialize ~|tokens| copies of full documents. The
    // per-doc anchor array is bounded by the doc's own token count
    // (same O(doc) envelope as `ws` itself). Every anchor then
    // verifies its window with one HOF filter over that single copy.
    val perDoc = anchors.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("i"), col("p"), col("l"))).as("anch"))
    perDoc.join(base, Seq("doc_id"))
      .select(col("doc_id"),
        explode(filter(col("anch"), a =>
          a.getField("i") + a.getField("l") <= size(col("ws")) &&
            array_join(slice(col("ws"), a.getField("i") + lit(1),
              a.getField("l")), " ") === a.getField("p"))).as("m"))
      .select(col("doc_id"), col("m").getField("p").as("p"))
  }

  /** Per-PHRASE blocklist report — which list entries actually fire,
    * and how broadly: (p, n_docs, n_hits), EVERY phrase present (zero
    * rows for silent entries — the artifact that tells a list curator
    * which patterns are dead weight). Same verified match stream as
    * [[blocklistHits]], one aggregate + a broadcast right-join against
    * the phrase list. */
  def blocklistPhraseStats(docs: DataFrame, textCol: String,
                           idCol: String, phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val agg = verifiedBlocklistMatches(docs, textCol, idCol, phrases)
      .groupBy(col("p"))
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_hits"))
    phrases.toDF("p").join(agg, Seq("p"), "left")
      .select(col("p"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }
}
