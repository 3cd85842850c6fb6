"""Text-analysis operators for LLM-data-pipeline workloads: token
counting, quality scoring, language-ID heuristic, fingerprinting.

Everything is built from native `pyspark.sql.functions` (JVM-side,
whole-stage codegen) — no Python UDFs in any hot path. All derived
ratios are computed from exact integer counts so a DuckDB oracle
evaluating the same formula produces bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# heuristic. Deliberately small + deterministic; real language-ID would
# be a fastText-style model behind a Pandas UDF.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def words_col(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    t = F.trim(F.lower(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """n_chars / n_tokens / avg token length (BPE-ish proxy: tokens =
    whitespace words + punctuation splits are out of scope for the
    synthetic corpus)."""
    ws = words_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(ws).alias("n_tokens"),
    ).withColumn(
        "avg_token_len",
        F.when(
            F.col("n_tokens") > 0,
            # exact ints -> identical double division in any engine
            (F.col("n_chars") - (F.col("n_tokens") - 1)) / F.col("n_tokens"),
        ).otherwise(F.lit(0.0)),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / stopword-ratio quality heuristic. Output: id, n_chars,
    n_tokens, stopword_ratio, quality (0..1)."""
    ws = words_col(F.col(text_col))
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(ws, stop))
    # distinct-stopword presence over word *positions* would need an
    # explode; use the cheap containment count: how many marker words
    # appear at least once.
    out = df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(ws).alias("n_tokens"),
        n_stop.alias("n_stop_markers"),
    )
    return out.withColumn(
        "stopword_ratio",
        F.when(F.col("n_tokens") > 0, F.col("n_stop_markers") / F.col("n_tokens"))
        .otherwise(F.lit(0.0)),
    ).withColumn(
        "quality",
        F.least(
            F.lit(1.0),
            (F.col("n_tokens") / F.lit(100.0)) * F.lit(0.5)
            + F.when(F.col("n_stop_markers") > 0, F.lit(0.5)).otherwise(F.lit(0.0)),
        ),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-marker language-ID heuristic: score each candidate
    language by how many of its marker words occur; highest count wins,
    ties broken by language code; no markers -> 'und' (undetermined)."""
    ws = words_col(F.col(text_col))
    scores = [
        F.size(
            F.array_intersect(ws, F.array(*[F.lit(w) for w in markers]))
        ).alias(f"_s_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), *scores)
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    # iterate in reverse code order so earlier codes win ties
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (F.col(f"_s_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.withColumn("pred_lang", pred).select(
        id_col, "pred_lang", *[f"_s_{lang}" for lang in sorted(LANG_MARKERS)]
    ).toDF(id_col, "pred_lang", *[f"score_{lang}" for lang in sorted(LANG_MARKERS)])


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.80,
    min_stop_markers: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, table A1,
    adapted to a whitespace corpus): token-count bounds, mean-word-
    length bounds, minimum fraction of words containing an alphabetic
    character, and minimum distinct stop-word presence. Every ratio is
    derived from exact integer counts (identical doubles in any
    engine); the whole plan is built-in expressions inside whole-stage
    codegen — `aggregate`/`filter` are Catalyst higher-order functions
    over the in-row token array, NOT Python.

    Output: id, n_tokens, mean_word_len, alpha_frac, n_stop_markers,
    passes (conjunction of all rules).
    """
    ws = words_col(F.col(text_col))
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    sum_chars = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    out = df.select(
        F.col(id_col),
        F.size(ws).alias("n_tokens"),
        sum_chars.alias("_sum_chars"),
        n_alpha.alias("_n_alpha"),
        F.size(F.array_intersect(ws, stop)).alias("n_stop_markers"),
    )
    out = out.withColumn(
        "mean_word_len",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("_sum_chars") / F.col("n_tokens"), 6),
        ).otherwise(F.lit(0.0)),
    ).withColumn(
        "alpha_frac",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("_n_alpha") / F.col("n_tokens"), 6),
        ).otherwise(F.lit(0.0)),
    )
    passes = (
        F.col("n_tokens").between(min_tokens, max_tokens)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("alpha_frac") >= F.lit(min_alpha_frac))
        & (F.col("n_stop_markers") >= F.lit(min_stop_markers))
    )
    return out.withColumn("passes", passes).select(
        id_col, "n_tokens", "mean_word_len", "alpha_frac",
        "n_stop_markers", "passes",
    )


def vocab_top_df(
    df: DataFrame, id_col: str, text_col: str, k: int = 25
) -> DataFrame:
    """Corpus vocabulary analysis: the k terms with the highest
    document frequency. One distinct-terms explode, one
    map-side-combined groupBy on the term, then orderBy+limit — which
    Catalyst executes as TakeOrderedAndProject (per-partition partial
    top-k + driver merge; no task ever holds the full |vocab|). The
    rank is attached afterwards by a literal-keyed window over the
    ALREADY-BOUNDED ≤k survivors, so the single-task window stage is
    O(k) regardless of vocabulary size.

    Output: term, doc_freq, rank (ties by term, total order).
    """
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(words_col(F.col(text_col)))).alias("term"),
    )
    dfreq = terms.groupBy("term").agg(F.count("*").alias("doc_freq"))
    top = dfreq.orderBy(F.col("doc_freq").desc(), F.col("term").asc()).limit(
        k
    )
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("doc_freq").desc(), F.col("term").asc()
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        "term", "doc_freq", "rank"
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-LM quality scoring, the perplexity-filter step of a
    CCNet-style curation pipeline reduced to its distributed skeleton:
    fit a unigram MLE language model ON the corpus itself (P(w) =
    tf(w)/N over token positions), then score each document by its
    mean token log-probability. Outlier documents (gibberish, boiler-
    plate, wrong-language) sit in the low tail; a production pipeline
    swaps the unigram table for KenLM shards — the JOIN SHAPE is the
    part that has to scale, and it is identical.

    Scale shape: positions are reduced to per-(doc, term) counts FIRST
    (map-side combine absorbs duplicate tokens), so the model join is
    (doc-term rows) ⋈ (term stats) — an equi-join on the term, linear,
    with AQE handling stopword-term skew; N is a 1-row broadcast. Per-
    term log-probs are rounded to 9 decimals and accumulated in
    DECIMAL, so every engine/partitioning produces identical doubles
    (the BM25 pattern).

    Output: id, n_tokens, avg_logprob (round 6) — one row per document
    with at least one token.
    """
    tokens = df.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("term")
    )
    # the reduced per-(doc, term) table feeds BOTH the model branch
    # (tf -> n_total) and the scoring join; checkpointed ONCE so the
    # corpus tokenize+explode runs once, not three times (Catalyst has
    # no cross-branch subexpression reuse — optimization round 14,
    # the tfidf_topk posting-table pattern)
    tfd = (
        tokens.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf_d"))
        .localCheckpoint()
    )
    tf = tfd.groupBy("term").agg(F.sum("tf_d").alias("tf"))
    n_total = tf.agg(F.sum("tf").alias("n_total"))
    scored = (
        tfd.join(tf, "term")
        .crossJoin(F.broadcast(n_total))
        .select(
            F.col(id_col),
            "tf_d",
            # ln(p) ∈ (-inf, 0] but ≥ ln(1/N) ≈ -40 even at 100 TB:
            # decimal(12,9) holds it; tf_d ≤ doc length: decimal(12,0).
            # The product stays at precision 25 scale 9 — no silent
            # rescale in Spark, no overflow in DuckDB.
            F.round(F.log(F.col("tf") / F.col("n_total")), 9)
            .cast("decimal(12,9)")
            .alias("_lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf_d").alias("n_tokens"),
            F.sum(F.col("tf_d").cast("decimal(12,0)") * F.col("_lp")).alias(
                "_sum_lp"
            ),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.round(
                F.col("_sum_lp").cast("double") / F.col("n_tokens"), 6
            ).alias("avg_logprob"),
        )
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercase text. (The rolling-hash variant for
    shingle-level fingerprints lives in dedup.py.)"""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(normalized).alias("fingerprint"))


# BPE-ish pre-tokenizer pattern (ASCII form of the GPT-2 split rule:
# letter runs, digit runs, punctuation runs — each with optional
# leading space — kept RE2/Java-compatible so the DuckDB oracle can
# run the identical regex)
BPE_SPLIT_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"

_FP_MOD = 1_000_000_000_000_000  # 10^15: keeps acc*31+v < 2^63 in both engines


def bpe_token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Sub-word-ish token counting with a BPE-style pre-tokenizer
    regex over lowercased text (JVM-side regexp_extract_all — no UDF).

    Output: id, n_bpe_tokens, n_ws_tokens (whitespace baseline).
    """
    lowered = F.lower(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{BPE_SPLIT_PATTERN}', 0)"
            )
        ).alias("n_bpe_tokens"),
        F.size(F.split(F.trim(lowered), r"\s+")).alias("n_ws_tokens"),
    )


def rolling_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-sensitive polynomial rolling hash over the word sequence
    (document fingerprinting): acc = (acc*31 + wordval) mod 1e15, with
    wordval = len*131 + ascii(first) + ascii(last) — every primitive is
    engine-portable, so the oracle computes the identical fold (unlike
    md5-of-text, this fingerprint changes when words are reordered).

    Output: id, rolling_fp.
    """
    wordval = (
        "x -> length(x) * 131 + ascii(x) + ascii(substr(x, -1, 1))"
    )
    fold = F.expr(
        f"aggregate(transform(split(trim(lower({text_col})), '\\\\s+'), {wordval}), "
        f"0L, (acc, v) -> (acc * 31 + v) % {_FP_MOD})"
    )
    return df.select(F.col(id_col), fold.alias("rolling_fp"))


# PII scrubbing: conservative regexes in the syntax subset shared by
# Java regex (Spark) and RE2 (DuckDB) — no lookarounds, no backrefs —
# so oracle parity is testable. Real pipelines extend the pattern
# table; the operator shape (count-then-redact, JVM-side) is the point.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (regex, replacement token)
    "url": (r"https?://[A-Za-z0-9./_\-]+", "<URL>"),
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+[0-9][0-9\-]{6,14}[0-9]", "<PHONE>"),
}


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails / E.164-style phone numbers / URLs with typed
    placeholder tokens and emit per-document match counts (training
    pipelines want the hygiene stats as much as the clean text).
    Counts are taken on the ORIGINAL text; replacements are applied
    URL -> email -> phone (a URL's charset excludes '@' and a phone
    must start '+', so the three never partially consume each other).
    Pure `regexp_count`/`regexp_replace` — JVM-side, scale-safe.

    Output: id, n_urls, n_emails, n_phones, clean_text.
    """
    text = F.col(text_col)
    clean = text
    for name in ("url", "email", "phone"):
        pat, repl = PII_PATTERNS[name]
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(PII_PATTERNS["url"][0])).alias("n_urls"),
        F.regexp_count(text, F.lit(PII_PATTERNS["email"][0])).alias("n_emails"),
        F.regexp_count(text, F.lit(PII_PATTERNS["phone"][0])).alias("n_phones"),
        clean.alias("clean_text"),
    )


def quality_classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 1024,
    threshold: float = 0.5,
) -> DataFrame:
    """Model-based quality filtering, the fastText-classifier step of a
    DCLM/FineWeb-Edu-style curation pipeline reduced to its
    distributed skeleton: a linear scorer over hashing-trick
    bag-of-words features. The weight vector here is a deterministic
    hash function of the feature index (md5 arithmetic, integer
    weights in [-1000, 1000] at scale 1/1000), so the SCORING PLAN —
    the part that has to scale — is exactly a production classifier's
    (per-token feature hash, map-side-combined per-doc reduction,
    sigmoid on the dot product) while every number stays
    engine-recomputable; a deployment swaps the hash weights for a
    trained artifact without touching the plan.

    Per-token integer weights are accumulated as BIGINT (exact — no
    float-order divergence), divided once per document. Score and
    sigmoid are emitted as parts-per-million BIGINTs via the explicit
    half-up rule floor(x*1e6 + 0.5) (the `quantize_embeddings`
    pattern): `round(double, 6)` half-boundary handling differs
    between engines, and scores like w_sum/(1000*16) hit exact
    7-decimal halves constantly.

    Output: id, n_tokens, w_sum (exact), score_ppm, prob_ppm, keep.
    """
    tokens = df.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("term")
    )
    idx = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
        % dim
    )
    w_int = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("w:"), idx.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2001
        - 1000
    )
    per_doc = tokens.select(F.col(id_col), w_int.alias("_w")).groupBy(
        id_col
    ).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("_w").cast("long").alias("w_sum"),
    )
    score = F.col("w_sum") / (F.lit(1000.0) * F.col("n_tokens"))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(4.0) * score))
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        "w_sum",
        F.floor(score * F.lit(1e6) + F.lit(0.5)).cast("long").alias(
            "score_ppm"
        ),
        F.floor(prob * F.lit(1e6) + F.lit(0.5)).cast("long").alias(
            "prob_ppm"
        ),
        (prob >= F.lit(threshold)).alias("keep"),
    )


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Shannon entropy over characters — the classic
    zero-model gibberish/boilerplate signal (natural text sits near
    ~4.1 bits/char; 'aaaa…' near 0; random base64 near 6): H =
    -Σ_c p_c log2 p_c over the lowercased character distribution.

    Scale shape: one explode to (doc, char), one map-side-combined
    groupBy(doc, char), one groupBy(doc) — per-char terms are rounded
    to 9 decimals and accumulated in DECIMAL (the repo-wide
    float-order rule), and the entropy ships as micro-bits (ppm of a
    bit) under the explicit half-up rule.

    Output: id, n_chars, n_distinct_chars, entropy_ubits.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "")).alias("ch"),
    ).where(F.col("ch") != "")
    # reduced (doc, char) counts feed both the totals branch and the
    # per-char terms — checkpointed once so the character explode
    # (|corpus text| rows) runs once, not twice (optimization round 14)
    counts = (
        chars.groupBy(id_col, "ch")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()
    )
    totals = counts.groupBy(id_col).agg(F.sum("cnt").alias("n_chars"))
    terms = counts.join(totals, id_col).select(
        F.col(id_col),
        "n_chars",
        F.round(
            -(F.col("cnt") / F.col("n_chars"))
            * F.log2(F.col("cnt") / F.col("n_chars")),
            9,
        )
        .cast("decimal(12,9)")
        .alias("_h"),
    )
    return terms.groupBy(id_col, "n_chars").agg(
        F.count("*").cast("long").alias("n_distinct_chars"),
        F.floor(F.sum("_h").cast("double") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("entropy_ubits"),
    ).select(id_col, "n_chars", "n_distinct_chars", "entropy_ubits")


def bigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-bigram-LM scoring — the n>1 upgrade of
    `unigram_logprob` with the KenLM-shard join shape: fit bigram MLE
    ON the corpus (P(w2|w1) = c(w1 w2) / c(w1 ·), the prefix count,
    so probabilities normalize per context), then score each document
    by its mean bigram log-probability. Scoring the training corpus
    itself means every scored bigram has c >= 1 — no smoothing branch
    to diverge between engines.

    Scale shape: bigram positions reduce to per-(doc, bigram) counts
    FIRST (map-side combine), the model join is (doc-bigram rows) ⋈
    (bigram counts) ⋈ (prefix counts) — equi-joins on the gram keys,
    linear; per-term log-probs round to 9 decimals and accumulate in
    DECIMAL.

    Output: id, n_bigrams, avg_logprob (round 6) — docs with >= 2
    tokens.
    """
    base = df.select(
        F.col(id_col), words_col(F.col(text_col)).alias("_ws")
    ).where(F.size("_ws") >= 2)
    bigrams = base.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(0, size(_ws) - 2), i -> "
                "concat_ws(' ', _ws[i], _ws[i + 1]))"
            )
        ).alias("bg"),
    )
    tfd = bigrams.groupBy(id_col, "bg").agg(F.count("*").alias("tf_d"))
    c12 = tfd.groupBy("bg").agg(F.sum("tf_d").alias("c12"))
    prefix = bigrams.select(
        F.substring_index("bg", " ", 1).alias("w1")
    ).groupBy("w1").agg(F.count("*").alias("c1"))
    scored = (
        tfd.join(c12, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(prefix, "w1")
        .select(
            F.col(id_col),
            "tf_d",
            F.round(F.log(F.col("c12") / F.col("c1")), 9)
            .cast("decimal(12,9)")
            .alias("_lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf_d").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.col("tf_d").cast("decimal(12,0)") * F.col("_lp")
                ).cast("double")
                / F.sum("tf_d"),
                6,
            ).alias("avg_logprob"),
        )
    )



def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 25,
    min_count: int = 5,
) -> DataFrame:
    """Collocation / phrase mining by pointwise mutual information —
    the corpus-statistics step that seeds multi-word tokenizer entries
    and phrase tables (Mikolov et al. 2013 §4 uses exactly this score
    to promote "new york" -> "new_york" before embedding training).

    PMI(a,b) = ln( P(a,b) / (P(a)P(b)) ) over ADJACENT token pairs,
    computed from exact integer counts: c_ab (bigram), c_a/c_b
    (unigram positions), N (total bigram positions). The float
    expression is the single shared form
    ln( (c_ab * N) / (c_a * c_b) ) evaluated on doubles in that exact
    operand order on both engines, rounded to 6 — integer-derived, so
    cross-engine identical.

    Scale shape: one explode to (doc, pos, term); bigrams come from a
    row-local zip of the token array with its own tail (NO self-join
    on position); unigram and bigram tables are map-side-combined
    groupBys; the two marginal attachments are equi-joins on the term
    (AQE handles stopword skew); N is a 1-row broadcast. Top-k by
    (PMI, pair) runs orderBy+limit — TakeOrderedAndProject — with the
    rank attached over the bounded survivors (the vocab_topk
    pattern). min_count keeps hapax noise out (PMI is maximal for
    pairs seen once, which is exactly what you don't want).

    Output: w1, w2, c_ab, pmi_6 (round 6), rank.
    """
    from pyspark.sql import Window

    toks = df.select(words_col(F.col(text_col)).alias("_w"))
    bigrams = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("_w"), 1, F.greatest(F.size("_w") - 1, F.lit(0))),
                F.slice(F.col("_w"), 2, F.greatest(F.size("_w") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    uni1 = bigrams.groupBy("w1").agg(F.count("*").alias("c_a"))
    uni2 = bigrams.groupBy("w2").agg(F.count("*").alias("c_b"))
    n_total = bigrams.agg(F.count("*").alias("n_bigrams"))
    scored = (
        big.where(F.col("c_ab") >= min_count)
        .join(uni1, "w1")
        .join(uni2, "w2")
        .crossJoin(F.broadcast(n_total))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab").cast("double") * F.col("n_bigrams"))
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                ),
                6,
            ).alias("pmi_6"),
        )
    )
    top = scored.orderBy(
        F.col("pmi_6").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("pmi_6").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        "w1", "w2", "c_ab", "pmi_6", "rank"
    )


HTML_TAG_RE = "<[^>]*>"
HTML_SCRIPT_RE = "(?s)<script[^>]*>.*?</script>"
HTML_STYLE_RE = "(?s)<style[^>]*>.*?</style>"


def html_strip(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """HTML -> text extraction, the first step of every web-crawl
    curation pipeline (C4/CCNet strip markup before any quality
    scoring; trafilatura/jusText are the production extractors — this
    is the distributed regex skeleton whose PLAN is the part that has
    to scale, and it is a pure map-side projection).

    Order matters and is part of the contract: script and style
    blocks go FIRST (their text content must not leak into the clean
    text), then remaining tags, then the five standard entities, then
    whitespace collapse. Patterns stay in the Java-regex/RE2 shared
    subset ((?s) dotall inline flag, no lookaround, no backrefs) so
    the DuckDB oracle runs the literal same strings.

    Output: id, text (clean), n_tags (tags removed incl. script/style
    openers), n_scripts, had_html.
    """
    t0 = F.col(text_col)
    n_scripts = F.regexp_count(t0, F.lit(HTML_SCRIPT_RE)) + F.regexp_count(
        t0, F.lit(HTML_STYLE_RE)
    )
    n_tags = F.regexp_count(t0, F.lit(HTML_TAG_RE))
    t1 = F.regexp_replace(t0, HTML_SCRIPT_RE, " ")
    t2 = F.regexp_replace(t1, HTML_STYLE_RE, " ")
    t3 = F.regexp_replace(t2, HTML_TAG_RE, " ")
    # &amp; must decode LAST: source text "&amp;lt;" means a literal
    # "&lt;" — decoding &amp; first would turn it into "&lt;" and then
    # a second pass into "<" (double-decoding escaped entities)
    ents = [
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&amp;", "&"),
    ]
    t4 = t3
    for src, dst in ents:
        t4 = F.replace(t4, F.lit(src), F.lit(dst))
    clean = F.trim(F.regexp_replace(t4, r"\s+", " "))
    return df.select(
        F.col(id_col),
        clean.alias(text_col),
        n_tags.cast("long").alias("n_tags"),
        n_scripts.cast("long").alias("n_scripts"),
        (n_tags > 0).alias("had_html"),
    )
