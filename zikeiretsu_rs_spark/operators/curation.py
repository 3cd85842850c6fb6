"""Corpus-curation operators beyond per-document text analysis:
eval-set decontamination, intra-document repetition scoring
(Gopher-style rules), token-budget sequence packing, and source-level
quality rollups.

The reference engine is a pure TSDB (its query surface stops at the
operators mapped in SURVEY.md §2); these extend the engine with the
document-lake operations a large-scale LLM training-data pipeline
needs on top of the dedup/similarity/text families:

- ``eval_ngram_overlap``: n-gram decontamination of a training split
  against a held-out eval split (the classic "remove test-set leakage
  before pretraining" pass). Linear: one distinct-shingle explode per
  side, one broadcast semi-join on the shingle key. The eval side of a
  real pipeline is tiny relative to the corpus, so the overlap join is
  always broadcast-able; at extreme eval sizes the same plan degrades
  gracefully to a shuffled equi-join on the shingle string (a fixed-
  width ``xxhash64`` key join is a drop-in swap when exact string
  parity with an external oracle is not required).
- ``repetition_stats``: duplicate-5-gram fraction and top-2-gram
  fraction per document (the Gopher repetition rules, token-based).
  Per-document explode + partial-aggregated groupBy — no cross-doc
  state, embarrassingly parallel.
- ``pack_sequences``: deterministic token-budget sequence packing —
  assign documents to fixed-budget packs by running token count within
  a partition key, the shuffle-free precursor to writing fixed-length
  training shards. Windows are keyed (never global), so the plan
  scales by key cardinality.
- ``source_rollup``: per-source (domain-level) corpus hygiene — doc
  counts, exact-duplicate rate, low-quality rate, token totals, and a
  keep/drop verdict. Digest-only shuffle for the duplicate count, then
  a source-keyed aggregate; integer-exact outputs so the rollup is
  engine-reproducible bit-for-bit.

All four are pure built-in-expression plans (no Python UDFs), keep
aggregates integer-exact where engines could diverge on float
summation order, and round every emitted double to 6 decimals (the
repo-wide oracle-parity rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import word_shingles
from .text import quality_score, words_col

__all__ = [
    "eval_ngram_overlap",
    "duplicated_span_stats",
    "chunk_documents",
    "repetition_stats",
    "pack_sequences",
    "source_rollup",
]


def eval_ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    threshold: float = 0.25,
) -> DataFrame:
    """Flag training documents contaminated by the eval set: for each
    train doc with >= ``n`` words, the fraction of its distinct word
    n-grams that appear in ANY eval document.

    Output: (id, n_grams, n_overlap, contamination, is_contaminated),
    one row per train doc with at least one n-gram.
    """
    train_grams = word_shingles(train, id_col, text_col, n=n)
    eval_grams = (
        word_shingles(eval_df, id_col, text_col, n=n)
        .select("shingle")
        .distinct()
    )
    # single-pass formulation (optimization round 14): a broadcast
    # LEFT join against the DISTINCT eval-gram set tags each train
    # gram with a hit flag (multiplicity 1 — the eval side is
    # distinct), so total and overlap counts come out of ONE
    # map-side-combined groupBy. The former totals ⋈ hits shape
    # re-derived the train-gram explode in both branches (Catalyst has
    # no cross-branch subexpression reuse) and paid an extra join.
    # Integers identical: n_grams counts the same rows, n_overlap
    # counts exactly the semi-join survivors.
    tagged = train_grams.join(
        F.broadcast(eval_grams.withColumn("_m", F.lit(1))),
        "shingle",
        "left",
    )
    out = (
        tagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("_m"), F.lit(0)).cast("long").alias(
                "n_overlap"
            ),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_overlap") / F.col("n_grams"), 6),
        )
        .withColumn(
            "is_contaminated", F.col("contamination") >= F.lit(threshold)
        )
    )
    return out.select(
        id_col, "n_grams", "n_overlap", "contamination", "is_contaminated"
    )


def duplicated_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_df: int = 2,
    hash_spans: bool = False,
) -> DataFrame:
    """Span-level duplication metric (the memorization signal behind
    substring-level train-data dedup, cf. Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document, the fraction of its position-level word k-gram
    spans whose k-gram occurs in at least ``min_df`` distinct
    documents corpus-wide.

    Scale shape: one explode to (doc, gram) positions, one
    partial-aggregated groupBy for corpus-wide doc frequencies, one
    shuffled equi-join of positions against the ≥min_df gram set
    (linear — both sides keyed by the gram; ``hash_spans`` switches
    the shuffle key to xxhash64 8-byte ints, same trade-off as
    `dedup.ngram_jaccard_pairs(hash_shingles=True)`). No quadratic
    stage: unlike the shingle self-join, a hot gram contributes
    O(occurrences) rows, not O(occurrences²).

    Output: id, n_spans, n_dup_spans, dup_frac — docs with >= k words
    only.
    """
    grams = (
        df.select(F.col(id_col), words_col(F.col(text_col)).alias("_ws"))
        .where(F.size("_ws") >= k)
        .select(F.col(id_col), F.explode(_gram_col(k)).alias("gram"))
    )
    if hash_spans:
        grams = grams.select(F.col(id_col), F.xxhash64("gram").alias("gram"))
    # Single-lineage formulation: reduce to per-(doc, gram) counts once
    # (map-side combined), then two KEYED windows — doc frequency over
    # the gram key, totals over the doc key. ONE corpus scan and ONE
    # explode; the naive three-branch version (df aggregate + totals
    # aggregate + semi-join) re-scans and re-explodes the corpus three
    # times, which is the difference between 1x and 3x the dominant
    # cost at lake scale.
    tf = grams.groupBy(id_col, "gram").agg(F.count("*").alias("_tf"))
    tf = tf.withColumn(
        "_df", F.count("*").over(Window.partitionBy("gram"))
    )
    out = tf.groupBy(id_col).agg(
        F.sum("_tf").alias("n_spans"),
        F.sum(
            F.when(F.col("_df") >= min_df, F.col("_tf")).otherwise(F.lit(0))
        ).alias("n_dup_spans"),
    )
    return out.withColumn(
        "dup_frac", F.round(F.col("n_dup_spans") / F.col("n_spans"), 6)
    ).select(id_col, "n_spans", "n_dup_spans", "dup_frac")


def source_mix_weights(
    df: DataFrame,
    source_col: str,
    text_col: str,
    target_shares: dict[str, float],
) -> DataFrame:
    """Mixture planning: given target token SHARES per source (the
    data-mixing recipe of a pretraining run), compute each source's
    acceptance rate so the sampled corpus hits the target proportions
    while keeping as many tokens as possible.

    The binding constraint is the source with the smallest
    available/target ratio: total_budget = min_s(tokens_s / share_s);
    rate_s = share_s * total_budget / tokens_s (== 1 for the binding
    source, < 1 for over-represented ones). Token counts are whitespace
    tokens (`words_col`), summed exactly.

    Scale shape: one groupBy(source) over map-side-combined token
    counts, a 1-row min-aggregate broadcast back — no data shuffle
    beyond the per-source rollup; sources number in the hundreds, not
    millions.

    Output: source, n_docs, n_tokens, target_share, acceptance_rate
    (round 6), expected_tokens (round 2).
    """
    shares = F.create_map(
        *[F.lit(x) for kv in target_shares.items() for x in kv]
    )
    per_src = (
        df.select(
            F.col(source_col).alias("source"),
            F.size(words_col(F.col(text_col))).alias("_nt"),
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("_nt").alias("n_tokens"))
        .withColumn("target_share", shares[F.col("source")])
    )
    known = per_src.where(
        F.col("target_share").isNotNull() & (F.col("target_share") > 0)
    )
    budget = known.agg(
        F.min(F.col("n_tokens") / F.col("target_share")).alias("_budget")
    )
    return (
        per_src.crossJoin(F.broadcast(budget))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.coalesce(F.col("target_share"), F.lit(0.0)).alias(
                "target_share"
            ),
            F.round(
                F.when(
                    F.col("target_share").isNotNull()
                    & (F.col("target_share") > 0),
                    F.least(
                        F.lit(1.0),
                        F.col("target_share")
                        * F.col("_budget")
                        / F.col("n_tokens"),
                    ),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("acceptance_rate"),
        )
        .withColumn(
            "expected_tokens",
            F.round(F.col("acceptance_rate") * F.col("n_tokens"), 2),
        )
    )


def source_overlap_matrix(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    source_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cross-source duplication diagnostic: project a near-dup PAIR set
    (from any dedup family — exact, n-gram, MinHash-verified) onto the
    source dimension and count pairs per unordered source pair. High
    off-diagonal counts mean two feeds syndicate the same content —
    the signal that drives source-level dedup priorities and mixing
    corrections in a crawl lake.

    Scale shape: two broadcast-or-shuffle equi-joins of the (small)
    pair set against the (id -> source) projection, then a groupBy on
    the source pair — cost is O(|pairs|), never O(corpus²); the pair
    set itself comes from the linear banded path at scale.

    Output: source_lo <= source_hi (lexicographic), n_pairs.
    """
    src = docs.select(
        F.col(id_col).alias("_id"), F.col(source_col).alias("_src")
    )
    joined = (
        pairs.select(id_a, id_b)
        .join(
            src.select(
                F.col("_id").alias(id_a), F.col("_src").alias("_src_a")
            ),
            id_a,
        )
        .join(
            src.select(
                F.col("_id").alias(id_b), F.col("_src").alias("_src_b")
            ),
            id_b,
        )
    )
    return (
        joined.select(
            F.least("_src_a", "_src_b").alias("source_lo"),
            F.greatest("_src_a", "_src_b").alias("source_hi"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count("*").alias("n_pairs"))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding-window document chunking — the training-prep step that
    turns long documents into fixed-budget, optionally-overlapping
    token windows (stride < chunk_tokens gives the classic overlap
    that preserves cross-boundary context). Pure map-side explode of
    per-row start offsets: no shuffle at all, embarrassingly parallel,
    output order deterministic via (id, chunk_idx).

    Output: id, chunk_idx, start_token, n_chunk_tokens, chunk_text.
    Documents with zero tokens produce no chunks.
    """
    ws = words_col(F.col(text_col))
    starts = F.expr(
        f"sequence(0, size({'_ws'}) - 1, {stride})"
    )
    base = (
        df.select(F.col(id_col), ws.alias("_ws"))
        .where(F.size("_ws") > 0)
        .select(F.col(id_col), "_ws", F.explode(starts).alias("start_token"))
    )
    chunk = F.slice(F.col("_ws"), F.col("start_token") + 1, chunk_tokens)
    return base.select(
        F.col(id_col),
        (F.col("start_token") / stride).cast("long").alias("chunk_idx"),
        "start_token",
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def chunk_containment(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    stride: int = 24,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_doc_freq: int | None = 64,
    hash_shingles: bool = True,
) -> DataFrame:
    """Partial-overlap (containment) detection: document-level near-dup
    misses the case where doc A merely QUOTES a chunk of doc B
    (boilerplate, syndication, template reuse). Chunk both docs with a
    sliding window, find cross-document near-duplicate CHUNK pairs,
    and report per doc pair the fraction of each side's chunks that
    have a near-dup on the other side.

    Chunk ids are `doc_id * 100_000 + chunk_idx` (fits documents up to
    ~2.4M tokens at the default stride; swap for a struct key beyond
    that). The chunk pair join is `dedup.ngram_jaccard_pairs`.

    The skew guard defaults ON: chunk-level shingles are MORE
    boilerplate-heavy than whole documents (the operator's premise is
    repeated quoting), so the unguarded shingle self-join is exactly
    the quadratic stop-shingle hazard the bench skew section measures.
    The default cap (64) sits above the fixture corpora's max
    chunk-shingle doc-frequency (30 at sf0.1, measured), so guarded
    output is value-identical to the exact form at every test sf while
    bounding per-shingle join fanout at production scale; pass
    `max_shingle_doc_freq=None, hash_shingles=False` explicitly for
    the unguarded oracle-parity twin.

    Output: doc_lo < doc_hi, matched_lo/hi (distinct chunks with a
    cross-side near-dup), n_chunks_lo/hi, containment_lo/hi (round 6).
    """
    from .dedup import ngram_jaccard_pairs

    surr = 100_000
    # checkpointed ONCE: the chunk table feeds both the pair pipeline
    # and the per-doc chunk-count branch — without it the corpus
    # tokenize + chunk explode runs twice (optimization round 14)
    chunks = chunk_documents(
        df, id_col, text_col, chunk_tokens, stride
    ).localCheckpoint()
    cdf = chunks.select(
        (F.col(id_col) * surr + F.col("chunk_idx")).alias("cid"),
        "chunk_text",
    )
    pairs = ngram_jaccard_pairs(
        cdf,
        "cid",
        "chunk_text",
        n=n,
        threshold=threshold,
        max_shingle_doc_freq=max_shingle_doc_freq,
        hash_shingles=hash_shingles,
    )
    # cid_a < cid_b implies doc_a <= doc_b; keep cross-document pairs
    cross = pairs.select(
        (F.col("id_a") / surr).cast("long").alias("doc_lo"),
        F.col("id_a").alias("cid_lo"),
        (F.col("id_b") / surr).cast("long").alias("doc_hi"),
        F.col("id_b").alias("cid_hi"),
    ).where(F.col("doc_lo") != F.col("doc_hi"))
    matched = cross.groupBy("doc_lo", "doc_hi").agg(
        F.count_distinct("cid_lo").alias("matched_lo"),
        F.count_distinct("cid_hi").alias("matched_hi"),
    )
    sizes = chunks.groupBy(id_col).agg(F.count("*").alias("nc"))
    return (
        matched.join(
            sizes.select(
                F.col(id_col).alias("doc_lo"), F.col("nc").alias("n_chunks_lo")
            ),
            "doc_lo",
        )
        .join(
            sizes.select(
                F.col(id_col).alias("doc_hi"), F.col("nc").alias("n_chunks_hi")
            ),
            "doc_hi",
        )
        .select(
            "doc_lo",
            "doc_hi",
            "matched_lo",
            "matched_hi",
            "n_chunks_lo",
            "n_chunks_hi",
            F.round(F.col("matched_lo") / F.col("n_chunks_lo"), 6).alias(
                "containment_lo"
            ),
            F.round(F.col("matched_hi") / F.col("n_chunks_hi"), 6).alias(
                "containment_hi"
            ),
        )
    )


def _gram_col(n: int) -> Column:
    """All (non-distinct) word n-grams of the ``_ws`` array column."""
    return F.expr(
        f"transform(sequence(0, size(_ws) - {n}), i -> "
        + "concat_ws(' ', "
        + ", ".join(f"_ws[i + {j}]" for j in range(n))
        + "))"
    )


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dup_n: int = 5,
    top_n: int = 2,
    dup_frac_max: float = 0.15,
    top_frac_max: float = 0.20,
) -> DataFrame:
    """Gopher-style intra-document repetition rules, token-based:

    - ``dup_5gram_frac``: 1 - distinct/total word ``dup_n``-grams —
      how much of the document is covered by n-grams it repeats.
    - ``top_2gram_frac``: tokens covered by the single most frequent
      ``top_n``-gram (occurrences x n / n_tokens, capped at 1.0 since
      overlapping occurrences can over-count).

    Documents shorter than ``dup_n`` words carry no signal and are
    dropped. Output: (id, n_tokens, total_5grams, distinct_5grams,
    dup_5gram_frac, top_2gram_count, top_2gram_frac, is_repetitive).
    """
    base = (
        df.select(F.col(id_col), words_col(F.col(text_col)).alias("_ws"))
        .withColumn("n_tokens", F.size("_ws"))
        .where(F.col("n_tokens") >= dup_n)
    )
    g_dup = base.select(
        id_col, "n_tokens", F.explode(_gram_col(dup_n)).alias("g")
    )
    a_dup = g_dup.groupBy(id_col, "n_tokens").agg(
        F.count("*").alias("total_5grams"),
        F.count_distinct("g").alias("distinct_5grams"),
    )
    g_top = (
        base.select(F.col(id_col), F.explode(_gram_col(top_n)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_2gram_count"))
    )
    out = (
        a_dup.join(g_top, id_col)
        .withColumn(
            "dup_5gram_frac",
            F.round(
                F.lit(1.0) - F.col("distinct_5grams") / F.col("total_5grams"),
                6,
            ),
        )
        .withColumn(
            "top_2gram_frac",
            F.least(
                F.lit(1.0),
                F.round(
                    F.col("top_2gram_count") * top_n / F.col("n_tokens"), 6
                ),
            ),
        )
        .withColumn(
            "is_repetitive",
            (F.col("dup_5gram_frac") > dup_frac_max)
            | (F.col("top_2gram_frac") > top_frac_max),
        )
    )
    return out.select(
        id_col,
        "n_tokens",
        "total_5grams",
        "distinct_5grams",
        "dup_5gram_frac",
        "top_2gram_count",
        "top_2gram_frac",
        "is_repetitive",
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    key_col: str,
    budget: int = 256,
) -> DataFrame:
    """Deterministic token-budget sequence packing: within each
    ``key_col`` partition, walk documents in ``id_col`` order and start
    a new pack whenever the running token count crosses a ``budget``
    boundary (a document that straddles the boundary belongs to the
    pack it started in, so packs can overflow but never reorder).

    Emits one row per pack: (key, pack_id, n_docs, pack_tokens,
    first_doc, last_doc, fill_ratio). The window is keyed — pack
    assignment never requires a global sort, so the plan scales with
    key cardinality, not corpus size.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = (
        df.select(
            F.col(key_col),
            F.col(id_col),
            F.size(words_col(F.col(text_col))).alias("n_tokens"),
        )
        .withColumn(
            "_cum_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "pack_id", F.floor(F.col("_cum_before") / F.lit(budget))
        )
    )
    return (
        toks.groupBy(key_col, "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .withColumn(
            "fill_ratio", F.round(F.col("pack_tokens") / F.lit(budget), 6)
        )
    )


def source_rollup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    quality_min: float = 0.5,
) -> DataFrame:
    """Domain-level corpus hygiene rollup: per source, document count,
    corpus-wide exact-duplicate rate (md5 digest appearing in more than
    one row anywhere), low-quality rate (quality < ``quality_min``
    using the standard quality heuristic), token totals, and a
    keep/drop verdict (drop sources that are mostly duplicates or
    mostly low-quality).

    All ratios derive from integer counts — no float summation, so the
    rollup is bit-identical across engines and partitionings. The
    duplicate count shuffles digests only (16-byte keys), never text.
    """
    digests = df.select(
        F.col(id_col),
        F.col(source_col),
        F.md5(F.col(text_col)).alias("_digest"),
    )
    dup_digests = (
        digests.groupBy("_digest")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > 1)
        .select("_digest")
    )
    flagged = digests.join(
        F.broadcast(dup_digests), "_digest", "left_semi"
    ).select(F.col(id_col), F.lit(1).alias("_dup"))
    q = quality_score(df, id_col, text_col).select(
        id_col, "n_tokens", "quality"
    )
    per_doc = (
        df.select(F.col(id_col), F.col(source_col))
        .join(q, id_col)
        .join(flagged, id_col, "left")
        .withColumn("_dup", F.coalesce(F.col("_dup"), F.lit(0)))
        .withColumn(
            "_low", (F.col("quality") < F.lit(quality_min)).cast("int")
        )
    )
    out = (
        per_doc.groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_dup").alias("n_dup_docs"),
            F.sum("_low").alias("n_low_quality"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn(
            "dup_rate", F.round(F.col("n_dup_docs") / F.col("n_docs"), 6)
        )
        .withColumn(
            "low_quality_rate",
            F.round(F.col("n_low_quality") / F.col("n_docs"), 6),
        )
        .withColumn(
            "avg_tokens",
            F.round(F.col("total_tokens") / F.col("n_docs"), 6),
        )
        .withColumn(
            "keep_source",
            (F.col("dup_rate") <= 0.5) & (F.col("low_quality_rate") <= 0.5),
        )
    )
    return out.select(
        source_col,
        "n_docs",
        "n_dup_docs",
        "n_low_quality",
        "total_tokens",
        "dup_rate",
        "low_quality_rate",
        "avg_tokens",
        "keep_source",
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
    mask: int = 16,
) -> DataFrame:
    """Content-defined chunking (the Rabin/FastCDC family): a chunk
    boundary falls after word i wherever the rolling hash of the last
    `window` words is 0 mod `mask` (expected chunk length = `mask`
    words), plus a forced boundary at the end. Unlike the fixed-stride
    `chunk_documents`, boundaries are functions of LOCAL CONTENT — an
    edit near the front of a document shifts word positions but leaves
    every later boundary (and so every later chunk hash) intact, which
    is what makes CDC the dedup-friendly chunking: near-identical
    documents share most chunk fingerprints despite insertions
    (pinned in tests).

    The rolling hash and the per-chunk fingerprint use the engine-
    portable word-value arithmetic of `rolling_fingerprint` (length /
    first / last char), so the oracle recomputes both; the fold runs
    mod 1e15 with init 0.

    Pure Catalyst array expressions — no UDF, no shuffle; one output
    row per chunk via a single posexplode.

    Output: id, chunk_idx (1-based), start_word (1-based), n_words,
    chunk_fp.
    """
    mod = 1_000_000_007
    fp_mod = 10**15
    wv = "x -> length(x) * 131 + ascii(x) + ascii(substr(x, -1, 1))"
    # 31^(window-1-j) coefficients for the rolling window hash
    coeffs = [31 ** (window - 1 - j) for j in range(window)]
    roll = " + ".join(
        f"element_at(_wv, cast(i as int) - {window - 1 - j}) * {coeffs[j]}L"
        for j in range(window)
    )
    base = df.select(
        F.col(id_col),
        F.expr(
            f"transform(split(trim(lower({text_col})), '\\\\s+'), {wv})"
        ).alias("_wv"),
    ).where(F.size("_wv") > 0)
    # boundary positions: every i in [window, n] with hash%mask==0,
    # plus n itself (array_distinct keeps the first occurrence)
    bounded = base.withColumn(
        "_bnd",
        F.expr(
            f"array_distinct(concat("
            f"  IF(size(_wv) >= {window},"
            f"     filter(transform(sequence({window}, size(_wv)),"
            f"       i -> IF((({roll}) % {mod}) % {mask} = 0,"
            f"            cast(i as int), -1)),"
            f"       x -> x != -1),"
            f"     cast(array() as array<int>)),"
            f"  array(size(_wv))))"
        ),
    )
    return bounded.select(
        F.col(id_col),
        "_wv",
        "_bnd",
        F.posexplode(F.expr("sequence(1, size(_bnd))")).alias("_p", "_j"),
    ).select(
        F.col(id_col),
        F.col("_j").cast("long").alias("chunk_idx"),
        F.expr(
            "IF(_j = 1, 1, element_at(_bnd, _j - 1) + 1)"
        ).cast("long").alias("start_word"),
        F.expr(
            "element_at(_bnd, _j) - IF(_j = 1, 0, element_at(_bnd, _j - 1))"
        ).cast("long").alias("n_words"),
        F.expr(
            f"aggregate(slice(_wv, IF(_j = 1, 1, element_at(_bnd, _j - 1)"
            f" + 1), element_at(_bnd, _j)"
            f" - IF(_j = 1, 0, element_at(_bnd, _j - 1))),"
            f" 0L, (acc, v) -> (acc * 31 + v) % {fp_mod})"
        ).alias("chunk_fp"),
    )


def source_temperature_weights(
    df: DataFrame,
    source_col: str,
    text_col: str,
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-based mixture weighting (the multilingual/multi-
    source sampling rule of GPT-3 / PaLM / mT5): sampling probability
    p_s ∝ n_s^alpha, so alpha < 1 up-weights small sources relative
    to their natural share and alpha = 1 recovers proportional
    sampling. Reported per source: the natural token share, the
    temperature-adjusted share, and the relative up/down-weight
    factor.

    Scale shape: identical to `source_mix_weights` — one
    map-side-combined groupBy(source), a 1-row normalization
    broadcast; shares are emitted as parts-per-million BIGINTs via
    the explicit half-up rule. The pow terms are ROUNDED to 6
    decimals and accumulated in DECIMAL (the repo-wide
    round-then-DECIMAL rule): a raw double sum's partial-aggregation
    order is not guaranteed, so a ppm value sitting on a half
    boundary could flip between runs/partitionings.

    Output: source, n_docs, n_tokens, natural_share_ppm,
    temperature_share_ppm, boost_ppm (temperature/natural * 1e6).
    """
    per_src = (
        df.select(
            F.col(source_col).alias("source"),
            F.size(words_col(F.col(text_col))).alias("_nt"),
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("_nt").alias("n_tokens"))
    )
    # per-source pow term, rounded once; every downstream use (the
    # total AND the numerators) consumes this same rounded value
    pw = F.round(F.pow(F.col("n_tokens"), F.lit(alpha)), 6).cast(
        "decimal(30,6)"
    )
    per_src = per_src.withColumn("_pw", pw)
    totals = per_src.agg(
        F.sum("n_tokens").alias("_total"),
        F.sum("_pw").alias("_ptotal"),
    )
    nat = F.col("n_tokens") / F.col("_total")
    temp = F.col("_pw").cast("double") / F.col("_ptotal").cast("double")
    ppm = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            ppm(nat).alias("natural_share_ppm"),
            ppm(temp).alias("temperature_share_ppm"),
            ppm(temp / nat).alias("boost_ppm"),
        )
    )


def quality_rank_normalize(
    df: DataFrame,
    id_col: str,
    source_col: str,
    quality_col: str,
) -> DataFrame:
    """Per-source percentile-rank calibration of a quality score —
    the step before a GLOBAL quality threshold when sources have
    incomparable score distributions (a web crawl's 0.6 is not a
    curated corpus's 0.6): within each source, pct = (rank-1)/(n-1)
    over (quality, id) order, so thresholding at pct >= p keeps the
    same top fraction of EVERY source.

    Scale shape: one source-keyed window (rank + count share a single
    Exchange); deterministic total order via the id tiebreak;
    percentile emitted as ppm under the explicit half-up rule.
    Single-document sources emit pct 0 (defined, not NULL).

    Output: id, source, quality, pct_ppm.
    """
    w_rank = Window.partitionBy(source_col).orderBy(
        F.col(quality_col).asc(), F.col(id_col).asc()
    )
    w_all = Window.partitionBy(source_col)
    rank = F.row_number().over(w_rank)
    n = F.count("*").over(w_all)
    pct = F.when(n > 1, (rank - F.lit(1)) / (n - F.lit(1))).otherwise(
        F.lit(0.0)
    )
    return df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.col(quality_col).alias("quality"),
        F.floor(pct * F.lit(1e6) + F.lit(0.5)).cast("long").alias("pct_ppm"),
    )


def remove_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Cross-document duplicated-span REMOVAL (the scrub step of Lee
    et al. 2022's exact-substring dedup, where `duplicated_span_stats`
    is the diagnostic): every token covered by a word k-gram that
    occurs in >= `min_doc_freq` DISTINCT documents is removed from
    EVERY document — including the first occurrence, which is what
    distinguishes memorization scrubbing from `line_dedup`'s
    keep-first rule. Intra-document repeats are a different signal
    (`repetition_stats`) and are not touched here.

    Scale shape: positions explode once to (doc, pos, gram); gram doc
    frequency is a gram-keyed window over per-(doc, gram) reduced
    rows (the `duplicated_span_stats` single-lineage trick); covered
    positions come from a bounded k-wide range explode on DUP gram
    positions only; the kept/removed verdict is one (doc, pos)
    left-anti join. Everything is keyed — a hot gram costs
    O(occurrences·k), never O(occurrences²).

    Output: id, n_tokens, n_removed, kept_fp — kept_fp is the exact
    BIGINT sum of wordvalue*(pos+1) over surviving tokens
    (order-sensitive, engine-recomputable; empty survivors -> 0).
    """
    wv = "x -> length(x) * 131 + ascii(x) + ascii(substr(x, -1, 1))"
    # checkpointed ONCE: the token-position table feeds both the
    # anti-join (kept) and the totals branch — without it the corpus
    # tokenize + posexplode runs twice (optimization round 14, the
    # tfidf_topk posting-table pattern)
    toks = (
        df.select(F.col(id_col), words_col(F.col(text_col)).alias("_ws"))
        .where(F.size("_ws") > 0)
        .select(
            F.col(id_col),
            F.posexplode(F.expr(f"transform(_ws, {wv})")).alias(
                "pos", "wval"
            ),
        )
        .localCheckpoint()
    )
    grams = (
        df.select(F.col(id_col), words_col(F.col(text_col)).alias("_ws"))
        .where(F.size("_ws") >= k)
        .select(F.col(id_col), F.posexplode(_gram_col(k)).alias("pos", "gram"))
    )
    per_doc_gram = grams.groupBy(id_col, "gram").agg(
        F.collect_list("pos").alias("_positions")
    )
    per_doc_gram = per_doc_gram.withColumn(
        "_df", F.count("*").over(Window.partitionBy("gram"))
    )
    covered = (
        per_doc_gram.where(F.col("_df") >= min_doc_freq)
        .select(F.col(id_col), F.explode("_positions").alias("_p"))
        .select(
            F.col(id_col),
            F.explode(
                F.expr(f"sequence(_p, _p + {k - 1})")
            ).alias("pos"),
        )
        .distinct()
    )
    kept = toks.join(covered, [id_col, "pos"], "left_anti")
    totals = toks.groupBy(id_col).agg(F.count("*").alias("n_tokens"))
    kept_agg = kept.groupBy(id_col).agg(
        F.count("*").alias("_n_kept"),
        F.sum(F.col("wval") * (F.col("pos") + 1)).alias("_fp"),
    )
    return (
        totals.join(kept_agg, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            (
                F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).alias("n_removed"),
            F.coalesce(F.col("_fp"), F.lit(0)).cast("long").alias("kept_fp"),
        )
    )
