"""Property-based tests for the corpus-curation operators: packing
conservation/contiguity, decontamination bounds, repetition-rule
bounds — over randomly generated small corpora."""

from hypothesis import given, settings
from hypothesis import strategies as st

from zikeiretsu_rs_spark.operators import curation

WORDS = ["alpha", "beta", "gamma", "delta", "pi"]

doc_text = st.lists(
    st.sampled_from(WORDS), min_size=0, max_size=30
).map(" ".join)

corpus = st.lists(doc_text, min_size=1, max_size=12).map(
    lambda texts: [(i + 1, t) for i, t in enumerate(texts)]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestPackingProperties:
    @settings(max_examples=12, deadline=None)
    @given(rows=corpus, budget=st.sampled_from([7, 64, 256]))
    def test_conservation_and_contiguity(self, spark, rows, budget):
        df = spark.createDataFrame(
            [("s", i, t) for (i, t) in rows],
            "source string, doc_id bigint, text string",
        )
        packs = sorted(
            curation.pack_sequences(df, "doc_id", "text", "source", budget).collect(),
            key=lambda r: r["pack_id"],
        )
        total_tokens = sum(len(t.split()) if t.strip() else 0 for _, t in rows)
        # conservation: every token lands in exactly one pack
        assert sum(r["pack_tokens"] for r in packs) == total_tokens
        assert sum(r["n_docs"] for r in packs) == len(rows)
        # contiguity: doc-id ranges of consecutive packs never interleave
        for a, b in zip(packs, packs[1:]):
            assert a["last_doc"] < b["first_doc"]
        # every pack except the last must reach its budget boundary
        # (otherwise the next pack could not have started)
        for r in packs[:-1]:
            assert r["pack_tokens"] >= 1  # non-empty
        # pack ids are dense from 0 only when every pack closes exactly
        # at the boundary; they are always non-negative and increasing
        assert all(r["pack_id"] >= 0 for r in packs)

    @settings(max_examples=8, deadline=None)
    @given(rows=corpus)
    def test_budget_partition_of_running_total(self, spark, rows):
        budget = 16
        df = spark.createDataFrame(
            [("s", i, t) for (i, t) in rows],
            "source string, doc_id bigint, text string",
        )
        packs = curation.pack_sequences(df, "doc_id", "text", "source", budget)
        # replay the packing on the driver and compare exactly
        cum = 0
        expect = {}
        for i, t in sorted(rows):
            n = len(t.split()) if t.strip() else 0
            pid = cum // budget
            d = expect.setdefault(pid, [0, 0])
            d[0] += 1
            d[1] += n
            cum += n
        got = {
            r["pack_id"]: [r["n_docs"], r["pack_tokens"]]
            for r in packs.collect()
        }
        assert got == expect


class TestDecontaminationProperties:
    @settings(max_examples=10, deadline=None)
    @given(train=corpus, eval_rows=corpus)
    def test_overlap_bounds_and_self_containment(self, spark, train, eval_rows):
        n = 3
        train_df = _df(spark, train)
        eval_df = _df(spark, [(i + 1000, t) for i, t in eval_rows])
        out = curation.eval_ngram_overlap(
            train_df, eval_df, "doc_id", "text", n=n
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        # only docs with >= n words appear; overlap bounded by total
        for r in out:
            assert 0 <= r["n_overlap"] <= r["n_grams"]
            assert 0.0 <= r["contamination"] <= 1.0
        # a train doc identical to some eval doc is fully contaminated
        eval_texts = {t for _, t in eval_rows}
        for i, t in train:
            if t in eval_texts and len(t.split()) >= n and t.strip():
                assert by_id[i]["contamination"] == 1.0


class TestRepetitionProperties:
    @settings(max_examples=10, deadline=None)
    @given(rows=corpus)
    def test_fraction_bounds(self, spark, rows):
        out = curation.repetition_stats(
            _df(spark, rows), "doc_id", "text"
        ).collect()
        for r in out:
            assert r["n_tokens"] >= 5
            assert 1 <= r["distinct_5grams"] <= r["total_5grams"]
            assert 0.0 <= r["dup_5gram_frac"] < 1.0
            assert 0.0 < r["top_2gram_frac"] <= 1.0
            assert r["total_5grams"] == r["n_tokens"] - 4


# -- URL canonicalization properties ----------------------------------------

_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"])
_host = st.builds(
    lambda parts, port: ".".join(parts) + port,
    st.lists(
        st.sampled_from(["Example", "www", "CDN", "files", "org"]),
        min_size=1,
        max_size=3,
    ),
    st.sampled_from(["", ":80", ":443", ":8080"]),
)
_path = st.lists(
    st.sampled_from(["a", "B", "docs", "7", ""]), min_size=0, max_size=3
).map(lambda segs: "".join(f"/{s}" for s in segs))
_query = st.lists(
    st.sampled_from(
        ["id=1", "utm_source=x", "utm_campaign=y", "q=Z", "gclid=g1", "fbclid=f"]
    ),
    min_size=0,
    max_size=4,
).map(lambda ps: "?" + "&".join(ps) if ps else "")
_frag = st.sampled_from(["", "#sec", "#Top"])

url_strategy = st.builds(
    lambda s, h, p, q, f: f"{s}://{h}{p}{q}{f}", _scheme, _host, _path, _query, _frag
)


class TestUrlCanonicalProperties:
    @settings(max_examples=8, deadline=None)
    @given(urls_batch=st.lists(url_strategy, min_size=1, max_size=24))
    def test_canonicalization_is_idempotent(self, spark, urls_batch):
        """canonical(canonical(u)) == canonical(u): re-cleaning an
        already-clean URL must be a no-op, otherwise incremental
        pipelines that re-ingest their own output drift."""
        from pyspark.sql import functions as F

        from zikeiretsu_rs_spark.operators.urls import canonical_url

        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls_batch)], "i bigint, url string"
        )
        out = df.select(
            canonical_url(F.col("url")).alias("c1"),
            canonical_url(canonical_url(F.col("url"))).alias("c2"),
        ).collect()
        for r in out:
            assert r["c1"] == r["c2"], (r["c1"], r["c2"])

    @settings(max_examples=8, deadline=None)
    @given(urls_batch=st.lists(url_strategy, min_size=1, max_size=24))
    def test_canonical_never_carries_noise(self, spark, urls_batch):
        """No canonical form retains fragments, tracking params,
        default ports, or a trailing slash."""
        from pyspark.sql import functions as F

        from zikeiretsu_rs_spark.operators.urls import canonical_url

        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls_batch)], "i bigint, url string"
        )
        for r in df.select(canonical_url(F.col("url")).alias("c")).collect():
            c = r["c"]
            assert c is not None
            assert "#" not in c and "utm_" not in c
            assert "gclid" not in c and "fbclid" not in c
            assert ":80/" not in c and not c.endswith(":80")
            assert ":443/" not in c and not c.endswith(":443")
            assert not c.endswith("/") or c.endswith("://")


def _cdc_corpus(seed: int = 13, n: int = 200) -> str:
    import random

    rng = random.Random(seed)
    return " ".join(
        "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(2, 9))
        )
        for _ in range(n)
    )


class TestCdcChunks:
    """Content-defined chunking: the boundary set is a pure function
    of local content, so edits shift only the chunks they touch."""

    LONG = _cdc_corpus()

    def test_partition_covers_document(self, spark):
        from zikeiretsu_rs_spark.operators.curation import cdc_chunks

        df = spark.createDataFrame([(1, self.LONG)], ["doc_id", "text"])
        rows = sorted(
            cdc_chunks(df, "doc_id", "text").collect(),
            key=lambda r: r["chunk_idx"],
        )
        # chunks tile [1, n] exactly
        assert rows[0]["start_word"] == 1
        for a, b in zip(rows, rows[1:]):
            assert b["start_word"] == a["start_word"] + a["n_words"]
        assert sum(r["n_words"] for r in rows) == 200
        assert len(rows) > 3  # mask 16 on 200 words: real boundaries

    def test_prefix_edit_preserves_later_chunks(self, spark):
        from zikeiretsu_rs_spark.operators.curation import cdc_chunks

        df1 = spark.createDataFrame([(1, self.LONG)], ["doc_id", "text"])
        df2 = spark.createDataFrame(
            [(1, "zz yy xx " + self.LONG)], ["doc_id", "text"]
        )
        fp1 = {r["chunk_fp"] for r in cdc_chunks(df1, "doc_id", "text").collect()}
        fp2 = {r["chunk_fp"] for r in cdc_chunks(df2, "doc_id", "text").collect()}
        # all but the first chunk survive a 3-word prepend
        assert len(fp1 & fp2) >= len(fp1) - 1

    def test_fixed_stride_chunking_does_not_survive_edit(self, spark):
        """The contrast that motivates CDC: fixed windows all shift."""
        from zikeiretsu_rs_spark.operators.curation import chunk_documents

        df1 = spark.createDataFrame([(1, self.LONG)], ["doc_id", "text"])
        df2 = spark.createDataFrame(
            [(1, "zz yy xx " + self.LONG)], ["doc_id", "text"]
        )
        t1 = {r["chunk_text"] for r in chunk_documents(df1, "doc_id", "text").collect()}
        t2 = {r["chunk_text"] for r in chunk_documents(df2, "doc_id", "text").collect()}
        assert len(t1 & t2) <= 1  # fixed windows: (almost) nothing survives

    def test_short_docs_single_chunk(self, spark):
        from zikeiretsu_rs_spark.operators.curation import cdc_chunks

        df = spark.createDataFrame(
            [(1, "a b"), (2, "one"), (3, "x y z")], ["doc_id", "text"]
        )
        rows = cdc_chunks(df, "doc_id", "text").collect()
        assert len(rows) == 3
        assert all(r["chunk_idx"] == 1 for r in rows)


# ---------------------------------------------------------------------------
# PSL registrable-domain: Spark expression vs an independent pure-
# Python implementation of the publicsuffix.org algorithm, over
# randomly composed hosts (round 8: the lookup was rewritten to a
# folded str_to_map probe — this pins the SEMANTICS independent of
# the expression form).
# ---------------------------------------------------------------------------


def _psl_reference(host, rules):
    """Straight transcription of the spec's algorithm over the parsed
    (suffix -> kind bitmask) map: longest matching rule prevails,
    exceptions prevail at their own length, `*` consumes exactly one
    label, default rule = rightmost label."""
    if not host:
        return None
    labels = host.split(".")
    n = len(labels)
    best = None  # (ps_label_count, is_exception)
    for j in range(1, n + 1):
        tail = ".".join(labels[n - j:])
        kind = rules.get(tail, 0)
        if kind & 4:  # exception: prevails outright, ps = rule - 1
            best = (j - 1, True)
        elif best is not None and best[1]:
            continue
        elif kind & 1 and (best is None or j > best[0]):  # normal
            best = (j, False)
        if kind & 2 and j + 1 <= n:  # wildcard parent: matches j+1
            if not (best is not None and best[1]) and (
                best is None or j + 1 > best[0]
            ):
                best = (j + 1, False)
    ps = best[0] if best is not None else 1
    if n >= ps + 1:
        return ".".join(labels[n - ps - 1:])
    return None


_PSL_LABELS = ["www", "a", "b", "example", "co", "uk", "ck", "github",
               "io", "com", "gov", "amazonaws", "s3", "blogspot"]

host_strategy = st.lists(
    st.sampled_from(_PSL_LABELS), min_size=1, max_size=5
).map(".".join)


class TestPslProperties:
    @settings(max_examples=20, deadline=None)
    @given(hosts=st.lists(host_strategy, min_size=1, max_size=24))
    def test_spark_matches_reference_algorithm(self, spark, hosts):
        from pyspark.sql import functions as F

        from zikeiretsu_rs_spark.operators import psl

        rows = [(i, h) for i, h in enumerate(hosts)]
        df = spark.createDataFrame(rows, "i bigint, host string")
        got = {
            r["i"]: r["d"]
            for r in psl.attach_registrable_domain(
                df, F.col("host"), "d"
            ).collect()
        }
        for i, h in rows:
            want = _psl_reference(h, psl._RULES)
            assert got[i] == want, (h, got[i], want)

    @settings(max_examples=20, deadline=None)
    @given(hosts=st.lists(host_strategy, min_size=1, max_size=12))
    def test_column_form_agrees_with_dataframe_form(self, spark, hosts):
        from pyspark.sql import functions as F

        from zikeiretsu_rs_spark.operators import psl

        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(hosts)], "i bigint, host string"
        )
        a = {
            r["i"]: r["d"]
            for r in psl.attach_registrable_domain(
                df, F.col("host"), "d"
            ).collect()
        }
        b = {
            r["i"]: r["d"]
            for r in df.select(
                "i",
                psl.registrable_domain_from_host(F.col("host")).alias("d"),
            ).collect()
        }
        assert a == b
