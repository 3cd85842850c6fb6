"""Unit tests for the corpus-curation operators (curation.py):
decontamination, repetition rules, sequence packing, source rollup."""

import pytest
from pyspark.sql import functions as F

from zikeiretsu_rs_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_eval_overlap_flags_planted_leak(spark):
    words = " ".join(f"w{i}" for i in range(12))
    train = _docs(
        spark,
        [
            (1, words),  # identical to eval doc 10 -> fully contaminated
            (2, " ".join(f"x{i}" for i in range(12))),  # disjoint
            (3, "short text"),  # < 8 words -> dropped
        ],
    )
    eval_df = _docs(spark, [(10, words)])
    out = {
        r["doc_id"]: r
        for r in curation.eval_ngram_overlap(
            train, eval_df, "doc_id", "text", n=8
        ).collect()
    }
    assert set(out) == {1, 2}  # doc 3 has no 8-grams
    assert out[1]["n_grams"] == 5 and out[1]["n_overlap"] == 5
    assert out[1]["contamination"] == 1.0 and out[1]["is_contaminated"]
    assert out[2]["n_overlap"] == 0 and not out[2]["is_contaminated"]


def test_eval_overlap_partial(spark):
    shared = " ".join(f"s{i}" for i in range(8))  # exactly one 8-gram
    train = _docs(spark, [(1, shared + " extra tail words here now ok")])
    eval_df = _docs(spark, [(10, shared)])
    row = curation.eval_ngram_overlap(
        train, eval_df, "doc_id", "text", n=8
    ).collect()[0]
    # 14 words -> 7 distinct 8-grams, exactly 1 shared
    assert row["n_grams"] == 7 and row["n_overlap"] == 1
    assert row["contamination"] == pytest.approx(round(1 / 7, 6))


def test_repetition_stats_pathological_doc(spark):
    rep = " ".join(["a"] * 10)  # "a a a ... a" (10 tokens)
    out = {
        r["doc_id"]: r
        for r in curation.repetition_stats(
            _docs(spark, [(1, rep), (2, " ".join(f"u{i}" for i in range(10)))]),
            "doc_id",
            "text",
        ).collect()
    }
    r1 = out[1]
    # 6 total 5-grams, all identical
    assert r1["total_5grams"] == 6 and r1["distinct_5grams"] == 1
    assert r1["dup_5gram_frac"] == pytest.approx(round(1 - 1 / 6, 6))
    # "a a" occurs 9 times; 9*2/10 capped at 1.0
    assert r1["top_2gram_count"] == 9 and r1["top_2gram_frac"] == 1.0
    assert r1["is_repetitive"]
    r2 = out[2]  # all-unique doc: zero duplication, top 2-gram count 1
    assert r2["dup_5gram_frac"] == 0.0 and r2["top_2gram_count"] == 1
    assert not r2["is_repetitive"]


def test_repetition_drops_short_docs(spark):
    out = curation.repetition_stats(
        _docs(spark, [(1, "only four words here")]), "doc_id", "text"
    )
    assert out.count() == 0


def test_pack_sequences_boundaries(spark):
    # key "s": three 100-token docs at budget 150 ->
    # doc1 cum_before=0 -> pack 0; doc2 cum_before=100 -> pack 0
    # (straddles, pack overflows to 200); doc3 cum_before=200 -> pack 1.
    rows = [
        ("s", i, " ".join(f"t{j}" for j in range(100))) for i in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, text string")
    out = {
        r["pack_id"]: r
        for r in curation.pack_sequences(
            df, "doc_id", "text", "source", budget=150
        ).collect()
    }
    assert out[0]["n_docs"] == 2 and out[0]["pack_tokens"] == 200
    assert out[0]["first_doc"] == 1 and out[0]["last_doc"] == 2
    assert out[1]["n_docs"] == 1 and out[1]["pack_tokens"] == 100
    assert out[0]["fill_ratio"] == pytest.approx(round(200 / 150, 6))


def test_pack_sequences_keys_independent(spark):
    rows = [("a", 1, "x y z"), ("b", 2, "x y z")]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, text string")
    out = curation.pack_sequences(df, "doc_id", "text", "source").collect()
    assert {(r["source"], r["pack_id"]) for r in out} == {("a", 0), ("b", 0)}


def test_source_rollup_dup_and_quality(spark):
    good = ("the " * 60).strip()  # 60 tokens incl. stopword -> quality 0.8
    rows = [
        ("dups", 1, good),
        ("dups", 2, good),  # corpus-wide duplicate pair
        ("clean", 3, "the quick brown fox jumps over the lazy dog " * 7),
        ("junk", 4, "zz"),  # no stopwords, 1 token -> quality 0.005
    ]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, text string")
    out = {
        r["source"]: r
        for r in curation.source_rollup(df, "doc_id", "text", "source").collect()
    }
    assert out["dups"]["n_dup_docs"] == 2 and out["dups"]["dup_rate"] == 1.0
    assert not out["dups"]["keep_source"]
    assert out["clean"]["n_dup_docs"] == 0 and out["clean"]["keep_source"]
    assert out["junk"]["n_low_quality"] == 1
    assert not out["junk"]["keep_source"]
    assert out["dups"]["total_tokens"] == 120


def test_rollup_dup_is_corpus_wide_not_per_source(spark):
    # same text under two different sources -> both flagged as dups
    rows = [("a", 1, "same text here"), ("b", 2, "same text here")]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, text string")
    out = {
        r["source"]: r
        for r in curation.source_rollup(df, "doc_id", "text", "source").collect()
    }
    assert out["a"]["n_dup_docs"] == 1 and out["b"]["n_dup_docs"] == 1


class TestDuplicatedSpans:
    def test_planted_duplicate_spans(self, spark):
        shared = "a b c d e"  # one shared 5-gram
        docs = _docs(
            spark,
            [
                (1, shared + " p q r s t"),   # 6 spans, 1 duplicated
                (2, shared),                   # 1 span, duplicated
                (3, "u v w x y z"),            # 2 spans, unique
                (4, "too short"),              # < 5 words -> dropped
            ],
        )
        out = {
            r["doc_id"]: r
            for r in curation.duplicated_span_stats(
                docs, "doc_id", "text", k=5, min_df=2
            ).collect()
        }
        assert set(out) == {1, 2, 3}
        assert (out[1]["n_spans"], out[1]["n_dup_spans"]) == (6, 1)
        assert (out[2]["n_spans"], out[2]["n_dup_spans"]) == (1, 1)
        assert out[2]["dup_frac"] == 1.0
        assert (out[3]["n_spans"], out[3]["n_dup_spans"]) == (2, 0)

    def test_hash_spans_value_equal(self, spark):
        docs = _docs(
            spark,
            [(i, " ".join(f"w{(i + j) % 7}" for j in range(9))) for i in range(6)],
        )
        exact = curation.duplicated_span_stats(docs, "doc_id", "text", k=5)
        hashed = curation.duplicated_span_stats(
            docs, "doc_id", "text", k=5, hash_spans=True
        )
        assert sorted(map(tuple, exact.collect())) == sorted(
            map(tuple, hashed.collect())
        )


class TestGopherRules:
    def test_rule_boundaries(self, spark):
        from zikeiretsu_rs_spark.operators import text as tx

        good = "the cats sat of mats " * 12  # 60 tokens, mean len 3.2
        short = "the of dog"  # too few tokens
        no_stop = " ".join(f"w{i}" for i in range(60))  # no stop markers
        docs = _docs(spark, [(1, good.strip()), (2, short), (3, no_stop)])
        out = {
            r["doc_id"]: r
            for r in tx.gopher_rules(docs, "doc_id", "text").collect()
        }
        assert out[1]["passes"] is True
        assert out[1]["n_tokens"] == 60 and out[1]["n_stop_markers"] == 2
        assert out[1]["mean_word_len"] == pytest.approx(3.2)
        assert out[2]["passes"] is False  # token count below minimum
        assert out[3]["passes"] is False  # no stop markers
        assert out[3]["alpha_frac"] == 1.0

    def test_alpha_frac_rule(self, spark):
        from zikeiretsu_rs_spark.operators import text as tx

        digits = " ".join(str(i) for i in range(60)) + " the a of and is"
        docs = _docs(spark, [(1, digits)])
        row = tx.gopher_rules(docs, "doc_id", "text").collect()[0]
        assert row["alpha_frac"] < 0.8 and row["passes"] is False


class TestUrls:
    CASES = [
        ("HTTPS://www.EXAMPLE.com:443/a/b?utm_source=x&id=1#frag",
         "https://www.example.com/a/b?id=1"),
        ("http://Host.com:80/p/", "http://host.com/p"),
        ("http://host.com/p/?utm_a=1", "http://host.com/p"),
        ("http://host.com/p?id=2&utm_campaign=c", "http://host.com/p?id=2"),
        ("http://host.com/p?utm_a=1&utm_b=2", "http://host.com/p"),
        # boundary anchoring: 'utm_'/'fbclid' as a SUFFIX of another
        # parameter name must NOT be stripped (regression: unanchored
        # pattern matched inside names/values and corrupted canonicals)
        ("http://host.com/p?xutm_source=a", "http://host.com/p?xutm_source=a"),
        ("http://host.com/p?myfbclid=1&id=2", "http://host.com/p?myfbclid=1&id=2"),
        ("http://host.com/p?utm_a=1&utm_b=2&id=3", "http://host.com/p?id=3"),
        ("http://host.com/p?utm_a=1&id=3&utm_b=2", "http://host.com/p?id=3"),
        ("http://host.com/p?gclid=g&fbclid=f", "http://host.com/p"),
        ("ftp://Files.example.org/x", "ftp://files.example.org/x"),
        ("not a url", None),
    ]

    PSL_CASES = [
        # (url, expected PSL registrable domain)
        ("http://shop.example.co.uk/x", "example.co.uk"),
        ("http://other.example.co.uk/y", "example.co.uk"),  # same group
        ("https://www.EXAMPLE.COM:443/a", "example.com"),
        ("http://news.media.com.au/", "media.com.au"),
        ("http://proj.github.io/p", "proj.github.io"),  # private suffix
        # depth beyond suffix+1 still registers at suffix+1
        ("http://deep.sub.proj.github.io/p", "proj.github.io"),
        ("http://a.b.ck/", "a.b.ck"),   # *.ck wildcard: b.ck is a suffix
        ("http://b.ck/", None),          # host IS a public suffix
        ("http://ck/", None),            # wildcard parent alone: no match,
                                         # default rule, no extra label
        ("http://www.ck/", "www.ck"),    # !www.ck exception
        ("http://co.uk/", None),         # suffix-only -> quarantine
        ("http://localhost/x", None),    # single label, no extra
        ("not a url", None),
        ("http://x.org/a", "x.org"),     # implicit default rule
        ("http://sub.x.org/a", "x.org"),
    ]

    def test_registrable_domain_psl(self, spark):
        """PSL extraction (VERDICT r06 item 3): multi-label registry
        rules, private-section suffixes, wildcard and exception
        semantics, suffix-only quarantine — the classes the two-label
        simplification mis-caps."""
        from pyspark.sql import functions as F

        from zikeiretsu_rs_spark.operators import urls

        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _) in enumerate(self.PSL_CASES)],
            "doc_id bigint, url string",
        )
        got = {
            r["doc_id"]: r["d"]
            for r in df.select(
                "doc_id",
                urls.registrable_domain_psl(F.col("url")).alias("d"),
            ).collect()
        }
        for i, (raw, want) in enumerate(self.PSL_CASES):
            assert got[i] == want, (raw, got[i], want)

    def test_parse_rules_allows_x_and_wildcard_x_pair(self):
        """VERDICT r08 missing #3: the full upstream PSL contains
        pairs like `X` + `*.X` (a registry that is both a suffix and
        a wildcard parent). parse_rules must OR the kinds under one
        key, not raise."""
        from zikeiretsu_rs_spark.operators import psl

        m = psl.parse_rules(["platform.io", "*.platform.io"])
        assert m == {"platform.io": psl._NORMAL | psl._WILDCARD}

    def test_multilabel_wildcard_parent_does_not_match_itself(
        self, spark, monkeypatch
    ):
        """Spec: `*.X` matches one EXTRA label — it never matches X
        itself. A host equal to a multi-label wildcard parent must
        resolve via other rules (or the default rule), not as a
        wildcard hit. Exercised with an X + `*.X` pair patched into
        the rule map (parent has 2 labels, inside MAX_SUFFIX_LABELS)."""
        from pyspark.sql import functions as F

        from zikeiretsu_rs_spark.operators import psl

        def resolve(rules, hosts):
            monkeypatch.setattr(psl, "_RULES", rules)
            df = spark.createDataFrame(
                [(i, h) for i, h in enumerate(hosts)],
                "i bigint, host string",
            )
            return [
                r["d"]
                for r in psl.attach_registrable_domain(
                    df, F.col("host"), "d"
                ).sort("i").collect()
            ]

        # wildcard rule ONLY: `*.platform.io` does not match the
        # parent, so "platform.io" falls to the default rule (`io`
        # public) and registers as itself
        only_wild = psl.parse_rules(["*.platform.io"])
        assert resolve(
            only_wild, ["platform.io", "app.platform.io",
                        "x.app.platform.io"]
        ) == ["platform.io", None, "x.app.platform.io"]

        # X + `*.X` pair: the normal rule makes the parent itself a
        # public suffix (no extra label -> None), the wildcard makes
        # every child a suffix too
        pair = psl.parse_rules(["platform.io", "*.platform.io"])
        assert resolve(
            pair, ["platform.io", "app.platform.io",
                   "x.app.platform.io", "site.io"]
        ) == [None, None, "x.app.platform.io", "site.io"]

    def test_domain_cap_psl_separates_couk_registrables(self, spark):
        """The mis-cap the PSL fixes: two .co.uk registrables must be
        budgeted SEPARATELY (psl=True), while the two-label rule
        merges them into one co.uk pseudo-domain and under-caps."""
        from zikeiretsu_rs_spark.operators import urls

        rows = [(i, f"http://site{i % 2}.co.uk/p") for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id bigint, url string")
        kept_psl = [
            r["doc_id"]
            for r in urls.domain_cap(df, "doc_id", "url", cap=3).collect()
            if r["is_kept"]
        ]
        kept_2lab = [
            r["doc_id"]
            for r in urls.domain_cap(
                df, "doc_id", "url", cap=3, psl=False
            ).collect()
            if r["is_kept"]
        ]
        assert len(kept_psl) == 6  # 3 per registrable, two registrables
        assert len(kept_2lab) == 3  # one merged 'co.uk' pseudo-domain

    def test_canonical_forms(self, spark):
        from zikeiretsu_rs_spark.operators import urls

        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _) in enumerate(self.CASES)],
            "doc_id bigint, url string",
        )
        got = {
            r["url"]: r["canonical_url"]
            for r in urls.normalize_urls(df, "url").collect()
        }
        for raw, want in self.CASES:
            assert got[raw] == want, (raw, got[raw], want)

    def test_url_dedup_groups_variants(self, spark):
        from zikeiretsu_rs_spark.operators import urls

        df = spark.createDataFrame(
            [
                (1, "http://h.com/p"),
                (2, "HTTP://H.COM/p/"),
                (3, "http://h.com/p?utm_source=x"),
                (4, "http://h.com/q"),
                (5, "garbage"),
            ],
            "doc_id bigint, url string",
        )
        out = {
            r["canonical_url"]: r
            for r in urls.url_dedup(df, "doc_id", "url").collect()
        }
        assert set(out) == {"http://h.com/p", "http://h.com/q"}
        grp = out["http://h.com/p"]
        assert grp["rep_id"] == 1 and grp["dup_count"] == 3
        assert grp["n_raw_variants"] == 3


class TestChunking:
    def test_windows_cover_with_overlap(self, spark):
        words = " ".join(f"w{i}" for i in range(80))
        docs = _docs(spark, [(1, words), (2, "a b"), (3, "")])
        out = sorted(
            curation.chunk_documents(
                docs, "doc_id", "text", chunk_tokens=32, stride=24
            ).collect(),
            key=lambda r: (r["doc_id"], r["chunk_idx"]),
        )
        d1 = [r for r in out if r["doc_id"] == 1]
        # starts 0, 24, 48, 72 -> 4 chunks; last is the 8-token tail
        assert [r["start_token"] for r in d1] == [0, 24, 48, 72]
        assert [r["n_chunk_tokens"] for r in d1] == [32, 32, 32, 8]
        assert d1[0]["chunk_text"].split()[:2] == ["w0", "w1"]
        assert d1[1]["chunk_text"].split()[0] == "w24"  # overlap start
        assert d1[3]["chunk_text"].split()[-1] == "w79"
        # tiny doc -> one short chunk; empty doc -> no chunks
        d2 = [r for r in out if r["doc_id"] == 2]
        assert len(d2) == 1 and d2[0]["n_chunk_tokens"] == 2
        assert not [r for r in out if r["doc_id"] == 3]

    def test_every_token_in_some_chunk(self, spark):
        words = " ".join(f"t{i}" for i in range(50))
        docs = _docs(spark, [(1, words)])
        out = curation.chunk_documents(
            docs, "doc_id", "text", chunk_tokens=16, stride=10
        ).collect()
        covered = set()
        for r in out:
            covered.update(
                range(r["start_token"], r["start_token"] + r["n_chunk_tokens"])
            )
        assert covered == set(range(50))


class TestVocab:
    def test_top_terms_by_doc_freq(self, spark):
        from zikeiretsu_rs_spark.operators import text as tx

        docs = _docs(
            spark,
            [
                (1, "apple banana"),
                (2, "apple cherry"),
                (3, "apple banana banana"),  # dup words count once per doc
            ],
        )
        out = tx.vocab_top_df(docs, "doc_id", "text", k=2).collect()
        ranked = sorted(out, key=lambda r: r["rank"])
        assert [(r["term"], r["doc_freq"]) for r in ranked] == [
            ("apple", 3),
            ("banana", 2),
        ]


class TestTemperatureWeights:
    def test_alpha_one_is_proportional(self, spark):
        from zikeiretsu_rs_spark.operators.curation import (
            source_temperature_weights,
        )

        df = spark.createDataFrame(
            [(1, "a b c d", "big"), (2, "a b", "big"), (3, "x", "small")],
            ["doc_id", "text", "source"],
        )
        out = {
            r["source"]: r
            for r in source_temperature_weights(
                df, "source", "text", alpha=1.0
            ).collect()
        }
        for r in out.values():
            assert r["temperature_share_ppm"] == r["natural_share_ppm"]
            assert r["boost_ppm"] == 1_000_000

    def test_low_alpha_boosts_small_sources(self, spark):
        from zikeiretsu_rs_spark.operators.curation import (
            source_temperature_weights,
        )

        df = spark.createDataFrame(
            [(i, "w " * 50, "big") for i in range(10)]
            + [(100, "w w w", "small")],
            ["doc_id", "text", "source"],
        )
        out = {
            r["source"]: r
            for r in source_temperature_weights(
                df, "source", "text", alpha=0.5
            ).collect()
        }
        assert out["small"]["boost_ppm"] > 1_000_000
        assert out["big"]["boost_ppm"] < 1_000_000
        # shares still ~sum to 1
        tot = sum(r["temperature_share_ppm"] for r in out.values())
        assert abs(tot - 1_000_000) <= 2


class TestQualityRankNormalize:
    def test_percentiles_per_source(self, spark):
        from zikeiretsu_rs_spark.operators.curation import (
            quality_rank_normalize,
        )

        rows = [
            (1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
            (4, "b", 5.0), (5, "b", 500.0),
            (6, "c", 42.0),  # singleton source
        ]
        df = spark.createDataFrame(rows, ["doc_id", "src", "q"])
        out = {
            r["doc_id"]: r["pct_ppm"]
            for r in quality_rank_normalize(df, "doc_id", "src", "q").collect()
        }
        assert (out[1], out[2], out[3]) == (0, 500_000, 1_000_000)
        assert (out[4], out[5]) == (0, 1_000_000)
        assert out[6] == 0  # defined for singletons

    def test_tie_break_is_deterministic(self, spark):
        from zikeiretsu_rs_spark.operators.curation import (
            quality_rank_normalize,
        )

        rows = [(i, "a", 7.0) for i in range(5)]
        df = spark.createDataFrame(rows, ["doc_id", "src", "q"])
        a = quality_rank_normalize(df.repartition(1), "doc_id", "src", "q")
        b = quality_rank_normalize(df.repartition(5), "doc_id", "src", "q")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestCapPerKey:
    def test_caps_and_keeps_earliest(self, spark):
        from zikeiretsu_rs_spark.operators.sampling import cap_per_key

        rows = [(u, t, f"e{u}_{t}") for u in (1, 2) for t in range(10)]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
        out = cap_per_key(df, "user_id", ["ts", "event_id"], k=3)
        got = sorted((r["user_id"], r["ts"]) for r in out.collect())
        assert got == [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2)]

    def test_small_keys_untouched(self, spark):
        from zikeiretsu_rs_spark.operators.sampling import cap_per_key

        df = spark.createDataFrame(
            [(1, 5, "a"), (2, 1, "b")], ["user_id", "ts", "event_id"]
        )
        assert cap_per_key(df, "user_id", ["ts", "event_id"], 10).count() == 2


class TestRemoveDupSpans:
    def test_all_occurrences_removed_including_first(self, spark):
        from zikeiretsu_rs_spark.operators.curation import remove_dup_spans

        dup = "v w x y z"  # a 5-gram shared across docs
        rows = [
            (1, f"{dup} alpha beta"),
            (2, f"gamma {dup} delta"),
            (3, "only unique words here today friends"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: r
            for r in remove_dup_spans(df, "doc_id", "text", k=5).collect()
        }
        # doc1: 7 tokens, 5 removed (the dup span; FIRST occurrence too)
        assert (out[1]["n_tokens"], out[1]["n_removed"]) == (7, 5)
        assert (out[2]["n_tokens"], out[2]["n_removed"]) == (7, 5)
        assert (out[3]["n_tokens"], out[3]["n_removed"]) == (6, 0)

    def test_overlapping_dup_spans_union_coverage(self, spark):
        from zikeiretsu_rs_spark.operators.curation import remove_dup_spans

        # 6 shared words -> two overlapping dup 5-grams covering 6 tokens
        dup = "u v w x y z"
        rows = [(1, f"{dup} tail"), (2, f"head {dup}")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: r
            for r in remove_dup_spans(df, "doc_id", "text", k=5).collect()
        }
        assert out[1]["n_removed"] == 6  # union, not 2x5
        assert out[2]["n_removed"] == 6

    def test_intra_doc_repeats_untouched(self, spark):
        from zikeiretsu_rs_spark.operators.curation import remove_dup_spans

        # the same 5-gram twice WITHIN one doc: doc frequency is 1
        df = spark.createDataFrame(
            [(1, "a b c d e a b c d e")], ["doc_id", "text"]
        )
        row = remove_dup_spans(df, "doc_id", "text", k=5).collect()[0]
        assert row["n_removed"] == 0


class TestCharEntropy:
    def test_known_values(self, spark):
        import math

        from zikeiretsu_rs_spark.operators.text import char_entropy

        rows = [(1, "aaaa"), (2, "ab" * 8), (3, "abcd")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: r for r in char_entropy(df, "doc_id", "text").collect()
        }
        assert out[1]["entropy_ubits"] == 0  # single symbol
        assert out[2]["entropy_ubits"] == 1_000_000  # two equiprobable
        assert out[3]["entropy_ubits"] == 2_000_000  # four equiprobable
        assert out[3]["n_distinct_chars"] == 4

    def test_orders_by_disorder(self, spark):
        from zikeiretsu_rs_spark.operators.text import char_entropy

        rows = [(1, "aaaaaaaaab"), (2, "the quick brown fox")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: r["entropy_ubits"]
            for r in char_entropy(df, "doc_id", "text").collect()
        }
        assert out[1] < out[2]


class TestBigramLogprob:
    def test_matches_python_reference(self, spark):
        import collections
        import math

        from zikeiretsu_rs_spark.operators.text import bigram_logprob

        texts = {1: "a b a b c", 2: "a b c c", 3: "b c a"}
        df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
            for r in bigram_logprob(df, "doc_id", "text").collect()
        }
        c12, c1 = collections.Counter(), collections.Counter()
        for t in texts.values():
            ws = t.split()
            for a, b in zip(ws, ws[1:]):
                c12[(a, b)] += 1
                c1[a] += 1
        for d, t in texts.items():
            ws = t.split()
            terms = [
                round(math.log(c12[(a, b)] / c1[a]), 9)
                for a, b in zip(ws, ws[1:])
            ]
            n, s = len(terms), sum(terms)
            assert got[d][0] == n
            assert abs(got[d][1] - round(s / n, 6)) < 1e-9, (d, got[d], s / n)
