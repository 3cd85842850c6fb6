"""Second-wave extension operators: IVF ANN, BPE-ish tokenizer,
rolling fingerprint, multimodal resize/audio stubs, hashed-shingle
dedup parity."""

import pytest
from pyspark.sql import functions as F

from zikeiretsu_rs_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def emb(spark):
    import math

    rows = []
    for i in range(40):
        base = i % 4  # four well-separated clusters on axes 0..3
        vec = [0.0] * 8
        vec[base] = 1.0
        vec[(base + 4) % 8] = 0.1 * math.sin(i)  # slight within-cluster jitter
        rows.append((i, vec))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


class TestIvf:
    def test_assignment_covers_corpus_once(self, emb):
        cents = similarity.sample_centroids(emb, 4, "vec_id", "embedding")
        out = similarity.ivf_topk(
            emb, emb.where(F.col("vec_id") < 3), k=3, dim=8,
            n_cells=4, nprobe=4, centroids=cents,
        )
        # nprobe == n_cells -> probes everything -> must equal brute force
        brute = similarity.cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=3)
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, brute.collect())
        )

    def test_partial_probe_returns_subset_ranking(self, emb):
        out = similarity.ivf_topk(
            emb, emb.where(F.col("vec_id") < 3), k=3, dim=8,
            n_cells=4, nprobe=1,
        ).collect()
        assert all(r["rank"] <= 3 for r in out)
        assert all(r["query_id"] != r["neighbor_id"] for r in out)

    def test_centroids_deterministic(self, emb):
        a = similarity.sample_centroids(emb, 4, "vec_id", "embedding")
        b = similarity.sample_centroids(emb, 4, "vec_id", "embedding")
        assert a == b


class TestBpeTokens:
    def test_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello, world! abc123 x")], ["doc_id", "text"]
        )
        r = text.bpe_token_count(df, "doc_id", "text").collect()[0]
        # "hello" "," " world" "!" " abc" "123" " x" -> 7
        assert r["n_bpe_tokens"] == 7
        assert r["n_ws_tokens"] == 4


class TestRollingFingerprint:
    def test_order_sensitive(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "gamma beta alpha"),
             (3, "alpha beta gamma")],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r["rolling_fp"] for r in
               text.rolling_fingerprint(df, "doc_id", "text").collect()}
        assert got[1] == got[3]
        assert got[1] != got[2]  # md5-of-set would not catch reordering


class TestHashedShingles:
    def test_same_pairs_as_exact(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely unrelated content here"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        exact = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.3)
        hashed = dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.3, hash_shingles=True
        )
        assert sorted(map(tuple, exact.collect())) == sorted(
            map(tuple, hashed.collect())
        )

    def test_active_doc_freq_cap_preserves_pair_set(self, spark):
        """With the doc-frequency cap ACTIVE (a shingle shared by >cap
        docs is dropped from the join), near-dup pairs survive as long
        as they share sub-cap shingles; their scores may only shrink
        (denominators keep full set sizes). This is the 100 TB skew
        guard's contract: recall of clearly-near-dup pairs, never
        inflated scores."""
        common = "alpha beta gamma"  # shingle shared by ALL docs
        rows = [(i, f"{common} filler{i} tail{i} unique{i} words{i}") for i in range(1, 9)]
        # two true near-dups sharing rare shingles beyond the common one
        rows += [
            (100, f"{common} same rare shingle payload here today"),
            (101, f"{common} same rare shingle payload here tomorrow"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        exact = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.3)
        guarded = dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.3,
            max_shingle_doc_freq=5, hash_shingles=True,
        )
        e = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact.collect()}
        g = {(r["id_a"], r["id_b"]): r["jaccard"] for r in guarded.collect()}
        assert (100, 101) in e and (100, 101) in g
        assert set(g) <= set(e)  # the guard never invents pairs
        for k, v in g.items():
            assert v <= e[k]  # scores only shrink when shingles drop


class TestArrowLshSignature:
    def test_matches_expression_path(self, spark, emb):
        from zikeiretsu_rs_spark.operators.similarity import (
            lsh_signature,
            lsh_signature_arrow,
            with_double_vec,
        )

        v = with_double_vec(emb, "embedding")
        expr_sig = {
            (r["vec_id"], r["tbl"]): r["bucket"]
            for r in lsh_signature(v, dim=8, n_planes=6, n_tables=4).collect()
        }
        arrow_sig = {
            (r["vec_id"], r["tbl"]): r["bucket"]
            for r in lsh_signature_arrow(v, dim=8, n_planes=6, n_tables=4).collect()
        }
        assert set(expr_sig) == set(arrow_sig)
        agree = sum(expr_sig[k] == arrow_sig[k] for k in expr_sig)
        # sign flips need a dot within summation-order error of zero —
        # effectively never on real vectors; allow <2% slack anyway
        assert agree / len(expr_sig) > 0.98
        # deterministic across runs
        again = {
            (r["vec_id"], r["tbl"]): r["bucket"]
            for r in lsh_signature_arrow(v, dim=8, n_planes=6, n_tables=4).collect()
        }
        assert arrow_sig == again


class TestKmeansCentroids:
    def test_fit_and_probe(self, spark, emb):
        from zikeiretsu_rs_spark.operators.similarity import (
            ivf_topk,
            kmeans_centroids,
        )

        cents = kmeans_centroids(emb, n_cells=3, max_iter=5)
        assert len(cents) == 3 and all(len(c) == 8 for c in cents)
        # deterministic for a fixed seed
        assert cents == kmeans_centroids(emb, n_cells=3, max_iter=5)
        queries = emb.limit(2)
        out = ivf_topk(
            emb, queries, k=3, dim=8, n_cells=3, nprobe=2, centroids=cents
        )
        assert out.count() > 0
        assert set(out.columns) == {"query_id", "neighbor_id", "cosine", "rank"}


class TestCellSizing:
    def test_n_cells_for_sqrt_rule(self):
        from zikeiretsu_rs_spark.operators.similarity import n_cells_for

        assert n_cells_for(1) == 2  # floor
        assert n_cells_for(100) == 10  # perfect square
        assert n_cells_for(101) == 11  # ceil
        assert n_cells_for(10_000) == 100
        assert n_cells_for(1_000_000_000) == 31_623  # ceil(sqrt(1e9))

    def test_n_cells_for_target_rule(self):
        from zikeiretsu_rs_spark.operators.similarity import n_cells_for

        assert n_cells_for(1000, target_cell_rows=100) == 10
        assert n_cells_for(1001, target_cell_rows=100) == 11  # ceil
        assert n_cells_for(50, target_cell_rows=100) == 2  # floor

    def test_assign_cells_arrow_matches_expression(self, spark, emb):
        from zikeiretsu_rs_spark.operators.similarity import (
            assign_cells,
            assign_cells_arrow,
            kmeans_centroids,
        )

        cents = kmeans_centroids(emb, n_cells=3, max_iter=5)
        expr = {
            r["vec_id"]: (r["cell"], round(r["_n"], 9))
            for r in assign_cells(emb, cents).collect()
        }
        arrow = {
            r["vec_id"]: (r["cell"], round(r["_n"], 9))
            for r in assign_cells_arrow(emb, cents).collect()
        }
        assert expr == arrow

    def test_semantic_dedup_default_scales_cells(self, spark, emb):
        """With no n_cells/centroids, semantic_dedup sizes cells by
        n_cells_for — the anti-scale-trap default."""
        from zikeiretsu_rs_spark.operators.similarity import semantic_dedup

        out = semantic_dedup(emb, threshold=0.40)
        assert out.count() == emb.count()
        assert set(out.columns) == {"vec_id", "dup_of", "is_kept"}


class TestLshPairs:
    def test_subset_of_bruteforce_and_exact_scores(self, spark, emb):
        from zikeiretsu_rs_spark.operators.similarity import (
            cosine_pairs_above,
            lsh_pairs_above,
        )

        exact = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in cosine_pairs_above(emb, threshold=0.8).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in lsh_pairs_above(emb, threshold=0.8, dim=8).collect()
        }
        assert set(lsh) <= set(exact)  # no false positives
        for k, v in lsh.items():
            assert v == exact[k]  # exact verification, same rounding
        # clustered fixture -> same-cluster pairs collide in some table
        assert len(lsh) > 0


class TestConnectedComponents:
    def test_chain_pair_and_rep_selection(self, spark):
        # chain 1-2-3 (+7 attached), separate pair 5-9, 11 untouched
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 9), (7, 3)], ["id_a", "id_b"]
        )
        cc = {
            r["node"]: r["cluster_id"]
            for r in dedup.connected_components(pairs).collect()
        }
        assert cc == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 9: 5}
        docs = spark.createDataFrame(
            [(i, f"d{i}") for i in [1, 2, 3, 5, 7, 9, 11]], ["doc_id", "text"]
        )
        kept = sorted(
            r["doc_id"]
            for r in dedup.dedup_by_clusters(
                docs, dedup.connected_components(pairs), "doc_id"
            ).collect()
        )
        assert kept == [1, 5, 11]

    def test_empty_pairs(self, spark):
        from pyspark.sql import types as T

        empty = spark.createDataFrame(
            [], T.StructType([
                T.StructField("id_a", T.LongType()),
                T.StructField("id_b", T.LongType()),
            ])
        )
        assert dedup.connected_components(empty).count() == 0

    def test_deep_chain_converges(self, spark):
        # a 12-node path: min-label takes several propagation rounds
        # to reach the far end — pins the changed-flag convergence
        # check across multiple genuinely-changing iterations
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 12)], ["id_a", "id_b"]
        )
        cc = {
            r["node"]: r["cluster_id"]
            for r in dedup.connected_components(pairs).collect()
        }
        assert cc == {i: 1 for i in range(1, 13)}

    def test_non_convergence_raises(self, spark):
        import pytest as _pytest

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 40)], ["id_a", "id_b"]
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            dedup.connected_components(pairs, max_iter=2)


class TestDeterministicSampling:
    def test_stable_across_partitionings(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        df = spark.createDataFrame([(i,) for i in range(1000)], ["id"])
        a = {r["id"] for r in sampling.deterministic_sample(df, "id", 64).collect()}
        b = {
            r["id"]
            for r in sampling.deterministic_sample(
                df.repartition(17), "id", 64
            ).collect()
        }
        assert a == b  # partition layout cannot change membership
        assert 0.15 < len(a) / 1000 < 0.35  # ~64/256

    def test_split_partition_and_monotone_growth(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        small = spark.createDataFrame([(i,) for i in range(300)], ["id"])
        big = spark.createDataFrame([(i,) for i in range(1000)], ["id"])
        s_small = {
            r["id"]: r["split"]
            for r in sampling.train_test_split(small, "id").collect()
        }
        s_big = {
            r["id"]: r["split"]
            for r in sampling.train_test_split(big, "id").collect()
        }
        # growing the dataset never moves an existing row's split
        assert all(s_big[i] == s_small[i] for i in s_small)
        assert set(s_big.values()) == {"train", "valid", "test"}


class TestStratifiedSample:
    def _df(self, spark, sizes):
        rows = [
            (s * 10_000 + i, f"s{s}")
            for s, n in enumerate(sizes)
            for i in range(n)
        ]
        return spark.createDataFrame(rows, ["id", "src"])

    def test_exact_quotas_and_hash_order(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        df = self._df(spark, [100, 50, 3])
        out = sampling.stratified_sample(
            df, "src", "id", {"s0": 10, "s1": 5, "s2": 7}
        ).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["src"], []).append(r)
        assert len(by_src["s0"]) == 10 and len(by_src["s1"]) == 5
        assert len(by_src["s2"]) == 3  # smaller than quota -> kept whole
        # rnk is the 1-based md5-order position
        import hashlib

        for src, rows in by_src.items():
            ranked = sorted(rows, key=lambda r: r["rnk"])
            keys = [r["id"] for r in ranked]
            assert keys == sorted(
                keys, key=lambda k: hashlib.md5(str(k).encode()).hexdigest()
            )

    def test_default_quota_and_drop_zero(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        df = self._df(spark, [20, 20, 20])
        out = sampling.stratified_sample(
            df, "src", "id", {"s0": 4}, default_quota=0
        ).collect()
        assert {r["src"] for r in out} == {"s0"} and len(out) == 4

    def test_prefilter_path_equals_exact(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        df = self._df(spark, [400, 80, 11, 1])
        quotas = {"s0": 25, "s1": 13, "s2": 11, "s3": 5}
        exact = sampling.stratified_sample(df, "src", "id", quotas)
        pruned = sampling.stratified_sample(
            df, "src", "id", quotas, prefilter_overselect=4.0
        )
        assert sorted(map(tuple, exact.collect())) == sorted(
            map(tuple, pruned.collect())
        )

    def test_prefilter_fallback_rescues_tight_overselect(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        # overselect ~1.0 makes under-selection likely for some strata;
        # the sufficiency fallback must keep the result exact anyway
        df = self._df(spark, [300, 200, 100])
        quotas = {"s0": 20, "s1": 15, "s2": 10}
        exact = sampling.stratified_sample(df, "src", "id", quotas)
        tight = sampling.stratified_sample(
            df, "src", "id", quotas, prefilter_overselect=1.0
        )
        assert sorted(map(tuple, exact.collect())) == sorted(
            map(tuple, tight.collect())
        )

    def test_quota_growth_is_monotone(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        df = self._df(spark, [200])
        small = {
            r["id"] for r in
            sampling.stratified_sample(df, "src", "id", {"s0": 10}).collect()
        }
        big = {
            r["id"] for r in
            sampling.stratified_sample(df, "src", "id", {"s0": 30}).collect()
        }
        assert small < big  # raising a quota only adds rows

    def test_stable_across_partitionings(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        df = self._df(spark, [150, 150])
        quotas = {"s0": 12, "s1": 7}
        a = sampling.stratified_sample(df, "src", "id", quotas)
        b = sampling.stratified_sample(
            df.repartition(13), "src", "id", quotas,
            prefilter_overselect=3.0,
        )
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )


class TestLeakageSafeSplit:
    def test_near_dups_share_split(self, spark):
        from pyspark.sql import functions as F

        from zikeiretsu_rs_spark.operators import sampling

        docs = spark.createDataFrame(
            [(i,) for i in range(40)], "doc_id bigint"
        )
        # chain 0-1-2 is one cluster; 10-11 another; rest singletons
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (10, 11)], "id_a bigint, id_b bigint"
        )
        out = {
            r["doc_id"]: r
            for r in sampling.leakage_safe_split(
                docs, "doc_id", pairs
            ).collect()
        }
        assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"] == 0
        assert out[0]["split"] == out[1]["split"] == out[2]["split"]
        assert out[10]["split"] == out[11]["split"]
        assert out[10]["cluster_id"] == 10
        # singletons bucket by their own id == plain train_test_split
        plain = {
            r["doc_id"]: r["split"]
            for r in sampling.train_test_split(docs, "doc_id").collect()
        }
        for i in range(20, 40):
            assert out[i]["cluster_id"] == i and out[i]["split"] == plain[i]

    def test_empty_graph_degrades_to_hash_split(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        docs = spark.createDataFrame([(i,) for i in range(16)], "doc_id bigint")
        empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
        out = {
            r["doc_id"]: r["split"]
            for r in sampling.leakage_safe_split(docs, "doc_id", empty).collect()
        }
        plain = {
            r["doc_id"]: r["split"]
            for r in sampling.train_test_split(docs, "doc_id").collect()
        }
        assert out == plain


class TestIvfArrowDispatch:
    def test_large_centroid_set_matches_expression_path(
        self, spark, monkeypatch
    ):
        """Past MAX_EXPR_CENTROIDS the corpus-side assignment runs the
        Arrow matmul path; results must match the expression path on
        TIE-FREE data (on exact real-arithmetic score ties the two
        paths may round differently — numpy pairwise summation vs the
        expression left-fold — so the axis-aligned `emb` fixture is
        deliberately not used here)."""
        from zikeiretsu_rs_spark.operators import similarity

        import random

        rng = random.Random(42)
        rows = [
            (i, [rng.random() + 0.01 for _ in range(8)]) for i in range(60)
        ]
        corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
        cents = similarity.sample_centroids(corpus, 20, "vec_id", "embedding")
        queries = corpus.limit(3)

        def run():
            return sorted(
                (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
                for r in similarity.ivf_topk(
                    corpus, queries, k=3, dim=8, nprobe=4, centroids=cents
                ).collect()
            )

        arrow = run()  # 20 > 16: arrow path
        monkeypatch.setattr(similarity, "MAX_EXPR_CENTROIDS", 1000)
        expr = run()  # forced expression path
        assert arrow == expr and len(arrow) > 0


class TestPrefixFilterJaccard:
    """AllPairs/PPJoin prefix filtering: completeness is a theorem, so
    the output must EQUAL the brute-force formulation on any corpus."""

    def _corpus(self, spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_equals_exact_on_near_dup_corpus(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "a completely different set of words entirely here"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup
            (5, "quick brown fox jumps over the lazy"),  # subset
        ]
        df = self._corpus(spark, rows)
        for t in (0.3, 0.5, 0.8):
            exact = sorted(
                map(tuple, dedup.ngram_jaccard_pairs(
                    df, "doc_id", "text", threshold=t).collect())
            )
            pf = sorted(
                map(tuple, dedup.prefix_filter_jaccard_pairs(
                    df, "doc_id", "text", threshold=t).collect())
            )
            assert pf == exact, f"threshold {t}"

    def test_equals_exact_under_hot_shingle_skew(self, spark):
        """The adversarial shape: one boilerplate phrase in every doc.
        The hot shingles sort LAST in the rare-first canonical order,
        so they leave every prefix — yet the near-dup pair must still
        be found via its rare shared shingles."""
        boiler = "all rights reserved click here to subscribe now"
        rows = [(i, f"{boiler} unique{i} words{i} here{i}") for i in range(30)]
        rows += [
            (100, f"{boiler} same rare payload shingle text today"),
            (101, f"{boiler} same rare payload shingle text friday"),
        ]
        df = self._corpus(spark, rows)
        exact = sorted(
            map(tuple, dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", threshold=0.5).collect())
        )
        pf = sorted(
            map(tuple, dedup.prefix_filter_jaccard_pairs(
                df, "doc_id", "text", threshold=0.5).collect())
        )
        assert pf == exact
        assert (100, 101) in {(a, b) for a, b, _ in pf}

    def test_prefix_prunes_hot_shingles_from_candidates(self, spark):
        """Every doc shares the boilerplate, so the all-shingle join
        yields ~all pairs; the prefix join must collide only docs
        whose RARE prefixes intersect."""
        boiler = "all rights reserved click here to subscribe now"
        uniq = lambda i: " ".join(f"w{i}x{j}" for j in range(10))
        rows = [(i, f"{boiler} {uniq(i)}") for i in range(20)]
        df = self._corpus(spark, rows)
        cand = dedup.prefix_filter_candidates(
            df, "doc_id", "text", threshold=0.5
        ).count()
        # Each doc: 18 words -> 16 shingles, 6 boiler-only (df=20) and
        # 10 touching unique words (df=1). Prefix length at t=0.5 is
        # 16 - 8 + 1 = 9 <= 10 rare shingles, so every prefix consists
        # purely of per-doc-unique shingles: zero collisions, vs
        # C(20,2)=190 candidate pairs for the all-shingle join.
        assert cand == 0

    def test_fp_integral_threshold_boundary_not_pruned(self, spark):
        """ADVICE r06 medium: at thresholds where t·|size| is integral
        but the double product rounds UP (0.07 × 100 =
        7.000000000000001), the old ceil-based size prune and prefix
        cut both dropped a boundary pair whose raw Jaccard passes the
        scorer's `>= t` — a silent false-keep. The division
        formulation shares the scorer's rounding, so the J = 7/100
        pair must survive at t = 0.07."""
        small = " ".join(f"w{j}" for j in range(7))
        big = small + " " + " ".join(f"u{j}" for j in range(93))
        df = self._corpus(spark, [(1, big), (2, small)])
        # n=1 shingles = distinct words: |A|=100, |B|=7, B ⊆ A,
        # J = 7/100 = exactly the threshold
        exact = sorted(map(tuple, dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=1, threshold=0.07
        ).collect()))
        pf = sorted(map(tuple, dedup.prefix_filter_jaccard_pairs(
            df, "doc_id", "text", n=1, threshold=0.07
        ).collect()))
        assert exact == pf
        assert [(a, b) for a, b, _ in pf] == [(1, 2)]
        # the incremental path shares the pruned join — the new doc
        # must be DROPPED as a dup of the corpus doc at the boundary
        inc = dedup.incremental_dedup(
            spark.createDataFrame(
                [(1, big, False), (2, small, True)],
                ["doc_id", "text", "is_new"],
            ),
            "doc_id", "text", "is_new", n=1, threshold=0.07,
        ).collect()
        assert [(r.doc_id, r.is_kept, r.dup_of) for r in inc] == [
            (2, False, 1)
        ]

    def test_string_and_hashed_prefixes_agree(self, spark):
        rows = [
            (1, "shared text body one two three four five six"),
            (2, "shared text body one two three four five seven"),
            (3, "nothing in common with anything else at all ok"),
        ]
        df = self._corpus(spark, rows)
        s = sorted(map(tuple, dedup.prefix_filter_jaccard_pairs(
            df, "doc_id", "text", threshold=0.4, hash_shingles=False
        ).collect()))
        h = sorted(map(tuple, dedup.prefix_filter_jaccard_pairs(
            df, "doc_id", "text", threshold=0.4, hash_shingles=True
        ).collect()))
        assert s == h and len(s) >= 1


class TestProductQuantization:
    def test_ivfpq_join_row_identical_to_collect_path(self, spark):
        """`ivfpq_topk_join` (queries stay a DataFrame; probe rows
        meet PQ codes via one cell equi-join; per-query ADC LUTs are
        built inside the Arrow scoring pass) must be ROW-IDENTICAL to
        `ivfpq_topk` under the same codebook/centroids — same float64
        gather-sums, same probe/tie orders, different distribution
        strategy (VERDICT r06 item 2)."""
        import random

        rng = random.Random(11)
        rows = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(300)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(6)
        queries = emb.where("vec_id < 20")
        book = similarity.pq_codebook(emb, m=8, ksub=16)
        cents = similarity.sample_centroids(emb, 16, "vec_id", "embedding")
        a = sorted(map(tuple, similarity.ivfpq_topk(
            emb, queries, book, k=10, n_cells=16, nprobe=4, centroids=cents
        ).collect()))
        b = sorted(map(tuple, similarity.ivfpq_topk_join(
            emb, queries, book, k=10, n_cells=16, nprobe=4, centroids=cents
        ).collect()))
        assert a == b and len(a) > 0

    def test_exact_when_codebook_covers_corpus(self, spark):
        """With ksub >= corpus size the hash-sampled codebook contains
        every corpus subvector, so reconstruction is exact and the ADC
        ranking must equal brute-force cosine top-k."""
        import random

        rng = random.Random(3)
        rows = [(i, [rng.random() for _ in range(16)]) for i in range(20)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = emb.where(F.col("vec_id") < 3)
        book = similarity.pq_codebook(emb, m=4, ksub=32)
        adc = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in similarity.pq_topk(emb, queries, book, k=5).collect()
        }
        exact = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in similarity.cosine_topk(emb, queries, k=5).collect()
        }
        assert adc == exact

    def test_encode_picks_nearest_centroid(self, spark):
        import numpy as np
        import random

        rng = random.Random(9)
        rows = [(i, [rng.random() for _ in range(8)]) for i in range(30)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        book = similarity.pq_codebook(emb, m=2, ksub=4)
        codes = {
            r["vec_id"]: r["codes"]
            for r in similarity.pq_encode(emb, book).collect()
        }
        cmat = np.array(book)  # (m, ksub, dsub)
        for vid, vec in rows:
            v = np.array(vec).reshape(2, 4)
            for j in range(2):
                d = ((cmat[j] - v[j]) ** 2).sum(axis=1)
                assert codes[vid][j] == int(np.argmin(d))

    def test_codes_partitioning_invariant(self, spark):
        import random

        rng = random.Random(5)
        rows = [(i, [rng.random() for _ in range(8)]) for i in range(40)]
        base = spark.createDataFrame(rows, ["vec_id", "embedding"])
        book = similarity.pq_codebook(base, m=4, ksub=8)
        a = {
            r["vec_id"]: list(r["codes"])
            for r in similarity.pq_encode(base.repartition(1), book).collect()
        }
        b = {
            r["vec_id"]: list(r["codes"])
            for r in similarity.pq_encode(base.repartition(7), book).collect()
        }
        assert a == b

    def test_kmeans_codebook_shape_and_determinism(self, spark):
        import random

        rng = random.Random(1)
        rows = [(i, [rng.random() for _ in range(8)]) for i in range(40)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        b1 = similarity.pq_codebook_kmeans(emb, m=2, ksub=3, seed=7)
        b2 = similarity.pq_codebook_kmeans(emb, m=2, ksub=3, seed=7)
        assert len(b1) == 2 and all(len(s) == 3 for s in b1)
        assert all(len(c) == 4 for s in b1 for c in s)
        assert b1 == b2


class TestIvfPq:
    def test_full_probe_equals_pq(self, spark):
        """nprobe == n_cells probes everything, so IVFPQ must equal
        the plain PQ ADC ranking."""
        import random

        rng = random.Random(11)
        rows = [(i, [rng.random() for _ in range(16)]) for i in range(40)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = emb.where(F.col("vec_id") < 3)
        book = similarity.pq_codebook(emb, m=4, ksub=8)
        cents = similarity.sample_centroids(emb, 4, "vec_id", "embedding")
        full = sorted(
            map(
                tuple,
                similarity.ivfpq_topk(
                    emb, queries, book, k=5, n_cells=4, nprobe=4,
                    centroids=cents,
                ).collect(),
            )
        )
        pq = sorted(
            map(tuple, similarity.pq_topk(emb, queries, book, k=5).collect())
        )
        assert full == pq

    def test_partial_probe_subset_of_full(self, spark):
        import random

        rng = random.Random(13)
        rows = [(i, [rng.random() for _ in range(16)]) for i in range(40)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = emb.where(F.col("vec_id") < 3)
        book = similarity.pq_codebook(emb, m=4, ksub=8)
        cents = similarity.sample_centroids(emb, 4, "vec_id", "embedding")
        part = similarity.ivfpq_topk(
            emb, queries, book, k=5, n_cells=4, nprobe=2, centroids=cents
        ).collect()
        # every (query, neighbor, score) the partial probe emits must
        # carry the same ADC score the full scan assigns
        full = {
            (r["query_id"], r["neighbor_id"]): r["adc_cosine"]
            for r in similarity.ivfpq_topk(
                emb, queries, book, k=40, n_cells=4, nprobe=4,
                centroids=cents,
            ).collect()
        }
        assert len(part) > 0
        for r in part:
            key = (r["query_id"], r["neighbor_id"])
            assert key in full and full[key] == r["adc_cosine"]


class TestBpeLearning:
    @staticmethod
    def _ref_bpe(texts, n_merges, min_freq=2):
        """Pure-Python reference BPE (Sennrich et al.), ties broken
        lexicographically — the ground truth for the distributed
        implementation."""
        import collections

        wf = collections.Counter(w for t in texts for w in t.lower().split())
        vocab = {w: list(w) + ["</w>"] for w in wf}
        merges = []
        for _ in range(n_merges):
            pc = collections.Counter()
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += wf[w]
            if not pc:
                break
            (l, r), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if f < min_freq:
                break
            merges.append((l, r, f))
            for w in vocab:
                s = vocab[w]
                res, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                vocab[w] = res
        return merges

    def test_merge_sequence_matches_reference(self, spark):
        from zikeiretsu_rs_spark.operators import bpe

        texts = [
            "low lower lowest low low",
            "new newer newest new lower",
            "wide wider widest low new",
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        got = bpe.learn_merges(df, "text", n_merges=15)
        assert got == self._ref_bpe(texts, 15)
        assert len(got) > 5  # the corpus supports a real merge chain

    def test_repeated_symbol_greedy_merge(self, spark):
        from zikeiretsu_rs_spark.operators import bpe

        # "aaaa": pair (a,a) has 3 positions but greedy left-to-right
        # merging yields [aa, aa, </w>] — the reference semantics
        df = spark.createDataFrame(
            [(1, "aaaa aaaa"), (2, "aaaa aa")], ["doc_id", "text"]
        )
        got = bpe.learn_merges(df, "text", n_merges=3)
        assert got == self._ref_bpe(["aaaa aaaa", "aaaa aa"], 3)

    def test_segment_counts(self, spark):
        from zikeiretsu_rs_spark.operators import bpe

        texts = ["low low lower", "newest newest"]
        df = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        merges = bpe.learn_merges(df, "text", n_merges=10)
        out = {
            r["doc_id"]: (r["n_words"], r["n_subwords"])
            for r in bpe.segment(df, merges, "doc_id", "text").collect()
        }
        # segmentation never yields fewer than one subword per word,
        # nor more than chars + end marker
        for i, t in enumerate(texts):
            words = t.split()
            n_words, n_sub = out[i]
            assert n_words == len(words)
            assert n_sub >= n_words
            assert n_sub <= sum(len(w) + 1 for w in words)
        # "low" appears 3x in doc 0 and merges to a single token
        assert out[0][1] < sum(len(w) + 1 for w in texts[0].split())


class TestPqRefined:
    def test_refined_rank_exact_within_candidates(self, spark):
        """Refined output must rank candidates by EXACT cosine: with a
        codebook covering the corpus (exact reconstruction) the
        refined top-k equals brute force for any expand >= 1."""
        import random

        rng = random.Random(21)
        rows = [(i, [rng.random() for _ in range(16)]) for i in range(25)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = emb.where(F.col("vec_id") < 3)
        book = similarity.pq_codebook(emb, m=4, ksub=32)
        got = sorted(map(tuple, similarity.pq_topk_refined(
            emb, queries, book, k=5, expand=1).collect()))
        brute = sorted(map(tuple, similarity.cosine_topk(
            emb, queries, k=5).collect()))
        assert got == brute

    def test_scores_are_exact_cosines(self, spark):
        import random

        rng = random.Random(23)
        rows = [(i, [rng.random() for _ in range(8)]) for i in range(30)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = emb.where(F.col("vec_id") < 2)
        book = similarity.pq_codebook(emb, m=2, ksub=4)  # coarse codes
        brute = {
            (r["query_id"], r["neighbor_id"]): r["cosine"]
            for r in similarity.cosine_topk(emb, queries, k=30).collect()
        }
        for r in similarity.pq_topk_refined(
            emb, queries, book, k=5, expand=2
        ).collect():
            # whatever candidates ADC proposed, their emitted scores
            # are the exact cosines, not the ADC approximations
            assert brute[(r["query_id"], r["neighbor_id"])] == r["cosine"]


class TestResidualIvfPq:
    def test_exact_when_residuals_covered(self, spark):
        """Corpus built as centroid + tiny displacement, codebook
        trained on a sample that covers every distinct residual: the
        reconstruction is exact, so residual-IVFADC at full probe
        equals brute-force cosine."""
        import random

        rng = random.Random(31)
        cents = [[10.0 * (i == j) for j in range(8)] for i in range(4)]
        rows = []
        for i in range(24):
            c = cents[i % 4]
            disp = [0.1 * ((i // 4) % 3 - 1) * (j % 2) for j in range(8)]
            rows.append((i, [c[j] + disp[j] for j in range(8)]))
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = emb.where(F.col("vec_id") < 3)
        rbook = similarity.pq_codebook_residual(
            emb, cents, m=2, ksub=64, n_train=64
        )
        got = sorted(map(tuple, similarity.ivfpq_residual_topk(
            emb, queries, rbook, k=5, n_cells=4, nprobe=4, centroids=cents
        ).collect()))
        brute = sorted(map(tuple, similarity.cosine_topk(
            emb, queries, k=5).collect()))
        assert got == brute

    def test_partial_probe_scores_consistent(self, spark):
        import random

        rng = random.Random(33)
        rows = [(i, [rng.random() for _ in range(16)]) for i in range(40)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = emb.where(F.col("vec_id") < 3)
        cents = similarity.sample_centroids(emb, 4, "vec_id", "embedding")
        rbook = similarity.pq_codebook_residual(emb, cents, m=4, ksub=16)
        full = {
            (r["query_id"], r["neighbor_id"]): r["adc_cosine"]
            for r in similarity.ivfpq_residual_topk(
                emb, queries, rbook, k=40, n_cells=4, nprobe=4,
                centroids=cents,
            ).collect()
        }
        part = similarity.ivfpq_residual_topk(
            emb, queries, rbook, k=5, n_cells=4, nprobe=2, centroids=cents
        ).collect()
        assert len(part) > 0
        for r in part:
            assert full[(r["query_id"], r["neighbor_id"])] == r["adc_cosine"]


class TestPercellResidualIvfPq:
    """pq_codebook_residual_percell + ivfadc_percell_topk (round 9,
    VERDICT r08 item 6): per-cell residual codebooks at the same
    per-vector code budget — the measured 0.60 -> 0.74 recall lift on
    the clustered bench corpus (bench `ann` curve)."""

    def _planted(self, spark):
        cents = [[10.0 * (i == j) for j in range(8)] for i in range(4)]
        rows = []
        for i in range(24):
            c = cents[i % 4]
            disp = [0.1 * ((i // 4) % 3 - 1) * (j % 2) for j in range(8)]
            rows.append((i, [c[j] + disp[j] for j in range(8)]))
        return cents, spark.createDataFrame(rows, ["vec_id", "embedding"])

    def test_exact_when_residuals_covered(self, spark):
        """Each cell's book trained over ALL of its residuals with
        ksub >= distinct residuals: reconstruction is exact, so the
        full-probe per-cell search equals brute-force cosine."""
        cents, emb = self._planted(spark)
        queries = emb.where(F.col("vec_id") < 3)
        books = similarity.pq_codebook_residual_percell(
            emb, cents, m=2, ksub=16
        )
        got = sorted(map(tuple, similarity.ivfadc_percell_topk(
            emb, queries, books, k=5, nprobe=4, centroids=cents
        ).collect()))
        brute = sorted(map(tuple, similarity.cosine_topk(
            emb, queries, k=5).collect()))
        assert got == brute

    def test_trainer_deterministic_across_partitionings(self, spark):
        """The per-cell Lloyd fit hash-sorts each group before
        fitting, so the model is identical under any partitioning of
        the training corpus."""
        cents, emb = self._planted(spark)
        b1 = similarity.pq_codebook_residual_percell(
            emb.repartition(7), cents, m=2, ksub=8
        )
        b2 = similarity.pq_codebook_residual_percell(
            emb.coalesce(1), cents, m=2, ksub=8
        )
        assert b1 == b2

    def test_small_cells_padded_and_encodable(self, spark):
        """A cell with fewer rows than ksub gets its centroids cycled
        up to ksub (rectangular model; argmin ties break low so the
        padding never changes an encoding), and every corpus row still
        encodes with codes in [0, ksub)."""
        cents, emb = self._planted(spark)
        books = similarity.pq_codebook_residual_percell(
            emb, cents, m=2, ksub=64  # 6 rows/cell << ksub
        )
        assert all(len(sub) == 64 for bk in books for sub in bk)
        coded = similarity.residual_encode_percell(
            emb, cents, books
        ).collect()
        assert len(coded) == 24
        for r in coded:
            assert len(r["codes"]) == 2
            assert all(0 <= c < 64 for c in r["codes"])

    def test_partial_probe_scores_consistent(self, spark):
        """nprobe < n_cells returns a subset of the full-probe results
        with identical ADC scores (pruning changes coverage, never
        scoring)."""
        import random

        rng = random.Random(33)
        rows = [(i, [rng.random() for _ in range(16)]) for i in range(40)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = emb.where(F.col("vec_id") < 3)
        cents = similarity.sample_centroids(emb, 4, "vec_id", "embedding")
        books = similarity.pq_codebook_residual_percell(
            emb, cents, m=4, ksub=16
        )
        full = {
            (r["query_id"], r["neighbor_id"]): r["adc_cosine"]
            for r in similarity.ivfadc_percell_topk(
                emb, queries, books, k=40, nprobe=4, centroids=cents,
            ).collect()
        }
        part = similarity.ivfadc_percell_topk(
            emb, queries, books, k=5, nprobe=2, centroids=cents
        ).collect()
        assert len(part) > 0
        for r in part:
            assert full[(r["query_id"], r["neighbor_id"])] == r["adc_cosine"]

    def test_refined_scores_are_exact_cosines(self, spark):
        """ivfadc_percell_topk_refined: whatever candidates the
        per-cell ADC proposed, the emitted scores are the exact
        cosines (brute-force values), not the ADC approximations —
        and the collect/join propose paths agree row-for-row."""
        cents, emb = self._planted(spark)
        queries = emb.where(F.col("vec_id") < 3)
        books = similarity.pq_codebook_residual_percell(
            emb, cents, m=2, ksub=8
        )
        brute = {
            (r["query_id"], r["neighbor_id"]): r["cosine"]
            for r in similarity.cosine_topk(emb, queries, k=23).collect()
        }
        got = similarity.ivfadc_percell_topk_refined(
            emb, queries, books, k=5, expand=2, nprobe=4, centroids=cents
        ).collect()
        assert len(got) > 0
        for r in got:
            assert brute[(r["query_id"], r["neighbor_id"])] == r["cosine"]
        via_join = similarity.ivfadc_percell_topk_refined(
            emb, queries, books, k=5, expand=2, nprobe=4,
            centroids=cents, join_path=True,
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, via_join))

    def test_refined_zero_norm_candidate_scores_zero(self, spark):
        """Round-9 review finding: the exact re-score tail divides by
        _cn*_qn, and the session pins ANSI mode where x/0 raises — a
        zero-norm corpus vector proposed by the ADC stage (which
        scores it 0.0 via np.where) used to crash the refined query.
        The shared _exact_rescore guards the division and applies the
        SAME 0.0 convention as every ADC scan kernel."""
        cents, emb = self._planted(spark)
        zero = spark.createDataFrame(
            [(999, [0.0] * 8)], ["vec_id", "embedding"]
        )
        corpus = emb.unionByName(zero)
        queries = emb.where(F.col("vec_id") < 2)
        books = similarity.pq_codebook_residual_percell(
            corpus, cents, m=2, ksub=32
        )
        # k*expand large enough that the zero vector's candidate row
        # survives into the re-score join
        rows = similarity.ivfadc_percell_topk_refined(
            corpus, queries, books, k=25, expand=1, nprobe=4,
            centroids=cents,
        ).collect()
        scores = {
            (r["query_id"], r["neighbor_id"]): r["cosine"] for r in rows
        }
        zero_rows = [v for kq, v in scores.items() if kq[1] == 999]
        assert zero_rows and all(v == 0.0 for v in zero_rows)


class TestSemanticDecontaminate:
    def test_planted_paraphrase_flagged(self, spark):
        # corpus vector 10 IS eval vector 0 (cosine 1); vector 11 is
        # orthogonal to everything in the eval set
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (10, [2.0, 0.0, 0.0, 0.0]),   # same direction as eval 0
            (11, [0.0, 0.0, 1.0, 0.0]),   # orthogonal
            (12, [1.0, 1.0, 0.0, 0.0]),   # cos 0.707 to both
        ]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = {
            r["vec_id"]: (r["max_eval_cosine"], r["contaminated"])
            for r in similarity.semantic_decontaminate(
                emb.where(F.col("vec_id") >= 10),
                emb.where(F.col("vec_id") < 10),
                0.9,
            ).collect()
        }
        assert out[10] == (1.0, True)
        assert out[11] == (0.0, False)
        assert out[12][0] == 0.707107 and not out[12][1]
        assert len(out) == 3  # every corpus row present, clean or not

    def test_no_shuffle_of_corpus(self, spark):
        """The eval side must broadcast: the plan may shuffle only the
        per-row max aggregation, never join-exchange the corpus."""
        rows = [(i, [float(i % 7), 1.0, 0.0, 0.0]) for i in range(50)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        df = similarity.semantic_decontaminate(
            emb.where(F.col("vec_id") >= 5),
            emb.where(F.col("vec_id") < 5),
            0.5,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "SortMergeJoin" not in plan


class TestPrioritySample:
    def test_weight_bias_and_determinism(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        # heavy rows (weight 1000) vs light rows (weight 1): the k
        # sample must be dominated by heavy rows
        rows = [(i, 1000.0) for i in range(50)] + [
            (i, 1.0) for i in range(50, 100)
        ]
        df = spark.createDataFrame(rows, ["key", "w"])
        out = sampling.priority_sample(df, "key", "w", k=20).collect()
        assert len(out) == 20
        heavy = sum(1 for r in out if r["w"] == 1000.0)
        assert heavy >= 15
        # rerun + repartition => identical sample
        again = sampling.priority_sample(
            df.repartition(7), "key", "w", k=20
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_census_when_corpus_small(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        df = spark.createDataFrame(
            [(1, 5.0), (2, 1.0)], ["key", "w"]
        )
        out = sampling.priority_sample(df, "key", "w", k=10).collect()
        assert len(out) == 2
        # census: qhat is the raw weight
        assert {r["key"]: r["qhat"] for r in out} == {1: 5.0, 2: 1.0}

    def test_no_global_sort_in_plan(self, spark):
        from zikeiretsu_rs_spark.operators import sampling

        df = spark.createDataFrame(
            [(i, float(i % 9 + 1)) for i in range(100)], ["key", "w"]
        )
        plan = (
            sampling.priority_sample(df, "key", "w", k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        # the boundary is a broadcast scalar, not a global sort+window
        assert "Window" not in plan


class TestPrefixFilterRandomized:
    def test_batch_random_corpora_equal_exact(self, spark):
        """Three seeds x near-dup-heavy random corpora over a tiny
        vocabulary — prefix-filter output must equal the brute-force
        join on every one (completeness is a theorem; this hammers the
        Spark implementation of it, incl. hashed prefixes)."""
        import random

        for seed in (5, 17, 41):
            rng = random.Random(seed)
            vocab = [f"w{v}" for v in range(8)]
            base = [
                " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 10)))
                for _ in range(12)
            ]
            rows = []
            did = 0
            for text in base:
                rows.append((did, text)); did += 1
                if rng.random() < 0.5:  # planted near-dup
                    toks = text.split()
                    toks[rng.randrange(len(toks))] = rng.choice(vocab)
                    rows.append((did, " ".join(toks))); did += 1
            df = spark.createDataFrame(rows, ["doc_id", "text"])
            exact = sorted(map(tuple, dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", n=2, threshold=0.4).collect()))
            pf = sorted(map(tuple, dedup.prefix_filter_jaccard_pairs(
                df, "doc_id", "text", n=2, threshold=0.4).collect()))
            assert pf == exact, f"seed {seed}"
            assert len(exact) > 0, f"seed {seed}: corpus had no pairs"


class TestBpeBatched:
    """Batched BPE (top-B symbol-disjoint merges per round): B=1 must
    equal sequential BPE exactly; B>1 must equal a pure-Python
    reference that uses the same greedy disjoint selection; the batch
    apply must commute with sequential application (the disjointness
    theorem)."""

    @staticmethod
    def _ref_batched(texts, n_merges, batch_size, min_freq=2):
        import collections

        from zikeiretsu_rs_spark.operators.bpe import select_disjoint_pairs

        wf = collections.Counter(w for t in texts for w in t.lower().split())
        vocab = {w: list(w) + ["</w>"] for w in wf}
        rounds = []
        done = 0
        while done < n_merges:
            take = min(batch_size, n_merges - done)
            pc = collections.Counter()
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += wf[w]
            ranked = sorted(
                ((l, r, f) for (l, r), f in pc.items() if f >= min_freq),
                key=lambda x: (-x[2], x[0], x[1]),
            )
            sel = select_disjoint_pairs(ranked, take)
            if not sel:
                break
            rounds.append(sel)
            done += len(sel)
            mm = {(l, r): l + r for l, r, _ in sel}
            for w in vocab:
                s = vocab[w]
                res, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and (s[i], s[i + 1]) in mm:
                        res.append(mm[(s[i], s[i + 1])])
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                vocab[w] = res
        return rounds

    TEXTS = [
        "low lower lowest low low",
        "new newer newest new lower",
        "wide wider widest low new",
        "deep deeper deepest deep wide",
    ]

    def test_batch_size_1_equals_sequential(self, spark):
        from zikeiretsu_rs_spark.operators import bpe

        df = spark.createDataFrame(
            list(enumerate(self.TEXTS)), ["doc_id", "text"]
        )
        rounds = bpe.learn_merges_batched(
            df, "text", n_merges=10, batch_size=1
        )
        flat = [m for rnd in rounds for m in rnd]
        assert flat == bpe.learn_merges(df, "text", n_merges=10)

    def test_matches_reference_batched(self, spark):
        from zikeiretsu_rs_spark.operators import bpe

        df = spark.createDataFrame(
            list(enumerate(self.TEXTS)), ["doc_id", "text"]
        )
        for bs in (2, 4):
            got = bpe.learn_merges_batched(
                df, "text", n_merges=12, batch_size=bs
            )
            assert got == self._ref_batched(self.TEXTS, 12, bs)

    def test_randomized_reference_equivalence(self, spark):
        import random

        from zikeiretsu_rs_spark.operators import bpe

        rng = random.Random(11)
        for trial in range(3):
            texts = [
                " ".join(
                    "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
                    for _ in range(rng.randint(3, 10))
                )
                for _ in range(12)
            ]
            df = spark.createDataFrame(
                list(enumerate(texts)), ["doc_id", "text"]
            )
            bs = rng.choice([2, 3, 5])
            got = bpe.learn_merges_batched(
                df, "text", n_merges=9, batch_size=bs
            )
            assert got == self._ref_batched(texts, 9, bs), (trial, bs, texts)

    def test_selection_is_symbol_disjoint(self, spark):
        from zikeiretsu_rs_spark.operators import bpe

        df = spark.createDataFrame(
            list(enumerate(self.TEXTS)), ["doc_id", "text"]
        )
        for rnd in bpe.learn_merges_batched(df, "text", n_merges=12, batch_size=4):
            syms = [s for l, r, _ in rnd for s in (l, r)]
            assert len(syms) == len(set(syms))

    def test_starved_pool_refills_to_full_greedy(self, spark):
        """ADVICE r04: a candidate_pool too small for the batch must
        REFILL, not silently select fewer/different pairs — the result
        is pool-size-independent (the reference here uses the full
        pair table). candidate_pool=2 with batch_size=4 forces a
        refill in every round of this corpus; the hypothesis twin
        (test_properties_prefix_mg.py) proves the rule over random
        corpora."""
        from zikeiretsu_rs_spark.operators import bpe

        df = spark.createDataFrame(
            list(enumerate(self.TEXTS)), ["doc_id", "text"]
        )
        got = bpe.learn_merges_batched(
            df, "text", n_merges=12, batch_size=4, candidate_pool=2
        )
        assert got == self._ref_batched(self.TEXTS, 12, 4)

    def test_batch_apply_commutes_with_sequential(self, spark):
        """The disjointness theorem: one batched scan == applying the
        same merges one at a time, in ANY order."""
        from zikeiretsu_rs_spark.operators import bpe

        df = spark.createDataFrame(
            list(enumerate(self.TEXTS)), ["doc_id", "text"]
        )
        vocab = bpe._initial_symbols(bpe.word_freqs(df, "text"))
        pairs = [("l", "o"), ("e", "r"), ("w", "i")]  # symbol-disjoint
        batched = {
            r["word"]: list(r["syms"])
            for r in bpe._batch_merge_pass(vocab, pairs).collect()
        }
        for order in (pairs, pairs[::-1], [pairs[1], pairs[2], pairs[0]]):
            v = vocab
            for left, right in order:
                v = bpe._merge_pass(v, left, right)
            seq = {r["word"]: list(r["syms"]) for r in v.collect()}
            assert seq == batched

    def test_fewer_driver_rounds(self, spark):
        from zikeiretsu_rs_spark.operators import bpe

        df = spark.createDataFrame(
            list(enumerate(self.TEXTS)), ["doc_id", "text"]
        )
        rounds = bpe.learn_merges_batched(df, "text", n_merges=12, batch_size=6)
        total = sum(len(r) for r in rounds)
        assert total == 12  # corpus supports the full merge budget
        # strictly fewer driver rounds than sequential BPE's 12 (the
        # whole point); disjointness may keep rounds under batch_size
        assert len(rounds) < total
        assert max(len(r) for r in rounds) > 1


class TestIncrementalDedup:
    """Snapshot-incremental dedup semantics: old docs immutable, new
    docs dropped by the pairwise-to-earlier rule — including the
    larger-id-corpus-doc quadrant and the bridge case."""

    def test_all_quadrants_and_bridge(self, spark):
        from zikeiretsu_rs_spark.operators import dedup

        base = "alpha beta gamma delta epsilon zeta"
        other = "one two three four five six"
        rows = [
            # old corpus
            (1, base, False),
            (10, other, False),
            # new: dup of SMALLER-id old doc -> dropped by 1
            (12, base, True),
            # new: dup of LARGER-id old doc -> dropped by 10
            (5, other, True),
            # new pair: only each other -> 3 kept, 7 dropped by 3
            (3, "seven eight nine ten eleven twelve", True),
            (7, "seven eight nine ten eleven twelve", True),
            # new bridge: dup of BOTH old docs -> dropped; olds never
            # emitted (old docs are not in the output at all)
            (15, base + " " + other, False),  # actually old bridge case below
            (16, base, True),
            # unique new -> kept
            (20, "unique words only here nothing shared", True),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "is_new"])
        out = {
            r["doc_id"]: (r["is_kept"], r["dup_of"])
            for r in dedup.incremental_dedup(
                df, "doc_id", "text", "is_new", n=3, threshold=0.5
            ).collect()
        }
        # only NEW docs appear
        assert set(out) == {12, 5, 3, 7, 16, 20}
        assert out[12] == (False, 1)
        assert out[5] == (False, 10)  # larger-id old dropped it? no:
        # (5 new, 10 old): pair (5,10) has id_a=5 new, id_b=10 old ->
        # victim 5, cause 10
        assert out[3] == (True, None)
        assert out[7] == (False, 3)
        assert out[20] == (True, None)
        # 16 duplicates old doc 1 AND new doc 12; smallest cause wins
        assert out[16] == (False, 1)

    def test_old_docs_never_dropped_on_bridge(self, spark):
        from zikeiretsu_rs_spark.operators import dedup

        a = "red orange yellow green blue indigo"
        b = "violet black white brown pink grey"
        rows = [
            (1, a, False),
            (2, b, False),
            # new doc half-overlapping BOTH old docs (bridge): with
            # 3-gram shingles and threshold 0.30 it pairs with both
            (9, a + " " + b, True),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "is_new"])
        out = dedup.incremental_dedup(
            df, "doc_id", "text", "is_new", n=3, threshold=0.30
        ).collect()
        assert len(out) == 1  # only the new doc is ever a candidate
        assert out[0]["doc_id"] == 9
        assert not out[0]["is_kept"] and out[0]["dup_of"] == 1


class TestRankedPrefixesSkewSafe:
    def test_skew_safe_formulation_identical(self, spark):
        """ranked_prefixes(skew_safe=True) swaps the shingle-keyed
        window for a map-side-combined groupBy + AQE-splittable
        join-back; the ranked prefix set (and hence every downstream
        candidate/verdict) must be IDENTICAL — only the physical
        skew ceiling differs."""
        from pyspark.sql import functions as F

        from zikeiretsu_rs_spark.operators import dedup

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        # add a boilerplate stop-phrase to most docs (the hot-shingle
        # case the flag exists for)
        phrase = " ".join(f"zz{i}" for i in range(10))
        skewed = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 != 0,
                F.concat_ws(" ", F.col("text"), F.lit(phrase)),
            ).otherwise(F.col("text")),
        )
        a = sorted(
            map(
                tuple,
                dedup.ranked_prefixes(
                    skewed, "doc_id", "text", 3, 0.5, hash_shingles=True
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                dedup.ranked_prefixes(
                    skewed, "doc_id", "text", 3, 0.5,
                    hash_shingles=True, skew_safe=True,
                ).collect(),
            )
        )
        assert a == b and len(a) > 0
        # and the skew-safe plan really has no shingle-keyed window
        df_safe = dedup.ranked_prefixes(
            skewed, "doc_id", "text", 3, 0.5,
            hash_shingles=True, skew_safe=True,
        )
        plan = df_safe._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        import re

        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "shingle" not in m.group(1).split(",")[0], plan


class TestIncrementalDedupRandomized:
    def test_random_corpora_match_brute_rule(self, spark):
        """Three seeds x near-dup-heavy random corpora: the
        incremental verdicts (prefix-filter candidates) must equal a
        brute-force application of the pairwise-to-earlier rule over
        the EXACT pair graph — the randomized twin of the driver's
        DuckDB oracle, aimed at threshold-boundary pairs the fixture
        corpus lacks (the ADVICE r05 failure mode of the old banded
        path)."""
        import random

        for seed in (7, 23, 59):
            rng = random.Random(seed)
            vocab = [f"w{v}" for v in range(8)]
            rows = []
            did = 0
            for _ in range(12):
                text = " ".join(
                    rng.choice(vocab) for _ in range(rng.randint(4, 10))
                )
                rows.append((did, text, rng.random() < 0.5)); did += 1
                if rng.random() < 0.5:
                    toks = text.split()
                    toks[rng.randrange(len(toks))] = rng.choice(vocab)
                    rows.append(
                        (did, " ".join(toks), rng.random() < 0.5)
                    ); did += 1
            df = spark.createDataFrame(rows, ["doc_id", "text", "is_new"])
            got = {
                (r["doc_id"], r["is_kept"], r["dup_of"])
                for r in dedup.incremental_dedup(
                    df, "doc_id", "text", "is_new", n=2, threshold=0.4
                ).collect()
            }
            # brute rule over the exact pair graph
            pairs = dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", n=2, threshold=0.4
            ).collect()
            newness = {r[0]: r[2] for r in rows}
            cause: dict[int, int] = {}
            for p in pairs:
                a, b = p["id_a"], p["id_b"]
                na, nb = newness[a], newness[b]
                if not (na or nb):
                    continue
                victim, c = (a, b) if (na and not nb) else (b, a)
                cause[victim] = min(cause.get(victim, c), c)
            want = {
                (i, i not in cause, cause.get(i))
                for i, _, is_new in rows
                if is_new
            }
            assert got == want, f"seed {seed}"
            assert any(not k for _, k, _ in want), f"seed {seed}: no drops"


class TestSignatureScoredLake:
    """Round 8: the lake prefix index stores per-doc hashed-shingle
    signature arrays, and the probe scores from THEM — no corpus text
    is re-shingled. Verdicts must stay row-identical to the in-memory
    string-scored path, and a pre-sigs index (meta without `sigs`)
    must fall back to text scoring with the same result."""

    def _random_docs(self, spark, seed):
        import random

        rng = random.Random(seed)
        vocab = [f"w{v}" for v in range(8)]
        rows = []
        did = 0
        for _ in range(14):
            text = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(4, 10))
            )
            rows.append((did, text, rng.random() < 0.5)); did += 1
            if rng.random() < 0.5:
                toks = text.split()
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
                rows.append((did, " ".join(toks), rng.random() < 0.5))
                did += 1
        return spark.createDataFrame(rows, ["doc_id", "text", "is_new"])

    def test_sigs_and_legacy_match_memory(self, spark, tmp_path):
        from zikeiretsu_rs_spark.catalog import fsio

        for seed in (11, 47):
            df = self._random_docs(spark, seed)
            corpus = df.where(~F.col("is_new")).select("doc_id", "text")
            path = str(tmp_path / f"idx_{seed}")
            dedup.write_prefix_index(
                corpus, path, "doc_id", "text", n=2, threshold=0.4
            )
            mem = sorted(map(tuple, dedup.incremental_dedup(
                df, "doc_id", "text", "is_new", n=2, threshold=0.4
            ).collect()))
            lake = sorted(map(tuple, dedup.incremental_dedup_lake(
                spark, path, df, "doc_id", "text", "is_new", 2, 0.4
            ).collect()))
            assert lake == mem, f"seed {seed} (sigs)"
            # strip the sigs marker -> legacy text-scored fallback
            meta_p = fsio.join(path, "index_meta.json")
            meta = fsio.read_json(meta_p)
            meta.pop("sigs")
            fsio.write_json_atomic(meta_p, meta)
            legacy = sorted(map(tuple, dedup.incremental_dedup_lake(
                spark, path, df, "doc_id", "text", "is_new", 2, 0.4
            ).collect()))
            assert legacy == mem, f"seed {seed} (legacy)"

    def test_scorer_keep_cols_passthrough(self, spark):
        """keep_cols must ride through BOTH scorer formulations
        unchanged, including unmatched/no-shingle pairs (left-join +
        fill contract)."""
        docs = spark.createDataFrame(
            [
                (1, "a b c d e"),
                (2, "a b c d f"),
                (3, "zz"),  # no 2-shingles
                (4, "q r s t u"),
            ],
            ["doc_id", "text"],
        )
        pairs = spark.createDataFrame(
            [(1, 2, "x"), (1, 3, "y"), (1, 4, "z")],
            ["id_a", "id_b", "tag"],
        )
        for dense in (True, False):
            got = {
                (r["id_a"], r["id_b"], r["tag"], r["jaccard"])
                for r in dedup.exact_jaccard_for_pairs(
                    docs, pairs, "doc_id", "text", n=2,
                    dense=dense, keep_cols=("tag",),
                ).collect()
            }
            assert {(a, b, t) for a, b, t, _ in got} == {
                (1, 2, "x"), (1, 3, "y"), (1, 4, "z")
            }, (dense, got)
            j = {(a, b): v for a, b, _, v in got}
            assert j[(1, 3)] == 0.0 and j[(1, 4)] == 0.0, (dense, got)
            assert j[(1, 2)] == round(3 / 5, 6), (dense, got)

    def test_doc_signatures_match_word_shingles(self, spark):
        """doc_signatures is the collect_list of the hashed distinct
        shingles — sizes and membership must agree with word_shingles
        exactly (the property the stored-scoring equivalence rides
        on)."""
        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b a b a b"), (3, "x")],
            ["doc_id", "text"],
        )
        sigs = {
            r["doc_id"]: sorted(r["_set"])
            for r in dedup.doc_signatures(
                docs, "doc_id", "text", n=2
            ).collect()
        }
        sh = (
            dedup.word_shingles(docs, "doc_id", "text", 2)
            .select("doc_id", F.xxhash64("shingle").alias("h"))
            .collect()
        )
        want: dict[int, list[int]] = {}
        for r in sh:
            want.setdefault(r["doc_id"], []).append(r["h"])
        assert sigs == {k: sorted(v) for k, v in want.items()}
        assert 3 not in sigs  # no shingles -> no signature row


class TestResidualKmeansCodebook:
    """pq_codebook_residual_kmeans — the LEARNED residual codebook
    (VERDICT r06 item 5): distributed Lloyd over the residual corpus
    instead of hash-sample seeding. bench.py's ann section records
    the sf0.1 recall lift (0.55 seeded -> 0.60 learned)."""

    def _clustered(self, spark, n=60, dim=8, n_cells=3):
        import random

        rng = random.Random(41)
        cents = [
            [8.0 * (i == j % n_cells) for i in range(n_cells)]
            + [0.0] * (dim - n_cells)
            for j in range(n_cells)
        ]
        rows = []
        for i in range(n):
            c = cents[i % n_cells]
            rows.append(
                (i, [c[j] + 0.3 * rng.uniform(-1, 1) for j in range(dim)])
            )
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        return emb, cents

    def test_deterministic_for_fixed_seed(self, spark):
        emb, cents = self._clustered(spark)
        b1 = similarity.pq_codebook_residual_kmeans(
            emb, cents, m=2, ksub=4, max_iter=5, seed=7
        )
        b2 = similarity.pq_codebook_residual_kmeans(
            emb, cents, m=2, ksub=4, max_iter=5, seed=7
        )
        assert b1 == b2
        # shape contract: m subspaces x ksub centroids x dsub floats
        assert len(b1) == 2 and all(len(sub) == 4 for sub in b1)
        assert all(len(c) == 4 for sub in b1 for c in sub)

    def test_learned_beats_seeded_on_quantization_error(self, spark):
        """The property Lloyd actually optimizes, so it holds at any
        scale (recall@k on a 80-point toy corpus is sampling noise —
        the sf0.1 recall lift is recorded by bench.py's ann section):
        the learned book's residual quantization MSE over the corpus
        must be <= the hash-seeded book's, and the learned pipeline
        must still clear an absolute recall floor end-to-end."""
        import numpy as np

        emb, cents = self._clustered(spark, n=80)
        cmat = np.array(cents)
        vecs = np.array(
            [r["embedding"] for r in emb.orderBy("vec_id").collect()]
        )
        res = vecs - cmat[np.argmax(vecs @ cmat.T, axis=1)]

        def mse(book):
            dsub = res.shape[1] // len(book)
            total = 0.0
            for j, sub in enumerate(book):
                r = res[:, j * dsub : (j + 1) * dsub]
                c = np.array(sub)
                d2 = ((r[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                total += d2.min(axis=1).sum()
            return total / len(res)

        seeded_book = similarity.pq_codebook_residual(
            emb, cents, m=2, ksub=8, n_train=16
        )
        learned_book = similarity.pq_codebook_residual_kmeans(
            emb, cents, m=2, ksub=8, max_iter=10, seed=7
        )
        assert mse(learned_book) <= mse(seeded_book), (
            mse(learned_book),
            mse(seeded_book),
        )

        queries = emb.where(F.col("vec_id") < 5)
        exact = similarity.cosine_topk(emb, queries, k=5)
        approx = similarity.ivfpq_residual_topk(
            emb, queries, learned_book, k=5, n_cells=3, nprobe=2,
            centroids=cents,
        )
        recall = approx.join(
            exact, ["query_id", "neighbor_id"], "left_semi"
        ).count() / exact.count()
        assert recall >= 0.4, recall


class TestIvfadcRefined:
    """ivfadc_topk_refined (round 8) — IVFADC+R: residual-ADC
    proposals exactly re-scored from the float column. The bench ann
    section records the sf0.1 lift (0.60 ADC-only -> 0.97 refined)."""

    def _fixture(self, spark):
        emb, cents = TestResidualKmeansCodebook()._clustered(spark, n=60)
        book = similarity.pq_codebook_residual(
            emb, cents, m=2, ksub=8, n_train=16
        )
        queries = emb.where(F.col("vec_id") < 5)
        return emb, cents, book, queries

    def test_scores_exact_and_recall_dominates_adc(self, spark):
        """Returned cosines must equal the brute-force cosine for the
        same pairs (the refinement reads true floats), and recall@k
        must be >= the unrefined ADC path's under identical
        (book, cells, probes)."""
        emb, cents, book, queries = self._fixture(spark)
        exact = similarity.cosine_topk(emb, queries, k=5)
        adc = similarity.ivfpq_residual_topk(
            emb, queries, book, k=5, n_cells=3, nprobe=2, centroids=cents
        )
        ref = similarity.ivfadc_topk_refined(
            emb, queries, book, k=5, expand=4, n_cells=3, nprobe=2,
            centroids=cents,
        )
        brute = {
            (r["query_id"], r["neighbor_id"]): r["cosine"]
            for r in similarity.cosine_topk(
                emb, queries, k=60
            ).collect()
        }
        for r in ref.collect():
            key = (r["query_id"], r["neighbor_id"])
            assert key in brute and r["cosine"] == brute[key], r
        n_exact = exact.count()
        rec_adc = adc.join(
            exact, ["query_id", "neighbor_id"], "left_semi"
        ).count() / n_exact
        rec_ref = ref.join(
            exact, ["query_id", "neighbor_id"], "left_semi"
        ).count() / n_exact
        assert rec_ref >= rec_adc, (rec_ref, rec_adc)
        assert rec_ref >= 0.6, rec_ref

    def test_join_path_parity(self, spark):
        """join_path=True (corpus-scale-query proposal via
        ivfadc_topk_join) must return the identical refined rows —
        the proposal twins are row-identical by the existing parity
        gate, and the exact re-score is deterministic."""
        emb, cents, book, queries = self._fixture(spark)
        a = similarity.ivfadc_topk_refined(
            emb, queries, book, k=5, expand=3, n_cells=3, nprobe=2,
            centroids=cents, join_path=False,
        )
        b = similarity.ivfadc_topk_refined(
            emb, queries, book, k=5, expand=3, n_cells=3, nprobe=2,
            centroids=cents, join_path=True,
        )
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )


class TestScorerFormulationsAgree:
    def test_dense_and_sparse_jaccard_scorers_identical(self, spark):
        """The two exact_jaccard_for_pairs formulations (signature
        arrays vs pair-per-shared-shingle row join) are a performance
        choice keyed on candidate density — their outputs must be
        row-identical, including no-shingle docs and unmatched
        pairs."""
        rows = [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "totally different words here now"),
            (4, "xy"),  # shorter than n words: no shingles at all
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (3, 4)], ["id_a", "id_b"]
        )
        for thr in (None, 0.3):
            a = sorted(map(tuple, dedup.exact_jaccard_for_pairs(
                df, pairs, "doc_id", "text", n=3, threshold=thr,
                dense=True,
            ).collect()))
            b = sorted(map(tuple, dedup.exact_jaccard_for_pairs(
                df, pairs, "doc_id", "text", n=3, threshold=thr,
                dense=False,
            ).collect()))
            assert a == b, (thr, a, b)
            assert len(a) == (4 if thr is None else 1)
