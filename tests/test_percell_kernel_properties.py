"""Property tests for the single-site per-cell math
(`_cells_and_residuals`, `_percell_code_kernel` — round 10's review
collapsed the hand-synced copies into these) plus the probe-cell
agreement the bench layout bytes rows rely on.

Pure numpy (no SparkSession) except the final agreement pin, so the
properties run wide and fast under hypothesis.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zikeiretsu_rs_spark.operators.similarity import (
    _cells_and_residuals,
    _percell_code_kernel,
)

SF_DIR = "/root/testdata/sf0.001"


def _rng_case(seed, n_max=24, m_max=4, ksub_max=8, dsub_max=5):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, n_max))
    m = int(rng.integers(1, m_max))
    ksub = int(rng.integers(1, ksub_max))
    dsub = int(rng.integers(1, dsub_max))
    sub = rng.normal(size=(n, m, dsub))
    book = rng.normal(size=(m, ksub, dsub))
    return sub, book


class TestPercellCodeKernel:
    @settings(max_examples=80, deadline=None)
    @given(st.integers(0, 2**32 - 1))
    def test_codes_are_true_nearest_subcentroids(self, seed):
        """codes[i, j] is the argmin-by-squared-distance sub-centroid,
        ties to the LOWEST index — the exact semantics the zero-book
        padding contract depends on."""
        sub, book = _rng_case(seed)
        codes = _percell_code_kernel(sub, book)
        n, m, _ = sub.shape
        assert codes.shape == (n, m) and codes.dtype == np.int32
        for i in range(n):
            for j in range(m):
                d2 = ((book[j] - sub[i, j]) ** 2).sum(axis=1)
                # kernel computes p_sq - 2*dots (drops the constant
                # |sub|^2 term); argmin must agree with the true
                # squared distance, ties to lowest
                assert int(codes[i, j]) == int(np.argmin(d2))

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 2**32 - 1))
    def test_zero_book_yields_code_zero(self, seed):
        sub, book = _rng_case(seed)
        codes = _percell_code_kernel(sub, np.zeros_like(book))
        assert (codes == 0).all()

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 2**32 - 1))
    def test_cyclic_padding_never_wins(self, seed):
        """`pq_codebook_residual_percell` pads a small cell's book by
        cycling its kk real centroids up to ksub; because argmin ties
        break low, a padded duplicate must never be selected — the
        property that makes padding encoding-neutral."""
        sub, book = _rng_case(seed)
        m, ksub, dsub = book.shape
        kk = max(1, ksub // 2)
        reps = -(-ksub // kk)
        padded = np.stack(
            [np.tile(book[j, :kk], (reps, 1))[:ksub] for j in range(m)]
        )
        codes = _percell_code_kernel(sub, padded)
        assert (codes < kk).all()
        trimmed = _percell_code_kernel(sub, padded[:, :kk])
        assert (codes == trimmed).all()


class TestCellsAndResiduals:
    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, 2**32 - 1))
    def test_assignment_and_exact_reconstruction(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 32))
        n_cells = int(rng.integers(1, 9))
        dim = int(rng.integers(1, 17))
        vecs = rng.normal(size=(n, dim))
        cmat = rng.normal(size=(n_cells, dim))
        cells, res = _cells_and_residuals(vecs, cmat)
        # raw-dot argmax assignment, ties to lowest (argmax semantics)
        expect = np.argmax(vecs @ cmat.T, axis=1)
        assert (cells == expect).all()
        # the residual is exactly vec - centroid[cell] (definition
        # parity — guards the single-site helper against drift) ...
        assert np.array_equal(res, vecs - cmat[cells])
        # ... and reconstructs the input to float64 rounding ((a-b)+b
        # is NOT bit-exact in IEEE754; one ulp of the larger operand)
        assert np.allclose(res + cmat[cells], vecs, rtol=0, atol=1e-12)


class TestProbeCellAgreement:
    def test_layout_bytes_rows_count_the_probed_cells(self, spark):
        """bench.py's `layout_percell_books_bytes_nprobe*` rows size
        the probed cells via `ivf_probe_cells` (expression path)
        while the percell lake probe selects cells via
        `assign_probe_cells_arrow` (Arrow path). Their tie orders
        differ in principle (array_sort-reverse breaks score ties to
        the HIGHEST cell, stable argsort to the LOWEST), but on
        non-degenerate float scores ties do not occur — this pins
        that the two implementations select the SAME cell set on the
        real fixture, which is exactly what makes the bytes rows an
        honest measure of what the probe reads."""
        from pyspark.sql import functions as F

        from zikeiretsu_rs_spark.operators import similarity

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        cents = similarity.head_centroids(emb, 8, "vec_id", "embedding")
        queries = emb.where(F.col("vec_id") < 5)
        for nprobe in (1, 3, 8):
            expr_cells = set(
                similarity.ivf_probe_cells(queries, cents, nprobe=nprobe)
            )
            arrow_cells = {
                int(r["cell"])
                for r in similarity.assign_probe_cells_arrow(
                    queries, cents, nprobe, "vec_id", "embedding"
                )
                .select("cell")
                .distinct()
                .collect()
            }
            assert expr_cells == arrow_cells, nprobe
