"""Unit pins for streaming/ledger.py's checkpoint canonicalization
fallback (no real SparkSession needed).

Round 13 narrowed the fallback from a blanket except to the no-JVM
case; round 14 (judged ADVICE r13 low) narrows it further: the r13
pin caught the Py4JError BASE class, whose subclass Py4JJavaError is
a live JVM reporting a REAL Java-side failure (e.g. an invalid Hadoop
Path) — so a genuine Hadoop error still silently fell back to local
normalization, re-opening the same-checkpoint-canonicalized-
differently divergence. Only AttributeError (no py4j surface at all)
and Py4JNetworkError (dead transport) mean "no JVM"; everything else
propagates.
"""

import os

import pytest

from zikeiretsu_rs_spark.streaming import ledger


class _NoJvmSpark:
    """A session whose _jvm access dies like a mock with no JVM."""

    @property
    def _jvm(self):
        raise AttributeError("no JVM surface")


class _RaisingJvmSpark:
    """A session whose Hadoop Path constructor raises `exc`."""

    def __init__(self, exc):
        self._exc = exc

    @property
    def _jvm(self):
        outer = self

        class _Path:
            def __call__(self, *a):
                raise outer._exc

        class _Node:
            def __getattr__(self, _):
                return self

            Path = _Path()

        return _Node()


class TestCanonicalCheckpointUri:
    def test_none_and_empty_raise_with_cause(self):
        for bad in (None, ""):
            with pytest.raises(ValueError, match="non-empty string"):
                ledger.canonical_checkpoint_uri(_NoJvmSpark(), bad)

    def test_no_jvm_falls_back_to_local_normalization(self):
        got = ledger.canonical_checkpoint_uri(_NoJvmSpark(), "rel/ckpt")
        assert got == "file://" + os.path.abspath("rel/ckpt")
        # an already-URI checkpoint passes through untouched
        assert (
            ledger.canonical_checkpoint_uri(
                _NoJvmSpark(), "s3://bkt/ckpt"
            )
            == "s3://bkt/ckpt"
        )

    def test_network_error_falls_back(self):
        from py4j.protocol import Py4JNetworkError

        got = ledger.canonical_checkpoint_uri(
            _RaisingJvmSpark(Py4JNetworkError("gateway down")), "/tmp/c"
        )
        assert got == "file:///tmp/c"

    def test_java_side_error_propagates(self):
        """The round-14 pin: a Py4JError subclass that is NOT a
        transport failure is a real JVM-side error — it must
        propagate, never silently canonicalize differently."""
        from py4j.protocol import Py4JError

        class FakeJavaError(Py4JError):
            pass

        with pytest.raises(FakeJavaError):
            ledger.canonical_checkpoint_uri(
                _RaisingJvmSpark(FakeJavaError("bad Path")), "/tmp/c"
            )
