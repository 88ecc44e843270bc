"""Property-based checks for the bloom-prefiltered semi join: for ANY
key universe and ANY (coarse) sizing, the composition must equal the
plain semi-join — the bloom is a cost knob, never a semantics knob."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from mergermetrics_lakehouse_pipeline_spark.operators.bloomjoin import (
    bloom_bitmap,
    bloom_prefilter,
    bloom_semi_join,
)

SETTINGS = settings(max_examples=10, deadline=None)

keys = st.lists(st.integers(min_value=-(2**31), max_value=2**31), max_size=40)


@SETTINGS
@given(probe_keys=keys, build_keys=keys, n_bits=st.sampled_from([64, 256, 4096]))
def test_bloom_semi_equals_plain_semi(spark, probe_keys, build_keys, n_bits):
    probe = spark.createDataFrame([(k,) for k in probe_keys] or [(None,)], "k bigint")
    build = spark.createDataFrame([(k,) for k in build_keys] or [(None,)], "k bigint")
    expected = sorted(
        r.k for r in probe.join(build, "k", "left_semi").collect() if r.k is not None
    )
    got = sorted(r.k for r in bloom_semi_join(probe, build, "k", n_bits=n_bits).collect())
    assert got == expected


@SETTINGS
@given(probe_keys=keys, build_keys=keys)
def test_prefilter_superset_of_members(spark, probe_keys, build_keys):
    probe = spark.createDataFrame([(k,) for k in probe_keys] or [(None,)], "k bigint")
    build = spark.createDataFrame([(k,) for k in build_keys] or [(None,)], "k bigint")
    bm = bloom_bitmap(build, "k", n_bits=128, n_hashes=2)
    kept = {r.k for r in bloom_prefilter(probe, "k", bm, n_bits=128, n_hashes=2).collect()}
    members = {
        r.k for r in probe.join(build, "k", "left_semi").collect() if r.k is not None
    }
    assert members <= kept
