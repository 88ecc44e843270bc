"""Property-based checks (SURVEY §5.5) with hypothesis: the cleaning
layer's contract is *total tolerance* — arbitrary garbage yields NULL or
a sane value, never an exception — and the text kernels hold their
algebraic invariants.

Each example batch becomes ONE Spark job (hypothesis generates a list of
strings per example; examples are capped so the suite stays fast)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.functions.cleaning import (
    parse_date_multi,
    sanitize_price,
    strip_weekday_prefix,
    valid_numeric_or_sentinel,
)
from mergermetrics_lakehouse_pipeline_spark.functions.text import (
    fingerprint,
    token_count,
    word_shingles,
)
from mergermetrics_lakehouse_pipeline_spark.pipeline.fact import ORDER_DATE_FORMATS

SETTINGS = settings(max_examples=12, deadline=None)

# printable-ish garbage incl. date-like fragments and junk
garbage = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=40,
)


def _run(spark, values: list[str | None], col):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r.y for r in df.select(col.alias("y")).collect()]


@SETTINGS
@given(st.lists(garbage | st.none(), min_size=1, max_size=30))
def test_date_parser_total(spark, values):
    """parse_date_multi never throws; every output is a date or NULL."""
    out = _run(
        spark, values, parse_date_multi(strip_weekday_prefix(F.col("x")), ORDER_DATE_FORMATS)
    )
    assert all(v is None or isinstance(v, dt.date) for v in out)


def test_date_parser_accepts_all_observed_formats(spark):
    """Every format the reference's daily files use parses to the same day
    (parity: 1_full_load_fact.py:111-125)."""
    forms = [
        "Monday, December 01, 2025",
        "01-12-2025",
        "01/12/2025",
        "2025/12/01",
        "2025-12-01",
    ]
    out = _run(
        spark, forms, parse_date_multi(strip_weekday_prefix(F.col("x")), ORDER_DATE_FORMATS)
    )
    assert out == [dt.date(2025, 12, 1)] * len(forms)


@SETTINGS
@given(st.lists(garbage | st.none(), min_size=1, max_size=30))
def test_price_sanitizer_nonnegative(spark, values):
    """sanitize_price: every output is NULL or a non-negative rounded
    double (negatives folded to absolute, junk -> fallback)."""
    out = _run(spark, values, sanitize_price(F.col("x")))
    assert all(v is None or (isinstance(v, float) and v >= 0) for v in out)


@SETTINGS
@given(st.lists(garbage | st.none(), min_size=1, max_size=30))
def test_numeric_sentinel_total(spark, values):
    """valid_numeric_or_sentinel: output is always a numeric string."""
    out = _run(spark, values, valid_numeric_or_sentinel(F.col("x")))
    assert all(v is not None and v.isdigit() for v in out)


@SETTINGS
@given(st.lists(st.text(alphabet="ab cd", max_size=30), min_size=1, max_size=20))
def test_fingerprint_order_invariant(spark, values):
    """fingerprint(text) == fingerprint(reversed-word text): the bag-of-
    words key ignores order and repetition."""
    reversed_vals = [" ".join(reversed(v.split())) for v in values]
    a = _run(spark, values, fingerprint(F.col("x")))
    b = _run(spark, reversed_vals, fingerprint(F.col("x")))
    assert a == b


@SETTINGS
@given(st.lists(st.text(alphabet="xy z", max_size=40), min_size=1, max_size=20))
def test_shingle_count_bound(spark, values):
    """#distinct 3-shingles <= max(1, tokens-2); never zero/NULL."""
    df = spark.createDataFrame([(v,) for v in values], "x string")
    rows = df.select(
        token_count(F.col("x")).alias("n"),
        F.size(word_shingles(F.col("x"), 3)).alias("s"),
    ).collect()
    for r in rows:
        assert 1 <= r.s <= max(1, r.n - 2) if r.n >= 3 else r.s == 1


@SETTINGS
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("ab x"), max_size=60) | st.none(),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
)
def test_chunk_tokens_covers_every_token_exactly(spark, values, chunk_size, stride):
    """Chunking invariants for ANY text and any (chunk_size, stride)
    with stride <= chunk_size: chunks per doc = 1 + ceil((n-size)/stride),
    every chunk is non-empty, the first chunk starts at token 1, and the
    final chunk reaches the last token (no token ever dropped)."""
    import math

    from mergermetrics_lakehouse_pipeline_spark.functions.text import tokens
    from mergermetrics_lakehouse_pipeline_spark.operators.corpus import chunk_tokens

    stride = min(stride, chunk_size)  # overlapping-window regime
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "doc_id long, text string"
    )
    n_toks = {
        r.doc_id: r.n
        for r in df.select("doc_id", F.size(tokens("text")).alias("n")).collect()
    }
    out = chunk_tokens(
        df, "text", "doc_id", chunk_size=chunk_size, stride=stride
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, n in n_toks.items():
        if n is None or n <= 0:  # empty or NULL text (size(NULL) = -1)
            assert doc_id not in by_doc
            continue
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        expected = 1 + (0 if n <= chunk_size else math.ceil((n - chunk_size) / stride))
        assert len(chunks) == expected
        assert all(c.n_chunk_tokens >= 1 for c in chunks)
        last = chunks[-1]
        # final chunk reaches the last token
        assert last.chunk_id * stride + last.n_chunk_tokens == n
