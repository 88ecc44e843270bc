"""JSONL document source: PERMISSIVE parse, corrupt-line quarantine,
lineage columns — the training-corpus ingest contract."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from mergermetrics_lakehouse_pipeline_spark.sources.jsonl import (
    read_jsonl,
    split_corrupt,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "hallo welt", "lang": "de"}',
    "this line is not json at all {{{",
    '{"doc_id": 4, "text": "bonjour", "lang": "fr"}',
    '{"doc_id": "not-a-number", "text": "bad type", "lang": "en"}',
]


def test_jsonl_parse_quarantine_and_lineage(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    df = read_jsonl(spark, str(p), SCHEMA)
    clean, bad = split_corrupt(df)
    got = {r.doc_id: (r.text, r.lang) for r in clean.collect()}
    assert got == {
        1: ("hello world", "en"),
        2: ("hallo welt", "de"),
        4: ("bonjour", "fr"),
    }
    bad_rows = bad.collect()
    assert len(bad_rows) == 2  # garbage line + type-mismatch line
    raws = {r._corrupt_record for r in bad_rows}
    assert any("not json at all" in r for r in raws)
    assert any("not-a-number" in r for r in raws)
    # lineage present on both sides
    for r in bad_rows + clean.collect():
        assert r.file_name == "corpus.jsonl"
        assert r.file_size > 0
        assert r.read_timestamp is not None


def test_jsonl_feeds_corpus_operators(spark, tmp_path):
    """The JSONL path composes with the hygiene operators — schema-typed
    text flows straight into tokenize/chunk."""
    from mergermetrics_lakehouse_pipeline_spark.operators.corpus import chunk_tokens

    p = tmp_path / "docs.jsonl"
    p.write_text(
        "\n".join(
            '{"doc_id": %d, "text": "%s", "lang": "en"}' % (i, "tok " * 10)
            for i in range(8)
        )
    )
    clean, _ = split_corrupt(read_jsonl(spark, str(p), SCHEMA))
    chunks = chunk_tokens(clean, "text", "doc_id", chunk_size=4, stride=4)
    assert chunks.count() == 8 * 3  # 10 tokens + trailing space -> 3 windows of 4
