"""Unit semantics for operators/corpus.py (chunking, keyword terms,
unigram familiarity, rebalancing) on hand-computable literal inputs —
the registry oracles cover the full-table parity, these pin the edge
cases the oracle tables may not contain."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators import corpus as cp


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_tokens_windows_and_tail(spark):
    d = _docs(spark, [(1, "a b c d e f g h i j")])  # 10 tokens
    out = cp.chunk_tokens(d, "text", "doc_id", chunk_size=4, stride=3)
    got = {r.chunk_id: (r.chunk_text, r.n_chunk_tokens) for r in out.collect()}
    # ceil((10-4)/3) = 2 -> chunks 0..2; last covers tokens 7..10
    assert got == {
        0: ("a b c d", 4),
        1: ("d e f g", 4),
        2: ("g h i j", 4),
    }


def test_chunk_tokens_short_and_empty_docs(spark):
    d = _docs(spark, [(1, "x y"), (2, "   "), (3, "")])
    out = cp.chunk_tokens(d, "text", "doc_id", chunk_size=4, stride=3).collect()
    # short doc -> exactly one (shorter) chunk; empty docs -> no chunks
    assert len(out) == 1
    assert out[0].doc_id == 1 and out[0].chunk_text == "x y"
    assert out[0].n_chunk_tokens == 2


def test_chunk_tokens_stride_boundary(spark):
    # n exactly size + k*stride: last window is full-size, no phantom chunk
    d = _docs(spark, [(1, " ".join(f"t{i}" for i in range(7)))])  # 7 = 4 + 3
    out = cp.chunk_tokens(d, "text", "doc_id", chunk_size=4, stride=3)
    rows = sorted(out.collect(), key=lambda r: r.chunk_id)
    assert [r.n_chunk_tokens for r in rows] == [4, 4]


def test_top_rarity_terms_ranking_and_ties(spark):
    d = _docs(
        spark,
        [
            (1, "rare common common"),
            (2, "common common common"),
            (3, "unique common zz"),
        ],
    )
    out = cp.top_rarity_terms(d, "text", "doc_id", k=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append((r.rnk, r.term, r.score))
    # doc 1: rare tf=1 df=1 -> 3.0 beats common tf=2 df=3 -> 2.0
    assert [t for _, t, _ in sorted(by_doc[1])] == ["rare", "common"]
    assert sorted(by_doc[1])[0][2] == 3.0
    # doc 3: unique and zz both score 1*3/1 = 3.0; the tie breaks on the
    # term string ascending -> 'unique' < 'zz'
    assert [t for _, t, _ in sorted(by_doc[3])] == ["unique", "zz"]


def test_unigram_familiarity_hand_computed(spark):
    d = _docs(spark, [(1, "a a b"), (2, "b c")])
    out = {r.doc_id: r for r in cp.unigram_familiarity(d, "text", "doc_id").collect()}
    # corpus: a->2, b->2, c->1, total=5
    # doc1: (2*2 + 1*2) / 5 / 3 = 6/15 = 0.4 ; doc2: (2+1)/5/2 = 0.3
    assert out[1].n_tokens == 3 and abs(out[1].familiarity - 0.4) < 1e-9
    assert out[2].n_tokens == 2 and abs(out[2].familiarity - 0.3) < 1e-9


def test_rebalance_sample_deterministic_and_rate_bounded(spark):
    d = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(400)],
        "doc_id long, lang string",
    )
    out1 = cp.rebalance_sample(d, "lang", "doc_id", rates={"en": 40})
    out2 = cp.rebalance_sample(d.repartition(13), "lang", "doc_id", rates={"en": 40})
    ids1 = sorted(r.doc_id for r in out1.collect())
    ids2 = sorted(r.doc_id for r in out2.collect())
    assert ids1 == ids2  # partitioning-independent
    kept = out1.groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in kept}
    assert by_lang["de"] == 200  # default rate keeps everything
    assert 50 <= by_lang["en"] <= 110  # ~40% of 200, hash-binomial slack
    assert out1.filter(F.col("bucket") >= F.col("keep_rate")).count() == 0


def test_pack_sequences_capacity_and_order(spark):
    from mergermetrics_lakehouse_pipeline_spark.operators.corpus import pack_sequences

    chunks = spark.createDataFrame(
        [(d, c, 40) for d in range(20) for c in range(3)],
        "doc_id long, chunk_id long, n_chunk_tokens long",
    )
    out = pack_sequences(
        chunks, "doc_id", "chunk_id", "n_chunk_tokens", capacity=100, n_buckets=2
    ).collect()
    assert len(out) == 60
    by_seq: dict[tuple, int] = {}
    for r in out:
        by_seq[(r.bucket, r.seq_id)] = by_seq.get((r.bucket, r.seq_id), 0) + r.n_chunk_tokens
    # every sequence holds at most capacity + one straddling chunk
    assert all(tot <= 100 + 40 for tot in by_seq.values())
    # all but each bucket's final sequence reach capacity (no underfill)
    for b in {r.bucket for r in out}:
        seqs = sorted(s for (bb, s) in by_seq if bb == b)
        for s in seqs[:-1]:
            assert by_seq[(b, s)] + 40 > 100  # adding one more chunk would overflow
    # deterministic under repartitioning
    out2 = pack_sequences(
        chunks.repartition(7), "doc_id", "chunk_id", "n_chunk_tokens",
        capacity=100, n_buckets=2,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_bm25_scores_and_ordering(spark):
    """BM25: a doc containing query terms outscores one with none
    (which scores exactly 0); output is descending and capped at k."""
    from mergermetrics_lakehouse_pipeline_spark.operators import corpus as cp

    docs = spark.createDataFrame(
        [
            (1, "spark query engine with window functions and a join"),
            (2, "completely unrelated text about gardening and soil"),
            (3, "spark spark spark query join window join window spark"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = cp.bm25_topk(docs, "text", "doc_id", ["spark", "query"], k=3).collect()
    assert len(out) == 3
    scores = {r.doc_id: r.bm25 for r in out}
    assert [r.bm25 for r in out] == sorted((r.bm25 for r in out), reverse=True)
    assert scores[3] > scores[1] > 0.0  # heavier tf wins; hits beat misses
    assert scores.get(2, 0.0) == 0.0 or 2 not in scores  # no-hit doc scores 0


def test_source_quota_cap_and_determinism(spark):
    """Quota sampling: never more than quota rows per source; identical
    selection under repartitioning (hash priority, not rand())."""
    from mergermetrics_lakehouse_pipeline_spark.operators import corpus as cp

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(100)], ["doc_id", "source"]
    )
    out = cp.source_quota_sample(docs, "source", "doc_id", quota=7)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
    ).collect()}
    assert all(n <= 7 for n in per.values()) and len(per) == 3
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in cp.source_quota_sample(
            docs.repartition(13), "source", "doc_id", quota=7
        ).collect()
    )
    assert a == b


def test_distributed_prefix_sum_matches_naive(spark):
    """Two-phase parallel scan == the naive global running sum, and the
    data-sized window in its plan is PARTITIONED (by bucket) — the
    single-reducer global window exists only over the tiny bucket-totals
    table."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mergermetrics_lakehouse_pipeline_spark.operators.corpus import (
        distributed_prefix_sum,
    )

    df = spark.range(1000).select(
        F.col("id").alias("k"), ((F.col("id") * 7919) % 101).alias("v")
    )
    got = {
        r.k: r.v_prefix
        for r in distributed_prefix_sum(df, "k", ["v"], bucket_size=37).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.p for r in df.select("k", F.sum("v").over(w).alias("p")).collect()}
    assert got == want

    out = distributed_prefix_sum(df, "k", ["v"], bucket_size=37)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # the window over DATA rows must carry the bucket partition key
    import re

    windows = re.findall(r"Window \[[^\]]*\], \[[^\]]*\]", plan)
    assert any("__bucket" in w_ for w_ in windows), windows


def test_bpe_merges_match_reference_algorithm(spark):
    """bpe_merges reproduces a hand-rolled Sennrich-style BPE trainer on
    a tiny corpus, including tie-breaks and greedy left-to-right
    application (the 'aaa' overlap case)."""
    from mergermetrics_lakehouse_pipeline_spark.operators.corpus import bpe_merges

    docs = ["low low low", "lower lower", "newest", "aaa aaa"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], ["doc_id", "text"])

    def py_bpe(corpus, n):
        from collections import Counter

        freq = Counter(w for line in corpus for w in line.split())
        vocab = {w: list(w) for w in freq}
        out = []
        for step in range(n):
            counts = Counter()
            for w, syms in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] += freq[w]
            if not counts:
                break
            # max count, ties to lexicographically smallest (l, r)
            (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((step, l, r, l + r, c))
            for w, syms in vocab.items():
                new, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        new.append(l + r)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                vocab[w] = new
        return out

    expected = py_bpe(docs, 5)
    got = [
        (m["step"], m["left_sym"], m["right_sym"], m["merged"], m["pair_count"])
        for m in bpe_merges(df, "text", n_merges=5)
    ]
    assert got == expected


def test_profile_table_preserves_all_null_columns(spark):
    """An entirely-NULL column must still get its stats row (null
    top_value) — the most broken column is what a profiler exists to
    surface."""
    from mergermetrics_lakehouse_pipeline_spark.operators.profiling import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "a int, b string"
    )
    out = profile_table(df, ["a", "b"], top_k=2).collect()
    b_rows = [r for r in out if r.column == "b"]
    assert len(b_rows) == 1
    r = b_rows[0]
    assert (r.n_rows, r.n_nulls, r.n_distinct) == (3, 3, 0)
    assert r.top_value is None and r.value_rank is None
    a_rows = [r for r in out if r.column == "a"]
    assert len(a_rows) == 2  # top-2 of three distinct values
