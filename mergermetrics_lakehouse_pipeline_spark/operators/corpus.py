"""Corpus-preparation operators a training-data pipeline runs after
cleaning/dedup: context-window chunking, per-document keyword (rarity)
terms, corpus-LM familiarity scoring, and deterministic per-group
rebalancing downsample.

Reference parity: the reference (a Databricks lakehouse ETL,
consolidated_pipeline/*.py) has no corpus ops — these extend the engine
toward the LLM-training-data surface the way SURVEY.md §7 prescribes:
pure DataFrame compositions (explode / groupBy / window / filter), no
Python UDFs, every intermediate shuffle keyed on something with bounded
cardinality per group.

Numeric discipline (oracle parity): every score is either integer
arithmetic (exact) or a fixed left-to-right chain of IEEE-double
divisions identical in Spark and DuckDB, rounded to 6 places at the
end. No transcendental functions (ln/exp differ in final ulps across
libm implementations), no order-dependent double summation — the only
SUMs are over BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx


def _hash_bucket(col: Column, *, salt: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 16 bits of
    md5(salt|key) mod buckets. Stable under re-runs and repartitioning
    (unlike rand()), portable to the SQL oracle."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), col.cast("string"))), 1, 4),
            16,
            10,
        ).cast("bigint")
        % buckets
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token windows (context-length
    fitting for model training): chunk ``c`` covers tokens
    ``[c*stride, c*stride + chunk_size)``; the last chunk may be shorter.
    Zero-token documents produce no chunks.

    Scale: one narrow projection + explode — no shuffle, no UDF; output
    rows ~ n_tokens/stride per doc, bounded per input row, so the explode
    cannot blow up a partition. At 100 TB this runs entirely map-side.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = tx.tokens(text_col)
    n = F.size("toks")
    # integer ceil((n - size) / stride); guarded CASE keeps operands
    # positive (Spark `div` truncates toward zero, DuckDB `//` floors —
    # they only agree on non-negative operands)
    last_chunk = F.when(n <= chunk_size, F.lit(0)).otherwise(
        ((n - chunk_size + stride - 1) / stride).cast("bigint")
    )
    start = F.col("chunk_id") * stride + 1
    return (
        df.select(F.col(id_col), toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            id_col,
            "toks",
            F.explode(F.sequence(F.lit(0).cast("bigint"), last_chunk)).alias(
                "chunk_id"
            ),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(F.slice("toks", start, F.lit(chunk_size)), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(chunk_size), n - F.col("chunk_id") * stride).alias(
                "n_chunk_tokens"
            ),
        )
    )


def boilerplate_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    df_frac: float = 0.1,
) -> DataFrame:
    """Per-document boilerplate share: a shingle occurring in at least
    ``df_frac`` of documents is boilerplate; report each doc's shingle
    count, boilerplate-shingle count, and fraction.

    Scale: occurrence semantics let the shingles ride the
    codegen-friendly regex pass (word_shingles_fast — no interpreted
    higher-order dedup); document frequency is one shuffled aggregation
    with map-side partial distinct; the corpus-relative threshold joins
    as a 1-row broadcast; the boilerplate set (high-df shingles are FEW
    by definition — df >= df_frac bounds it at shingles-per-doc/df_frac
    entries) broadcasts back onto the exploded corpus. No self-joins.
    """
    sh = df.select(
        id_col, F.explode(tx.word_shingles_fast(text_col, shingle_n)).alias("g")
    )
    df_counts = sh.groupBy("g").agg(F.countDistinct(id_col).alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    boiler = (
        df_counts.join(F.broadcast(n_docs), F.lit(True))
        .filter(F.col("df") >= df_frac * F.col("n_docs"))
        .select("g")
    )
    return (
        sh.join(F.broadcast(boiler).withColumn("__b", F.lit(1)), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.count("__b").cast("bigint").alias("n_boiler"),
            F.round(F.count("__b") / F.count("*"), 6).alias("boiler_frac"),
        )
    )


def top_rarity_terms(
    df: DataFrame, text_col: str, id_col: str, *, k: int = 3
) -> DataFrame:
    """Top-k most informative terms per document, scored by
    ``tf * N / df`` — the raw-inverse-document-frequency tf-idf variant,
    chosen over the log variant so the score is a single exact
    integer-product-then-one-division (bit-identical across engines).
    Ties break on the term string ascending.

    Scale: two hash aggregations (doc×term, then term) and one shuffle
    join keyed on term; the join input is the term-frequency table
    (|doc×distinct-term|), not the raw token stream. The corpus size N
    joins in as a broadcast 1-row aggregate, never a driver collect.
    The per-doc window partitions on the id — no global sort.
    """
    from pyspark.sql import Window

    tok = df.select(F.col(id_col), F.explode(tx.tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    score = F.col("tf") * F.col("n_docs") / F.col("df")
    w = Window.partitionBy(id_col).orderBy(score.desc(), F.col("term").asc())
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(score, 6).alias("score"),
            "rnk",
        )
    )


def unigram_familiarity(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Score each document by the mean corpus-frequency of its tokens —
    the cheapest possible 'train a unigram LM on the corpus, score every
    doc with it' quality signal (natural prose scores high, gibberish
    and boilerplate-with-rare-symbols score low).

    familiarity(d) = (1/n_d) * Σ_{t∈d} tf_t(d) · cnt(t) / total_tokens
    computed as exact BIGINT sums with two trailing double divisions in
    fixed order, so Spark and the SQL oracle agree bit-for-bit.

    Scale: the token stream collapses to (doc, term, tf) before any
    join; the corpus model is a second aggregation OF THE TF TABLE (one
    extra shuffle on term, input already deduped per doc). The hot
    `term` join inherits AQE skew splitting for head words.
    """
    tok = df.select(F.col(id_col), F.explode(tx.tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    model = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = tf.agg(F.sum("tf").alias("total_tokens"))
    per_doc = (
        tf.join(model, "term")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("tf") * F.col("cnt")).alias("sum_w"),
            F.sum("tf").alias("n_tokens"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        id_col,
        "n_tokens",
        F.round(
            F.col("sum_w") / F.col("total_tokens") / F.col("n_tokens"), 6
        ).alias("familiarity"),
    )


def rebalance_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    rates: dict[str, int],
    default_rate: int = 100,
    salt: str = "rebal",
    keep_all_columns: bool = False,
) -> DataFrame:
    """Deterministic per-group downsample: keep a row iff its hash bucket
    (md5-based, seeded by ``salt``) falls below the group's keep-rate
    percentage. The standard move for rebalancing over-represented
    languages/sources in a training mix — reproducible (same corpus →
    same sample, regardless of partitioning or cluster size), and a pure
    narrow filter: zero shuffles at any scale.
    """
    rate = F.lit(default_rate)
    for key, pct in sorted(rates.items()):
        rate = F.when(F.col(group_col) == key, F.lit(pct)).otherwise(rate)
    bucket = _hash_bucket(F.col(id_col), salt=salt)
    if keep_all_columns:
        return df.filter(bucket < rate)
    return (
        df.withColumn("bucket", bucket)
        .withColumn("keep_rate", rate)
        .filter(F.col("bucket") < F.col("keep_rate"))
        .select(id_col, group_col, "bucket", "keep_rate")
    )


def pack_sequences(
    chunks: DataFrame,
    id_col: str,
    chunk_id_col: str,
    len_col: str,
    *,
    capacity: int = 256,
    n_buckets: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Pack chunks into fixed-capacity training sequences, GPT-style:
    concatenate in deterministic order and cut every ``capacity`` tokens
    (a chunk never splits across sequences; a sequence may run slightly
    over when a chunk straddles the boundary — bounded by max chunk
    length, exactly like concat-and-split packing with document
    boundaries respected).

    The global-cumsum formulation would serialize on one reducer, so
    packing is bucketed: documents hash into ``n_buckets`` independent
    packers (deterministic md5 bucket), each packing its own ordered
    stream — at 100 TB you raise ``n_buckets`` to O(cluster cores) and
    every bucket packs in parallel; the only shuffle is the bucket hash.
    seq_id = (bucket, floor(exclusive-cumsum / capacity)) — pure window
    arithmetic, no iteration, identical in the SQL oracle.
    """
    from pyspark.sql import Window

    bucket = _hash_bucket(F.col(id_col), salt=salt, buckets=n_buckets)
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col, chunk_id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        chunks.withColumn("bucket", bucket)
        .withColumn(
            "cum_before", F.coalesce(F.sum(len_col).over(w), F.lit(0)).cast("bigint")
        )
        .withColumn(
            "seq_id", F.floor(F.col("cum_before") / F.lit(capacity)).cast("bigint")
        )
        .select(id_col, chunk_id_col, len_col, "bucket", "seq_id")
    )


def lexical_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    df_max: int = 20,
    top_k: int = 50,
) -> DataFrame:
    """Top-k most lexically similar document pairs by rarity-weighted
    shingle overlap — the sparse (inverted-index) similarity path, the
    lexical complement to the dense-embedding operators in
    operators/similarity.py.

    Score(a, b) = SUM over shared ``shingle_n``-word shingles s of
    ``N div df(s)`` (shingles are distinct per doc, so membership is
    0/1): an idf-weighted dot product with the raw-idf integer variant —
    every contribution is an exact BIGINT and the pair score an exact
    BIGINT sum (order-insensitive, bit-identical in the SQL oracle; no
    floats anywhere).

    Scale shape (the classic posting-list join, minus the join):

    - shingles with ``df = 1`` cannot pair, shingles with
      ``df > df_max`` are dropped — the stopword-pruning step every
      inverted-index similarity system applies. df_max is THE scale
      knob: it caps posting-list length, so pair expansion is
      <= df_max^2 rows per shingle, local to its bucket, never
      |corpus|^2.
    - pair generation reuses the aggregation idiom of
      minhash_lsh_candidates (operators/dedup.py:64): group postings by
      shingle, sorted ``collect_set`` of doc ids, array-side
      ordered-combination expansion. Because shingles are distinct per
      doc, ``df`` is just the posting-set size — so the inverted index,
      the df filter AND the idf weight come out of ONE aggregation: no
      postings-vs-df join (which would recompute the shingle explode on
      both sides), and the only shuffles are this aggregation plus the
      final pair aggregation.
    - corpus size N arrives as a broadcast 1-row aggregate.
    """
    post = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tx.word_shingles_fast(text_col, shingle_n)).alias("term"),
    )
    n_docs = df.agg(F.count("*").alias("n_docs"))
    posting = (
        post.groupBy("term")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .withColumn("df", F.size("ids").cast("bigint"))
        .filter((F.col("df") >= 2) & (F.col("df") <= df_max))
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rarity", F.expr("n_docs div df"))
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids")) - i - 1),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        posting.select(F.col("rarity"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(
            F.sum("rarity").alias("score"),
            F.count("*").alias("shared_shingles"),
        )
        .orderBy(F.col("score").desc(), "doc_a", "doc_b")
        .limit(top_k)
    )


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Lexical retrieval: top-``k`` documents for a fixed bag-of-words
    query under a rational-idf BM25 variant — the classic sparse
    retriever a training pipeline runs for benchmark decontamination
    lookups, counterfactual mining, or hybrid (lexical + vector) search
    next to the ANN operators.

    idf(t) = (N - df + 0.5) / (df + 0.5)   (log omitted: a monotone
    transform that changes no ranking *per term*, and keeping the score
    a pure rational expression makes it bit-reproducible across engines
    — libm log would not be)
    score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Scale: two scan passes — one aggregates the corpus stats (N, total
    tokens, per-term df) down to a SINGLE scalar row, the second scores
    every doc against that row broadcast back (the unavoidable shape of
    corpus-relative scoring without caching the corpus; same as the
    tf-idf operators). tf columns are JVM array filters, no token
    explode; the top-k is sort+limit (TakeOrderedAndProject — never a
    global sort). Query terms are the bounded side (a query has tens of
    terms, not millions).
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    toks = tx.tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).withColumn("dl", F.size("toks").cast("double"))
    for i, t in enumerate(query_terms):
        base = base.withColumn(
            f"tf{i}",
            F.size(F.filter("toks", lambda x: x == F.lit(t))).cast("double"),
        )
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).cast("double").alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats)).withColumn(
        "avgdl", F.col("sum_dl") / F.col("n_docs")
    )
    score = None
    for i in range(len(query_terms)):
        idf = (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5)) / (
            F.col(f"df{i}") + F.lit(0.5)
        )
        part = idf * (
            (F.col(f"tf{i}") * F.lit(k1 + 1.0))
            / (
                F.col(f"tf{i}")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl")))
            )
        )
        score = part if score is None else score + part
    return (
        scored.select(
            "doc_id",
            F.col("dl").cast("bigint").alias("dl"),
            F.round(score, 6).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


def source_quota_sample(
    docs: DataFrame,
    source_col: str,
    id_col: str,
    *,
    quota: int,
) -> DataFrame:
    """Per-source document cap — corpus curation's anti-domination rule
    (no single crawl/domain may exceed ``quota`` docs in the mix).
    Priority is the md5 of the doc id: uniform, reproducible under
    re-runs/repartitioning, and uncorrelated with content or the other
    sampling hashes (different field, no salt collision).

    Scale: one window per source partition (row_number over the hash) —
    a single shuffle on the source key; skewed sources are bounded by
    the quota on output and AQE skew handling on input."""
    from pyspark.sql import Window

    renamed = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    ).withColumn("priority", F.md5(F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy("priority", "doc_id")
    return renamed.withColumn(
        "quota_rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("quota_rank") <= quota)


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    *,
    bucket_size: int = 4096,
) -> DataFrame:
    """Exact running (prefix) sums over a global order WITHOUT a global
    single-reducer window — the two-phase parallel-scan:

    1. bucket rows by ``order_col div bucket_size``; the within-bucket
       running sum is a window over BOUNDED partitions (bucket_size
       rows), so every reducer does O(bucket) work;
    2. per-bucket totals (one tiny row per bucket) get their own running
       sum on the bucket table — data-sized rows never pass through it —
       and each bucket's EXCLUSIVE offset broadcasts back;
    3. prefix = within-bucket running sum + bucket offset.

    A naive ``SUM() OVER (ORDER BY ...)`` funnels the whole table
    through one reducer; this shape keeps the critical path at
    O(bucket_size + n_buckets). Requires ``order_col`` values to be
    numeric (bucketing divides); ties within ``order_col`` use RANGE
    frame semantics — every tied row gets the same prefix value (the
    sum through ALL rows at that key), deterministic regardless of
    partition order. One output row per input row.

    Returns ``df`` plus ``<col>_prefix`` running-total columns.
    """
    from pyspark.sql import Window

    b = (F.col(order_col) / F.lit(bucket_size)).cast("bigint").alias("__bucket")
    # RANGE, not ROWS: with duplicate order keys a ROWS frame would give
    # each tied row a partition-order-dependent (nondeterministic) value
    within_w = Window.partitionBy("__bucket").orderBy(order_col).rangeBetween(
        Window.unboundedPreceding, 0
    )
    staged = df.withColumn("__bucket", b)
    for c in value_cols:
        staged = staged.withColumn(f"__within_{c}", F.sum(c).over(within_w))
    totals = staged.groupBy("__bucket").agg(
        *[F.sum(c).alias(f"__tot_{c}") for c in value_cols]
    )
    # exclusive running offset over the tiny bucket table
    off_w = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bucket",
        *[
            F.coalesce(F.sum(f"__tot_{c}").over(off_w), F.lit(0)).alias(f"__off_{c}")
            for c in value_cols
        ],
    )
    out = staged.join(F.broadcast(offsets), "__bucket")
    for c in value_cols:
        out = out.withColumn(
            f"{c}_prefix", F.col(f"__within_{c}") + F.col(f"__off_{c}")
        )
    return out.drop(
        "__bucket",
        *[f"__within_{c}" for c in value_cols],
        *[f"__off_{c}" for c in value_cols],
    )


BPE_SEP = "\x1f"  # unit separator; filtered out of input tokens


def bpe_merges(
    docs: DataFrame,
    text_col: str,
    *,
    n_merges: int = 8,
) -> list[dict]:
    """Train ``n_merges`` BPE merge rules on the corpus (Sennrich et al.
    2016 word-level byte-pair encoding, arXiv:1508.07909): start from
    character symbols per distinct word, repeatedly (1) count adjacent
    symbol pairs weighted by word frequency, (2) merge the most frequent
    pair everywhere (ties: lexicographic (left, right)), left-to-right
    greedy within a word.

    The missing piece between ``docs_bigram_counts`` (statistics) and
    ``docs_token_ids`` (application of a fixed vocab): this TRAINS the
    subword vocab. Naive char-BPE: no end-of-word marker, merged symbol
    is the string concat (so "a"+"bc" and "ab"+"c" collide — inherent
    to the string representation, shared by any engine computing it).

    Scale: the corpus is touched ONCE (token explode -> word-frequency
    aggregation); every iteration then runs on the VOCAB table (distinct
    words), orders of magnitude smaller, cached per round. Per-round
    driver traffic is exactly one row (the argmax pair) — the same
    O(1)-row convergence-collect pattern as the connected-components
    operator. Pair application is a JVM ``aggregate`` fold (greedy
    left-to-right, merged symbol immediately eligible for the next
    fold step), never a Python UDF.

    Returns the merge table as a list of dicts:
    (step, left_sym, right_sym, merged, pair_count).
    """
    from ..functions import text as tx
    from ..parallel import fan_out

    # round 14 (guide §2.2): fan the corpus out before the token
    # explode so the one corpus-sized pass parallelizes (no-op on
    # split inputs)
    words = (
        fan_out(docs.select(F.col(text_col)))
        .select(F.explode(tx.tokens(text_col)).alias("w"))
        .filter((F.length("w") > 0) & ~F.col("w").contains(BPE_SEP))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    vocab = words.select(
        "freq",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.substr(F.col("w"), i, F.lit(1)),
            ),
            BPE_SEP,
        ).alias("syms"),
    ).cache()

    merges: list[dict] = []
    #: live cached generations, oldest first — capped at 2 (round 15,
    #: guide §5: don't lean on LRU eviction; at corpus scale each
    #: generation is a distinct-word table, and n_merges of them is
    #: real executor storage pressure). try/finally so an exception
    #: mid-loop cannot leak the cached generations for the session.
    cached = [vocab]
    try:
        _bpe_merge_loop(vocab, n_merges, merges, cached)
    finally:
        for c in cached:
            c.unpersist()
    return merges


def _bpe_merge_loop(
    vocab: DataFrame,
    n_merges: int,
    merges: list[dict],
    cached: list[DataFrame],
) -> None:
    for step in range(n_merges):
        arr = F.split("syms", BPE_SEP)
        idx = F.when(
            F.size(arr) >= 2, F.sequence(F.lit(1), F.size(arr) - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(arr, i).alias("l"),
                F.element_at(arr, i + 1).alias("r"),
            ),
        )
        top = (
            vocab.select("freq", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        # the argmax collect above MATERIALIZED this generation's cache
        # (orderBy+limit is a full pass), so every OLDER generation's
        # blocks can no longer be read — unpersist down to the current
        # one, capping live caches at 2 across the loop body (this
        # generation + the child cached below).
        while len(cached) > 1:
            cached.pop(0).unpersist()
        l, r, cnt = top[0].l, top[0].r, top[0].cnt
        m = l + r
        merges.append(
            {
                "step": step,
                "left_sym": l,
                "right_sym": r,
                "merged": m,
                "pair_count": cnt,
            }
        )
        # greedy left-to-right merge fold; the merged symbol becomes the
        # new "last" and is compared (not its pieces) on the next step
        merged_syms = F.aggregate(
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            F.element_at(arr, 1),
            lambda acc, x: F.when(
                (F.element_at(F.split(acc, BPE_SEP), -1) == F.lit(l))
                & (x == F.lit(r)),
                F.concat(
                    F.left(acc, F.length(acc) - F.lit(len(l))), F.lit(m)
                ),
            ).otherwise(F.concat(acc, F.lit(BPE_SEP), x)),
        )
        # round 14 (guide §1 job-count): no eager count() per round —
        # the NEXT round's argmax job materializes new_vocab's cache on
        # first use while the parent generation is still cached (so the
        # fold recomputes from the parent's blocks, never from the
        # corpus). This halves the per-round job count.
        vocab = vocab.select("freq", merged_syms.alias("syms")).cache()
        cached.append(vocab)


def bigram_familiarity(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    add_k: int = 1,
    gate: float = 0.2,
) -> DataFrame:
    """Bigram-LM quality gate — the conditional-evidence upgrade of
    ``unigram_familiarity`` and the standard n-gram filter next to the
    Gopher repetition rules: score each document by how much corpus
    bigram evidence its word transitions carry relative to their
    context evidence, add-k smoothed.

        score(d) = (Σ_bg tf_d(bg)·c(bg) + k·n_d)
                 / (Σ_bg tf_d(bg)·c(ctx(bg)) + k·n_d·V)

    where c(bg) is the corpus count of the bigram, c(ctx) the corpus
    count of its first word as a bigram context, n_d the doc's bigram
    token count and V the corpus vocabulary size. A pooled ratio, NOT a
    per-bigram probability product: a true perplexity needs logs, and
    the engine's oracle policy excludes transcendentals (libm ulps
    differ across engines) — so both masses accumulate as exact BIGINT
    sums and the ONE trailing division is bit-identical cross-engine.
    Gate: ``passed = score >= gate``.

    Scale: the token stream collapses to (doc, bigram, tf) before any
    join; the bigram and context models are aggregations OF that table;
    V is a 1-row broadcast. Same two-shuffle shape as
    ``unigram_familiarity`` — no windows, no UDFs, no self-joins.
    """
    t = tx.tokens(text_col)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("t"), i).alias("ctx"),
            F.concat_ws(" ", F.slice("t", i, F.lit(2))).alias("bg"),
        ),
    )
    doc_bg = (
        docs.select(F.col(id_col).alias("doc_id"), t.alias("t"))
        .filter(F.size("t") >= 2)
        .select("doc_id", F.explode(bigrams).alias("p"))
        .groupBy("doc_id", F.col("p.bg").alias("bg"), F.col("p.ctx").alias("ctx"))
        .agg(F.count("*").cast("bigint").alias("bf"))
    )
    bg_model = doc_bg.groupBy("bg").agg(F.sum("bf").cast("bigint").alias("cnt"))
    ctx_model = doc_bg.groupBy("ctx").agg(
        F.sum("bf").cast("bigint").alias("ctx_cnt")
    )
    vocab = docs.select(
        F.explode(tx.tokens(text_col)).alias("w")
    ).agg(F.countDistinct("w").cast("bigint").alias("v_size"))

    per_doc = (
        doc_bg.join(bg_model, "bg")
        .join(ctx_model, "ctx")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("bf") * F.col("cnt")).cast("bigint").alias("bg_mass"),
            F.sum(F.col("bf") * F.col("ctx_cnt")).cast("bigint").alias("ctx_mass"),
            F.sum("bf").cast("bigint").alias("n_bigrams"),
        )
    )
    k = F.lit(add_k).cast("bigint")
    score = (F.col("bg_mass") + k * F.col("n_bigrams")) / (
        F.col("ctx_mass") + k * F.col("n_bigrams") * F.col("v_size")
    )
    return (
        per_doc.crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "n_bigrams",
            "bg_mass",
            "ctx_mass",
            "v_size",
            F.round(score, 6).alias("bigram_score"),
            (F.round(score, 6) >= gate).cast("int").alias("passed"),
        )
    )


def bpe_apply(words: DataFrame, merges: list[dict], syms_col: str = "syms") -> DataFrame:
    """Apply a trained BPE merge list (from ``bpe_merges``) to a word
    table whose ``syms_col`` holds BPE_SEP-joined symbol strings — the
    encode half of the tokenizer: each merge is one greedy
    left-to-right JVM fold, materialized per step (cache) so the
    expression tree stays linear instead of nesting 3^N references.

    Scale: the canonical trick is to encode the VOCABULARY, not the
    token stream — callers pass distinct words and join the result back
    onto the corpus, so the N fold passes run over |vocab| rows."""
    # the final per-merge cache is returned lazily (callers join it), so
    # it cannot be unpersisted here; stale caches from PREVIOUS
    # invocations are released instead, bounding the leak to one table
    while _BPE_APPLY_CACHES:
        _BPE_APPLY_CACHES.pop().unpersist()
    df = words
    prev = None
    for mrec in merges:
        l, r, m = mrec["left_sym"], mrec["right_sym"], mrec["merged"]
        arr = F.split(syms_col, BPE_SEP)
        folded = F.aggregate(
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            F.element_at(arr, 1),
            lambda acc, x: F.when(
                (F.element_at(F.split(acc, BPE_SEP), -1) == F.lit(l))
                & (x == F.lit(r)),
                F.concat(
                    F.left(acc, F.length(acc) - F.lit(len(l))), F.lit(m)
                ),
            ).otherwise(F.concat(acc, F.lit(BPE_SEP), x)),
        )
        df = df.withColumn(syms_col, folded).cache()
        df.count()
        if prev is not None:
            prev.unpersist()
        prev = df
    if prev is not None:
        _BPE_APPLY_CACHES.append(prev)
    return df


#: last invocation's cached result, released on the next bpe_apply call
_BPE_APPLY_CACHES: list[DataFrame] = []


def bpe_encode_stats(
    docs: DataFrame, text_col: str, id_col: str, merges: list[dict]
) -> DataFrame:
    """Per-document BPE encoding statistics under a trained merge list:
    token count, character count, post-merge symbol count, and the
    chars-per-symbol compression ratio (the metric a tokenizer ablation
    reports). Tokens outside the trainable set (empty / containing the
    separator) are skipped, matching training.

    Scale: distinct words encode ONCE (``bpe_apply`` over the vocab);
    the corpus-sized work is one token explode + a broadcast join of
    the encoded vocab + one per-doc aggregation."""
    words = (
        docs.select(F.explode(tx.tokens(text_col)).alias("w"))
        .filter((F.length("w") > 0) & ~F.col("w").contains(BPE_SEP))
        .distinct()
        .select(
            "w",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.substr(F.col("w"), i, F.lit(1)),
                ),
                BPE_SEP,
            ).alias("syms"),
        )
    )
    encoded = bpe_apply(words, merges).select(
        "w", F.size(F.split("syms", BPE_SEP)).cast("bigint").alias("n_syms_w")
    )
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tx.tokens(text_col)).alias("w")
    ).filter((F.length("w") > 0) & ~F.col("w").contains(BPE_SEP))
    return (
        tok.join(F.broadcast(encoded), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
            F.sum("n_syms_w").cast("bigint").alias("n_syms"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_chars",
            "n_syms",
            F.round(F.col("n_chars") / F.col("n_syms"), 6).alias("compression"),
        )
    )
