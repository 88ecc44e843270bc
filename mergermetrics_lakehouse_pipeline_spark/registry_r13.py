"""Round-13 surface: the occupancy-safe embedding near-dup twin
(VERDICT r12 next-step #1 — clears the repo's only perf-weak row),
coordinated-commit streaming/checkpointing, the count-collapse Gini
twin, and this round's exact-arithmetic analytics batch.

Determinism discipline (project-wide): every aggregate is exact BIGINT
or DECIMAL arithmetic with at most one trailing double division; ranks
and top-k carry full tie-breakers; float payloads quantize through
FLOOR(x*1000) or integer-cent recovery before any SUM.

Parity note: the reference's pipelines run MinHash-free (its dedup is
``dropDuplicates`` on business keys, reference:
consolidated_pipeline/1_customer_data_processing.py); the embedding
near-dup family is engine-extension surface for LLM training-data
pipelines, and this round gives it the same degenerate-bucket guard
the text-LSH path earned in round 12.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import T, register


# ---------------------------------------------------------------------------
# embedding near-dup, occupancy-guarded (round-13, VERDICT r12 next-step #1)
# ---------------------------------------------------------------------------

#: sign-LSH geometry shared by the Spark row and its DuckDB twin. 4
#: bands x 6 planes: expected bucket occupancy N/64 per band, so at
#: sf0.01 (500 vecs) most buckets sit under the cap (complete pairs)
#: while a few divert to hub-star — both guard paths hash-checked; at
#: sf0.1+ the big-bucket path dominates and candidate volume is
#: O(bands x N), which is the whole point.
_EMB_BANDS, _EMB_BITS, _EMB_CAP = 4, 6, 20
_EMB_SEED, _EMB_DIM, _EMB_THR = 42, 64, 0.30


def _emb_planes():
    import numpy as np

    return np.random.default_rng(_EMB_SEED).standard_normal(
        (_EMB_DIM, _EMB_BANDS * _EMB_BITS)
    )


def _sql_emb_capped() -> str:
    """DuckDB twin of the capped sign-LSH embedding pipeline: the SAME
    hyperplane literals (default_rng(42), emitted at full repr
    precision — both engines parse the decimal string to the nearest
    double), sign bits via in-order ``list_inner_product`` (matching
    the Spark ``dot`` fold bit-for-bit), then the identical
    census/small/big/hub split as ``docs_lsh_capped_pairs``
    (registry_r12.py) and an exact cosine confirm on the surviving
    edges."""
    planes = _emb_planes()

    def plane_lit(j: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]::DOUBLE[]"

    def band_key(b: int) -> str:
        return " || ".join(
            f"(CASE WHEN list_inner_product(v, {plane_lit(b * _EMB_BITS + r)})"
            " >= 0 THEN '1' ELSE '0' END)"
            for r in range(_EMB_BITS)
        )

    band_rows = "\n      UNION ALL\n".join(
        f"      SELECT vec_id, {b} AS band, {band_key(b)} AS band_key FROM e"
        for b in range(_EMB_BANDS)
    )
    cos = (
        "list_inner_product(a.v, b.v) / (sqrt(list_inner_product(a.v, a.v))"
        " * sqrt(list_inner_product(b.v, b.v)))"
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    bands AS (
{band_rows}
    ), sized AS (
      SELECT band, band_key, COUNT(*) AS n FROM bands GROUP BY 1, 2
    ), small AS (
      SELECT b.* FROM bands b JOIN sized s
        ON b.band = s.band AND b.band_key = s.band_key
      WHERE s.n <= {_EMB_CAP}
    ), big AS (
      SELECT b.* FROM bands b JOIN sized s
        ON b.band = s.band AND b.band_key = s.band_key
      WHERE s.n > {_EMB_CAP}
    ), hubs AS (
      SELECT band, band_key, MIN(vec_id) AS id_a FROM big GROUP BY 1, 2
    ), cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM small a JOIN small b
          ON a.band = b.band AND a.band_key = b.band_key
             AND a.vec_id < b.vec_id
        UNION ALL
        SELECT h.id_a, b.vec_id AS id_b
        FROM big b JOIN hubs h
          ON b.band = h.band AND b.band_key = h.band_key
        WHERE b.vec_id <> h.id_a
      )
    )
    SELECT c.id_a, c.id_b, ROUND({cos}, 6) AS cosine_sim
    FROM cand c JOIN e a ON c.id_a = a.vec_id JOIN e b ON c.id_b = b.vec_id
    WHERE ROUND({cos}, 6) >= {_EMB_THR}
    """


@register(
    "emb_neardup_capped_pairs",
    _sql_emb_capped(),
    tags=["LLM-dedup", "LLM-sim", "lsh", "occupancy-guard", "scale"],
)
def q_emb_neardup_capped_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-safe embedding near-dup twin (VERDICT r12 "what's
    wrong" #1): `emb_neardup_pairs` buckets by `label`, whose fixed
    cardinality makes per-bucket population linear in the corpus and
    the all-pairs join quadratic (SF1 measured 15.8x at 10x data).
    This row rebuckets by multi-band random-hyperplane sign-LSH
    (operators/similarity.py sign_lsh_band_keys — plane literals baked
    into the plan, signs via the in-order JVM dot fold so DuckDB
    replays the exact bucketing) and routes the buckets through the
    round-12 occupancy guard (operators/dedup.py capped_bucket_pairs):
    buckets <= 20 keep complete in-bucket pairs, oversized buckets
    divert to the distributed hub-star expansion — O(k) edges, no task
    ever buffers more than the cap. Surviving candidate edges are
    exact-cosine-confirmed at >= 0.30.

    The DuckDB twin replays the identical plane literals, census and
    split, so the guard's SEMANTICS — which edges survive — are
    hash-verified, not just that something completes. Scale: bucket
    count grows as 2^bits (the knob that keeps expected occupancy
    constant as the corpus grows); the cap bounds the degenerate tail;
    candidate volume is O(bands x N) once buckets exceed the cap."""
    from .operators import similarity as sim

    e = T(spark, sf_dir, "embeddings")
    return sim.embedding_capped_neardup_pairs(
        e,
        dim=_EMB_DIM,
        bands=_EMB_BANDS,
        bits=_EMB_BITS,
        seed=_EMB_SEED,
        threshold=_EMB_THR,
        max_bucket=_EMB_CAP,
    )


# ---------------------------------------------------------------------------
# Delta: coordinated-commit streaming + retention (round-13, VERDICT
# r12 next-step #2)
# ---------------------------------------------------------------------------


@register(
    "delta_catalog_owned_stream_roundtrip",
    """
    WITH tagged AS (
      SELECT n_regionkey,
             CASE WHEN n_nationkey < 8 THEN 0
                  WHEN n_nationkey < 16 THEN 1
                  ELSE 2 END AS b
      FROM nation WHERE n_nationkey < 20
    ),
    s AS (
      SELECT n_regionkey,
             CAST(COUNT(*) AS BIGINT) AS n_nations_streamed,
             CAST(SUM(b) AS BIGINT) AS version_mass,
             CAST(MIN(b) AS BIGINT) AS first_seen_batch
      FROM tagged GROUP BY 1
    ),
    a AS (
      SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_after_retention
      FROM nation GROUP BY 1
    )
    SELECT s.n_regionkey, s.n_nations_streamed, s.version_mass,
           s.first_seen_batch, a.n_after_retention
    FROM s JOIN a ON s.n_regionkey = a.n_regionkey
    """,
    tags=["S6", "delta", "streaming-source", "catalog-owned", "roundtrip"],
)
def q_delta_catalog_owned_stream_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming + retention over a CATALOG-OWNED table, end to end
    (sources/delta_coordinated.py round 13): create through the
    coordinator, two coordinated appends (the last ratified commit
    stays STAGED — a filesystem LIST cannot see it), replay with
    ``stream_commit_batches_coordinated`` (must consult the catalog
    and backfill, so all three batches arrive; the protocol-only
    upgrade commit yields nothing), fold per-region counts + version
    mass + first-seen batch, then run the retention pipeline —
    ``write_checkpoint_coordinated`` at the ratified frontier,
    ``truncate_log_coordinated`` (numbered JSONs removed AND the
    catalog forgets them, staged copies dropped) — append one more
    slice PAST the truncation horizon and read the final table back.
    A source that drops the staged tail, re-emits reorganized bytes,
    misses a version, or a retention that loses rows or resurrects
    truncated commits all flip the hash.

    Scale: each batch is a bounded scan of that commit's added files;
    checkpoint/truncate are O(log) driver metadata; the final read
    replays checkpoint + post-horizon tail only."""
    from .sources.delta_coordinated import (
        FileCommitCoordinator,
        append_coordinated,
        create_catalog_owned,
        read_delta_coordinated,
        stream_commit_batches_coordinated,
        truncate_log_coordinated,
        write_checkpoint_coordinated,
    )

    base = tempfile.mkdtemp(prefix="mm_co_stream_rt_")
    root = os.path.join(base, "nation_co")
    cat = FileCommitCoordinator(os.path.join(base, "catalog"))
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    create_catalog_owned(nation.filter("n_nationkey < 8"), root, cat)
    append_coordinated(
        nation.filter("n_nationkey >= 8 and n_nationkey < 16"), root, cat
    )
    append_coordinated(
        nation.filter("n_nationkey >= 16 and n_nationkey < 20"), root, cat
    )
    # the last ratified commit must still be staged-only: the stream
    # consulting the catalog (not a LIST) is the property under test
    log = os.path.join(root, "_delta_log")
    if os.path.exists(os.path.join(log, f"{3:020d}.json")):
        raise RuntimeError("v3 backfilled early — lazy backfill broken")

    folded = None
    batches = stream_commit_batches_coordinated(spark, root, cat)
    if [v for v, _ in batches] != [0, 2, 3]:
        raise RuntimeError(
            f"expected batches at versions [0, 2, 3], got "
            f"{[v for v, _ in batches]}"
        )
    for i, (_, batch) in enumerate(batches):
        agg = batch.groupBy("n_regionkey").agg(
            F.count("*").cast("bigint").alias("n_nations_streamed"),
            F.sum(F.lit(i)).cast("bigint").alias("version_mass"),
            F.min(F.lit(i)).cast("bigint").alias("first_seen_batch"),
        )
        if folded is None:
            folded = agg
        else:
            prev = folded.select(
                "n_regionkey",
                F.col("n_nations_streamed").alias("p_n"),
                F.col("version_mass").alias("p_vm"),
                F.col("first_seen_batch").alias("p_fs"),
            )
            folded = agg.join(prev, "n_regionkey", "full_outer").select(
                "n_regionkey",
                (
                    F.coalesce("n_nations_streamed", F.lit(0))
                    + F.coalesce("p_n", F.lit(0))
                )
                .cast("bigint")
                .alias("n_nations_streamed"),
                (
                    F.coalesce("version_mass", F.lit(0))
                    + F.coalesce("p_vm", F.lit(0))
                )
                .cast("bigint")
                .alias("version_mass"),
                F.least(
                    F.coalesce("first_seen_batch", F.lit(99)),
                    F.coalesce("p_fs", F.lit(99)),
                )
                .cast("bigint")
                .alias("first_seen_batch"),
            )

    # retention: checkpoint at the ratified frontier, truncate, and the
    # catalog must FORGET — then commit past the horizon and read back
    write_checkpoint_coordinated(spark, root, cat)
    removed = truncate_log_coordinated(root, cat)
    if removed != [0, 1, 2, 3]:
        raise RuntimeError(f"truncate removed {removed}, expected [0..3]")
    if cat.ratified(_tid(root)) != {}:
        raise RuntimeError("catalog still remembers truncated commits")
    append_coordinated(nation.filter("n_nationkey >= 20"), root, cat)
    after = (
        read_delta_coordinated(spark, root, cat)
        .groupBy("n_regionkey")
        .agg(F.count("*").cast("bigint").alias("n_after_retention"))
    )
    return folded.join(after, "n_regionkey")


def _tid(root: str) -> str:
    from .sources.delta_coordinated import _table_id

    return _table_id(root)
