"""Property tests for the LLM-data operators whose kernels are
engine-specific (no SQL oracle): SimHash, hyperplane-LSH ANN — plus
behavioral invariants for the oracle-checked dedup/similarity family."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators import dedup as dd
from mergermetrics_lakehouse_pipeline_spark.operators import similarity as sim
from mergermetrics_lakehouse_pipeline_spark.functions import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
            (3, "the quick brown fox leaps over the lazy dog"),  # near dup
            (4, "completely different text about spark query engines"),
            (5, "el rapido zorro marron salta sobre el perro que duerme y la casa"),
            (6, ""),
        ],
        ["doc_id", "text"],
    )


def test_simhash_invariants(spark, docs):
    keyed = {r.doc_id: r.sh for r in dd.simhash_keys(docs, "text", "doc_id").collect()}
    assert keyed[1] == keyed[2]  # identical text -> identical key
    h_near = docs.select(
        dd.hamming32(F.lit(keyed[1]).cast("bigint"), F.lit(keyed[3]).cast("bigint")).alias("h")
    ).first().h
    h_far = docs.select(
        dd.hamming32(F.lit(keyed[1]).cast("bigint"), F.lit(keyed[4]).cast("bigint")).alias("h")
    ).first().h
    assert h_near < h_far  # near-dup is closer than unrelated text
    assert 0 <= keyed[1] < 2**32


def test_minhash_identical_docs_always_candidates(docs):
    pairs = dd.minhash_lsh_candidates(docs.filter(F.col("doc_id") <= 4), "text", "doc_id")
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got  # identical docs share every band


def test_exact_dedup_keeps_min_id(docs):
    out = dd.exact_dedup(docs, "text", "doc_id")
    ids = sorted(r.doc_id for r in out.collect())
    assert 1 in ids and 2 not in ids  # canonical (min) id survives


def test_jaccard_bounds_and_self_similarity(spark, docs):
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], ["id_a", "id_b"])
    out = {(r.id_a, r.id_b): r.jaccard for r in dd.ngram_jaccard_pairs(docs, pairs, "text", "doc_id").collect()}
    assert out[(1, 2)] == 1.0  # identical
    assert 0.0 < out[(1, 3)] < 1.0  # near dup strictly between
    assert out[(1, 4)] == 0.0  # disjoint


def test_ann_recall_against_brute_force(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = e.filter(F.col("vec_id") < 10)
    exact = sim.cosine_topk(e, queries, k=5)
    approx = sim.ann_cosine_topk(
        e, queries, k=5, n_planes=12, prefix_bits=2, n_tables=4
    )
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # OR-amplification over 4 tables of 2-bit buckets: measured ~0.84 on
    # this corpus; assert well above random-candidate levels
    assert recall >= 0.6, f"ANN recall {recall:.2f} suspiciously low"
    assert all(r.rank <= 5 for r in approx.collect())

    # multi-probe (Hamming-1 buckets) must not lose candidates and
    # should recover near-boundary misses (measured 0.70 -> 1.00 at the
    # registry's sf0.01 parameters)
    probed = sim.ann_cosine_topk(
        e, queries, k=5, n_planes=12, prefix_bits=2, n_tables=4, multiprobe=True
    )
    probed_pairs = {(r.query_id, r.neighbor_id) for r in probed.collect()}
    probed_recall = len(exact_pairs & probed_pairs) / len(exact_pairs)
    assert probed_recall >= recall, (probed_recall, recall)


def test_hyperplane_signature_deterministic(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    s1 = {r.vec_id_sig: r.signature for r in sim.hyperplane_signatures(e).collect()}
    s2 = {r.vec_id_sig: r.signature for r in sim.hyperplane_signatures(e).collect()}
    assert s1 == s2  # fixed seed -> stable across runs
    assert all(len(v) == 16 and set(v) <= {"0", "1"} for v in s1.values())


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    """PQ-ADC with exact re-rank recovers most brute-force neighbors;
    returned similarities are true cosines (re-ranked), so every hit
    agrees with brute force on the value too."""
    from mergermetrics_lakehouse_pipeline_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact_rows = sim.cosine_topk(e, q, k=5).collect()
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    exact_sims = {(r.query_id, r.neighbor_id): r.cosine_sim for r in exact_rows}
    approx_rows = sim.pq_cosine_topk(
        e, q, k=5, n_sub=8, k_sub=32, n_iter=3, rerank=12
    ).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall}"
    for r in approx_rows:
        key = (r.query_id, r.neighbor_id)
        if key in exact_sims:
            assert abs(r.cosine_sim - exact_sims[key]) < 1e-5


def test_pq_codebook_shapes_and_determinism(spark, sf_dir):
    from mergermetrics_lakehouse_pipeline_spark.operators import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = sim.train_pq_codebooks(e, n_sub=4, k_sub=8, n_iter=1)
    b2 = sim.train_pq_codebooks(e.repartition(13), n_sub=4, k_sub=8, n_iter=1)
    assert b1.shape == (4, 8, 16)
    import numpy as np

    assert np.allclose(b1, b2)  # partitioning-independent training


def test_quality_score_discriminates(spark):
    good = "the quick brown fox is running in the park and it is a fine day " * 3
    bad = "!!! ??? ... ;;; ::: !!!"
    df = spark.createDataFrame([(1, good), (2, bad)], ["doc_id", "text"])
    out = {r.doc_id: r.q for r in df.select("doc_id", tx.quality_score("text").alias("q")).collect()}
    assert out[1] > out[2]
    assert 0.0 <= out[2] <= out[1] <= 1.0


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with nprobe=4/16 cells recovers most brute-force neighbors;
    nprobe=n_cells is exact."""
    from mergermetrics_lakehouse_pipeline_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_topk(e, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_cosine_topk(e, q, k=5, n_cells=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall}"
    full = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_cosine_topk(e, q, k=5, n_cells=16, nprobe=16).collect()
    }
    assert full == exact


def test_connected_components_labels_min_reachable(spark):
    # components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {5,6}; {7} singleton
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["doc_id"])
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (5, 6)], ["id_a", "id_b"]
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dd.connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_handles_chain_diameter(spark):
    # a 20-node path graph needs multiple propagation rounds
    nodes = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], ["id_a", "id_b"]
    )
    got = dd.connected_components(nodes, edges).collect()
    assert all(r.cluster_id == 0 for r in got) and len(got) == 20


def test_connected_components_star_matches_label_propagation(spark):
    """The star-rewiring CC must agree with min-label propagation on
    every graph shape: chains, stars, singletons, dense blobs, and a
    pseudo-random pair soup."""
    import random

    rng = random.Random(7)
    cases = [
        [(2, 1), (2, 3), (4, 3), (5, 6)],                      # chains + pair
        [(i, i + 1) for i in range(19)],                       # 20-node path
        [(0, i) for i in range(1, 10)],                        # star
        [(a, b) for a in range(5) for b in range(a + 1, 5)],   # clique
        [(rng.randrange(30), rng.randrange(30)) for _ in range(25)],
    ]
    for edges_py in cases:
        n = max(max(a, b) for a, b in edges_py) + 1
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
        edges = spark.createDataFrame(edges_py, ["id_a", "id_b"])
        ref = {
            r.doc_id: r.cluster_id
            for r in dd.connected_components(nodes, edges).collect()
        }
        got = {
            r.doc_id: r.cluster_id
            for r in dd.connected_components_star(nodes, edges).collect()
        }
        assert got == ref, edges_py


def test_connected_components_star_empty_edges(spark):
    nodes = spark.createDataFrame([(i,) for i in range(5)], ["doc_id"])
    edges = spark.createDataFrame([], "id_a bigint, id_b bigint")
    got = {
        r.doc_id: r.cluster_id
        for r in dd.connected_components_star(nodes, edges).collect()
    }
    assert got == {i: i for i in range(5)}


def test_scrub_pii_redacts_and_preserves(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org today"),
            (2, "call +1 555-123-4567 or 555-987-6543 now"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.s
        for r in df.select("doc_id", tx.scrub_pii("text").alias("s")).collect()
    }
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "call <PHONE> or <PHONE> now"
    assert out[3] == "nothing sensitive here"


def test_train_test_split_is_stable_and_90_10(spark, sf_dir):
    from mergermetrics_lakehouse_pipeline_spark.registry_llm import (
        q_docs_train_test_split,
    )

    a = q_docs_train_test_split(spark, sf_dir).collect()
    b = q_docs_train_test_split(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    frac_train = sum(r.split == "train" for r in a) / len(a)
    assert 0.8 < frac_train < 0.97  # hash-split hovers near 0.9


def test_winnow_guarantee(spark):
    """Winnowing guarantee: documents sharing a >= k+w-1 char substring
    share at least one selected fingerprint; disjoint docs share none."""
    from mergermetrics_lakehouse_pipeline_spark.functions.text import winnow_fingerprints

    shared = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma"),
            (2, f"{shared} delta epsilon zeta"),
            (3, "completely different words only here"),
        ],
        "doc_id int, text string",
    )
    fps = winnow_fingerprints(df, "text", "doc_id", k=8, w=4)
    by_doc = {
        r.doc_id: set(r.fps)
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("fps")).collect()
    }
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_kmeans_training_deterministic_and_improves_balance(spark, sf_dir):
    """Distributed Lloyd training: reproducible across input partitioning
    and produces better-balanced cells than the untrained pick (lower max
    cell occupancy), with recall no worse than the floor."""
    import numpy as np
    from pyspark.sql import functions as F

    from mergermetrics_lakehouse_pipeline_spark.operators import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1 = sim.train_centroids_kmeans(e, k=8, n_iter=3)
    c2 = sim.train_centroids_kmeans(e.repartition(11), k=8, n_iter=3)
    assert np.allclose(c1, c2)  # partitioning-independent

    def max_cell(cents):
        occ = (
            sim.ivf_assign(e, cents, nprobe=1)
            .groupBy("centroid_id")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        return occ

    untrained = sim.deterministic_centroids(e, k=8)
    assert max_cell(c1) <= max_cell(untrained)

    q = e.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in sim.cosine_topk(e, q, k=5).collect()}
    trained = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_cosine_topk(
            e, q, k=5, n_cells=8, nprobe=2, train_iters=3
        ).collect()
    }
    assert len(exact & trained) / len(exact) >= 0.5


def test_pca_projection_invariants(spark, sf_dir):
    """PCA: pc1 variance >= pc2 variance, components decorrelated,
    result independent of input partitioning."""
    import numpy as np

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sim.pca_project(e, n_components=2).collect()
    assert len(out) == e.count()
    pc1 = np.array([r.pc1 for r in out])
    pc2 = np.array([r.pc2 for r in out])
    assert pc1.var() >= pc2.var()
    assert abs(np.corrcoef(pc1, pc2)[0, 1]) < 0.05
    out2 = sim.pca_project(e.repartition(7), n_components=2).collect()
    assert sorted((r.vec_id, r.pc1, r.pc2) for r in out) == sorted(
        (r.vec_id, r.pc1, r.pc2) for r in out2
    )


def test_lsh_probe_matches_cross_boundary_candidates(spark, sf_dir):
    """lsh_probe_candidates(batch bands, index bands) must reproduce
    exactly the cross-boundary subset of the full-corpus candidate set —
    the equivalence that lets incremental dedup band only the batch."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_batch = F.col("doc_id") % 10 == 0
    full = dd.minhash_lsh_candidates(d, "text", "doc_id")
    want = {
        (r.id_a, r.id_b)
        for r in full.filter(
            (F.col("id_a") % 10 == 0) != (F.col("id_b") % 10 == 0)
        ).collect()
    }
    batch_bands = dd.minhash_band_keys(d.filter(is_batch), "text", "doc_id")
    index_bands = dd.minhash_band_keys(d.filter(~is_batch), "text", "doc_id")
    got = {
        (min(r.probe_id, r.index_id), max(r.probe_id, r.index_id))
        for r in dd.lsh_probe_candidates(batch_bands, index_bands).collect()
    }
    assert got == want


def test_incremental_dedup_plan_reads_band_index(spark, sf_dir):
    """O(batch) plan shape: the candidate join's index side must read the
    PERSISTED band table (write_version parquet), and the only documents
    scan in the candidate plan is the batch side — no full-corpus
    re-banding per ingest."""
    import tempfile

    from mergermetrics_lakehouse_pipeline_spark.sources.catalog import (
        read_version,
        write_version,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_batch = F.col("doc_id") % 10 == 0
    # short path on purpose: FileScan Location strings truncate ~100
    # chars, and the assertion greps the path
    root = tempfile.mkdtemp() + "/band_index"
    write_version(
        dd.minhash_band_keys(d.filter(~is_batch), "text", "doc_id"), root
    )
    batch_bands = dd.minhash_band_keys(d.filter(is_batch), "text", "doc_id")
    cand = dd.lsh_probe_candidates(batch_bands, read_version(spark, root))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1  # batch side only
    assert "band_index/v=1" in plan  # index side reads the stored bands
    # and the registered query composes the same shape end-to-end
    from mergermetrics_lakehouse_pipeline_spark import registry_llm

    out = registry_llm.q_docs_incremental_dedup(spark, sf_dir)
    qplan = out._jdf.queryExecution().executedPlan().toString()
    assert "mm_dedup_index_" in qplan  # classification reads the index tables


def test_cluster_assign_matches_numpy(spark, sf_dir):
    """cosine_cluster_assign must agree with a numpy argmax brute force
    on centroid choice for every vector (modulo exact ties, which the
    operator breaks toward the lower centroid id, matching argmax's
    first-max behavior on our distinct synthetic sims)."""
    import numpy as np

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_vec")
    )
    got = {
        r.vec_id: r.centroid_id
        for r in sim.cosine_cluster_assign(e, cents).collect()
    }
    rows = e.select("vec_id", "embedding").collect()
    C = np.array(
        [r.embedding for r in sorted(rows, key=lambda r: r.vec_id)[:8]], dtype="float64"
    )
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    for r in rows:
        v = np.asarray(r.embedding, dtype="float64")
        sims = (Cn @ (v / np.linalg.norm(v)))
        assert got[r.vec_id] == int(np.argmax(sims))


def test_semantic_dedup_invariants(spark, sf_dir):
    """Greedy SemDeDup keep-rule guarantees: (a) dropped implies a
    near-dup neighbor; (b) within every connected component of the
    intra-cluster dup graph the max-(centroid_sim, -id) member is kept
    (no neighborhood wiped out); (c) one output row per vector; (d) the
    pair join is cluster-bounded."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_vec")
    )
    out = sim.semantic_dedup(e, cents, threshold=0.30).cache()
    assert out.count() == e.count()

    dropped = out.filter("kept = 0")
    assert dropped.filter("dup_neighbors = 0").count() == 0

    pairs = sim.embedding_neardup_pairs(
        e.join(
            sim.cosine_cluster_assign(e, cents).select("vec_id", "centroid_id"),
            "vec_id",
        ),
        threshold=0.30,
        bucket_col="centroid_id",
    ).collect()
    prio = {
        r.vec_id: (r.centroid_sim, -r.vec_id)
        for r in out.select("vec_id", "centroid_sim").collect()
    }
    kept = {r.vec_id for r in out.filter("kept = 1").collect()}

    # union-find over the dup graph (test-scale driver-side check)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r.id_a), find(r.id_b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for v in parent:
        comps.setdefault(find(v), []).append(v)
    assert comps, "expected at least one dup component at threshold 0.30"
    for members in comps.values():
        top = max(members, key=lambda v: prio[v])
        assert top in kept, f"component max-priority member {top} was dropped"

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan  # pair join carries the cluster key


def test_multi_suite_decontamination_constant_scan_count(spark, sf_dir):
    """The documents scan count must stay at TWO regardless of how many
    suites are configured (suite membership rides a broadcast literal
    table, per-suite hits are conditional aggregates — adding a suite
    adds a CASE, never a scan/join)."""
    from mergermetrics_lakehouse_pipeline_spark import registry

    df = registry.queries()["docs_multi_suite_decontamination"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 2, plan.count("documents.parquet")
    rows = df.collect()
    assert all(r.max_contamination <= 1.0 for r in rows)
    # suite docs excluded from the training output
    assert all(
        r.doc_id % 97 != 0 and r.doc_id % 89 != 0 and r.doc_id % 83 != 0
        for r in rows
    )


def test_lsh_max_bucket_degenerate_corpus_bounded(spark):
    """The occupancy guard (round 12): 10^4 byte-identical docs form one
    bucket per band; with max_bucket set the expansion is the O(k) star
    around the minimum id — n-1 pairs, never the ~5*10^7 all-pairs
    explosion."""
    n = 10_000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact document text repeated verbatim").alias(
            "text"
        ),
    )
    pairs = dd.minhash_lsh_candidates(
        d, "text", "doc_id", max_bucket=64
    )
    rows = pairs.collect()
    assert len(rows) == n - 1
    assert all(r.id_a == 0 and r.id_b > 0 for r in rows)  # hub = min id


def test_lsh_max_bucket_star_is_subset_and_high_cap_is_exact(spark, sf_dir):
    """Capped output is always a subset of the complete all-pairs set
    (star edges live inside their bucket), and a cap no bucket exceeds
    reproduces the complete set exactly."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    full = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(d, "text", "doc_id").collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(
            d, "text", "doc_id", max_bucket=2
        ).collect()
    }
    assert capped <= full
    exact = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(
            d, "text", "doc_id", max_bucket=10**9
        ).collect()
    }
    assert exact == full


def test_emb_capped_neardup_degenerate_corpus_bounded(spark):
    """The embedding twin of the r12 occupancy guard: 10^4 identical
    vectors share every sign-LSH bucket; with the cap the expansion is
    the O(k) star around the minimum id per band — n-1 distinct pairs,
    never the ~5*10^7 all-pairs explosion. All survive the cosine
    confirm at 1.0 (identical vectors)."""
    n = 10_000
    dim = 8
    vec = F.array(*[F.lit(float(j + 1)) for j in range(dim)])
    d = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    pairs = sim.embedding_capped_neardup_pairs(
        d, dim=dim, bands=2, bits=3, threshold=0.5, max_bucket=16
    )
    rows = pairs.collect()
    assert len(rows) == n - 1
    assert all(r.id_a == 0 and r.id_b > 0 for r in rows)  # hub = min id
    assert all(r.cosine_sim == 1.0 for r in rows)


def test_emb_capped_neardup_subset_and_high_cap_complete(spark, sf_dir):
    """Capped output is a subset of the uncapped same-bucket confirm
    set; a cap no bucket exceeds reproduces it exactly; and every
    returned pair really is a >= threshold cosine pair (subset of the
    label-free all-pairs ground truth)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kw = dict(dim=64, bands=4, bits=6, seed=42, threshold=0.30)
    capped = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in sim.embedding_capped_neardup_pairs(
            e, max_bucket=5, **kw
        ).collect()
    }
    full = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in sim.embedding_capped_neardup_pairs(
            e, max_bucket=10**9, **kw
        ).collect()
    }
    assert set(capped) <= set(full)
    exact_cap = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in sim.embedding_capped_neardup_pairs(
            e, max_bucket=10**6, **kw
        ).collect()
    }
    assert exact_cap == full
    truth = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in sim.embedding_neardup_pairs(e, threshold=0.30).collect()
    }
    assert set(full) <= set(truth)
    assert all(truth[p] == s for p, s in full.items())  # same 6dp cosine


def test_sign_lsh_band_keys_shape_and_determinism(spark, sf_dir):
    """bands rows per vector, keys are bit strings of the right width,
    and two independent plans agree bit-for-bit (plane literals +
    in-order fold are deterministic by construction)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    k1 = sim.sign_lsh_band_keys(e, bands=3, bits=5).collect()
    k2 = sim.sign_lsh_band_keys(e, bands=3, bits=5).collect()
    assert sorted(map(tuple, k1)) == sorted(map(tuple, k2))
    assert len(k1) == 300
    assert all(len(r.band_key) == 5 and set(r.band_key) <= {"0", "1"} for r in k1)
    assert {r.band for r in k1} == {0, 1, 2}


def test_lsh_max_bucket_preserves_cluster_connectivity(spark):
    """Every duplicate CLUSTER the complete candidate graph connects
    stays connected under the cap — the invariant that makes the star
    diversion safe for dedup (connected components downstream)."""
    rows = []
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "red orange yellow green blue indigo violet colors",
        "north south east west compass headings travel map",
    ]
    for g, text in enumerate(texts):
        for i in range(30):
            rows.append((g * 100 + i, text))
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = dd.minhash_lsh_candidates(
        d, "text", "doc_id", max_bucket=5
    ).collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in capped:
        parent[find(r.id_a)] = find(r.id_b)
    for g in range(len(texts)):
        roots = {find(g * 100 + i) for i in range(30)}
        assert len(roots) == 1  # each identical-text group is one component
    # groups with disjoint vocabulary stay apart
    assert len({find(g * 100) for g in range(len(texts))}) == len(texts)
