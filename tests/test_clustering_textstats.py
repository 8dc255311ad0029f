"""Semantic tests (beyond oracle parity) for k-means clustering, PMI
collocations, and vocabulary-coverage operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spotify_serverless_etl_pipeline_engineering_with_azure_spark import registry
from spotify_serverless_etl_pipeline_engineering_with_azure_spark.catalog import table

ALL = registry.load_all()


def test_kmeans_assigns_every_vector_once(spark, sf_dir):
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.similarity import (
        KMEANS_K,
    )

    out = ALL["cluster_kmeans_embeddings"].fn(spark, sf_dir).toPandas()
    n_vec = table(spark, sf_dir, "embeddings").count()
    assert len(out) == n_vec
    assert out["vec_id"].is_unique
    assert set(out["cluster_id"]) <= set(range(KMEANS_K))
    assert (out["dist_sq"] >= 0).all()


def test_kmeans_clusters_are_spatially_coherent(spark, sf_dir):
    """Within each cluster, the mean distance to own members is below
    the mean distance to any other cluster's members — clusters are
    spatially coherent. This is deliberately the COHERENCE invariant,
    not per-vector argmin: one extra Lloyd update from the output
    assignment does not reproduce the final codebook the assignment was
    scored against, so argmin is not independently recomputable here;
    the exact per-vector (cluster_id, dist_sq) values are pinned by the
    unrolled-CTE DuckDB oracle parity row instead."""
    import numpy as np

    out = ALL["cluster_kmeans_embeddings"].fn(spark, sf_dir).toPandas()
    emb = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .toPandas()
    )
    vecs = {int(r.vec_id): np.array(r.e) for r in emb.itertuples()}
    by_cluster = out.groupby("cluster_id")["vec_id"].apply(list).to_dict()
    cents = {c: np.mean([vecs[v] for v in vs], axis=0) for c, vs in by_cluster.items()}
    # own-centroid distance <= other-centroid distance on average
    for c, vs in by_cluster.items():
        own = float(np.mean([np.sum((vecs[v] - cents[c]) ** 2) for v in vs]))
        for other, oc in cents.items():
            if other == c:
                continue
            cross = float(np.mean([np.sum((vecs[v] - oc) ** 2) for v in vs]))
            assert own <= cross + 1e-9, (c, other, own, cross)


def test_pmi_matches_hand_computation(spark, sf_dir):
    """Recompute PMI for every returned pair from raw counts."""
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.text_ops import (
        MIN_PAIR_COUNT,
    )

    out = ALL["text_pmi_collocations"].fn(spark, sf_dir).toPandas()
    assert (out["n_pair"] >= MIN_PAIR_COUNT).all()
    docs = table(spark, sf_dir, "documents").select("text").toPandas()
    uni: dict[str, int] = {}
    pairs: dict[tuple[str, str], int] = {}
    n_uni = n_bi = 0
    for text in docs["text"]:
        toks = text.split(" ")
        n_uni += len(toks)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
            n_bi += 1
    assert len(out) == sum(1 for c in pairs.values() if c >= MIN_PAIR_COUNT)
    for r in out.itertuples():
        expect = math.log(
            (pairs[(r.w1, r.w2)] / n_bi) / ((uni[r.w1] / n_uni) * (uni[r.w2] / n_uni))
        )
        assert abs(r.pmi - expect) < 1e-5, (r.w1, r.w2, r.pmi, expect)


def test_vocab_coverage_curve_shape(spark, sf_dir):
    out = (
        ALL["text_vocab_coverage"].fn(spark, sf_dir).toPandas().sort_values("rank")
    )
    # contiguous ranks from 1, counts non-increasing, coverage monotone to 1.0
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    assert (out["cnt"].diff().dropna() <= 0).all()
    assert out["cum_share"].is_monotonic_increasing
    assert abs(out["cum_share"].iloc[-1] - 1.0) < 1e-9
