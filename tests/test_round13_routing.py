"""Round-13 hot-family routing tests (VERDICT r12 item 6): the
capped-PPJoin + MinHash-cluster composition must be covering (every
pair the cap drops has both endpoints routed), the bucket-star edges
must produce the same components as the full bucket cliques, and the
recipe must cluster a synthetic giant family the capped join refuses
to enumerate."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _family_corpus(spark, family=30, quiet=6):
    """A giant family of DISTINCT near-identical docs (shared 14-word
    body + per-doc one-word suffix — the sf10pb suffix shape) plus a few
    mutually-unrelated quiet docs."""
    body = " ".join(f"w{i}" for i in range(14))
    rows = [(i, f"{body} suffix{i}") for i in range(family)]
    rows += [
        (1000 + j, " ".join(f"q{j}x{i}" for i in range(14)))
        for j in range(quiet)
    ]
    # two quiet near-dups that must stay exact under the cap
    rows += [(2000, "a b c d e f g h i j k l"),
             (2001, "a b c d e f g h i j k m")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_routing_covers_every_capped_out_pair(spark):
    from pandas_etl_framework_spark.llmops.dedup import (
        jaccard_hot_family_docs,
        jaccard_prefix_pairs,
        token_sets_df,
    )

    docs = _family_corpus(spark)
    ts = token_sets_df(docs)
    cap = 5
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_prefix_pairs(ts).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_prefix_pairs(ts, prefix_cap=cap).collect()
    }
    routed = {
        r["doc_id"]
        for r in jaccard_hot_family_docs(ts, prefix_cap=cap).collect()
    }
    assert capped <= exact
    missed = exact - capped
    assert missed, "fixture must actually exercise the cap"
    for a, b in missed:
        assert a in routed and b in routed, (a, b, routed)
    # drop-side only: the quiet docs are never routed
    assert not any(d >= 1000 for d in routed)


def test_star_edges_components_equal_clique_components(spark):
    from pandas_etl_framework_spark.llmops.dedup import (
        connected_components,
        minhash_band_pairs,
        minhash_band_star_edges,
    )

    rng = random.Random(7)
    rows = [
        (doc, band, f"k{rng.randint(0, 5)}")
        for doc in range(40)
        for band in range(3)
    ]
    bands = spark.createDataFrame(rows, ["doc_id", "band", "band_key"])
    via_star = {
        (r["node"], r["component"])
        for r in connected_components(
            minhash_band_star_edges(bands)
        ).collect()
    }
    via_clique = {
        (r["node"], r["component"])
        for r in connected_components(minhash_band_pairs(bands)).collect()
    }
    assert via_star == via_clique
    # star edge count is linear in band rows, never quadratic in buckets
    n_star = minhash_band_star_edges(bands).count()
    assert n_star <= len(rows)


def test_cluster_routing_recipe_resolves_the_family(spark):
    from pandas_etl_framework_spark.llmops.dedup import (
        jaccard_prefix_with_cluster_routing,
    )

    docs = _family_corpus(spark)
    pairs, clusters = jaccard_prefix_with_cluster_routing(docs, prefix_cap=5)
    got_pairs = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # the quiet near-dup pair survives the cap exactly
    assert (2000, 2001) in got_pairs
    rows = clusters.collect()
    routed_ids = {r["doc_id"] for r in rows}
    assert routed_ids == set(range(30))  # the family, nothing else
    keepers = {r["keeper_doc_id"] for r in rows}
    assert keepers == {0}  # one cluster, min-id keeper
    assert [r["is_keeper"] for r in rows if r["doc_id"] == 0] == [True]
