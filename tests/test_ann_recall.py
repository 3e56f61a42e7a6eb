"""Recall of the approximate ANN paths against the exact brute-force
baseline — the quality bound that makes IVF/PQ usable as the 100 TB
scan path (correctness parity alone can't show the approximation is
any good)."""

from __future__ import annotations

import os

from levi_spark.queries import ann_cosine_topk, ivf_ann_topk, pq_adc_topk

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def _recall(approx, exact):
    return len(approx & exact) / len(exact)


def test_ivf_recall_at_5(spark):
    exact = _pairs(ann_cosine_topk(spark, SF_DIR))
    approx = _pairs(ivf_ann_topk(spark, SF_DIR))
    r = _recall(approx, exact)
    assert r >= 0.5, f"IVF recall@5 {r:.2f} below floor"


def test_pq_adc_recall_at_5(spark):
    # measured 0.34 at sf0.01 with the untrained first-16-vectors
    # codebook on near-orthogonal synthetic embeddings — a sampled
    # k-means codebook (the stated 100 TB path) raises this; the floor
    # guards against the sketch degenerating to noise (random top-5
    # over 500 candidates would score ~0.01)
    exact = _pairs(ann_cosine_topk(spark, SF_DIR))
    approx = _pairs(pq_adc_topk(spark, SF_DIR))
    r = _recall(approx, exact)
    assert r >= 0.25, f"PQ-ADC recall@5 {r:.2f} below floor"
