"""In-engine ML: PCA pinned against numpy's eigendecomposition; the Naive
Bayes classifier's held-out accuracy sanity-checked (it must beat the
majority-class baseline — a trained model that doesn't is a wiring bug)."""

from __future__ import annotations

import numpy as np

from candyspark.plans.ml import q_naive_bayes_langid, q_pca_top_component
from candyspark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_pca_matches_numpy(spark):
    rows = q_pca_top_component(spark, SF).collect()
    loadings = np.array(
        [r["loading"] for r in sorted(rows, key=lambda r: r["dim"])]
    )
    evr = rows[0]["explained_variance_ratio"]

    X = np.array(
        [r["embedding"] for r in load_table(spark, SF, "embeddings").collect()],
        dtype=np.float64,
    )
    cov = np.cov(X, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    pivot = int(np.argmax(np.abs(top)))
    if top[pivot] < 0:
        top = -top
    # the embedding cloud is near-isotropic (tiny eigengap), so the fixed
    # 300-step power iteration lands close to, not exactly on, the numpy
    # eigenvector — 1e-3 is far inside "same component" territory.
    assert np.abs(loadings - top).max() < 1e-3
    assert abs(evr - vals[-1] / vals.sum()) < 1e-3


def test_naive_bayes_learns_injected_signal(spark):
    """The testdata corpus is lang-independent word soup (no learnable
    signal — verified), so the learner is validated on a synthetic corpus
    WITH signal: each language gets marker words mixed into shared filler;
    a correct NB must recover them and score ≥90% held-out accuracy."""
    from unittest import mock

    import candyspark.plans.ml as ML

    markers = {"aa": ["alpha", "amber"], "bb": ["bravo", "birch"], "cc": ["coral", "cedar"]}
    rows = []
    for li, (lang, mks) in enumerate(sorted(markers.items())):
        for i in range(40):
            doc_id = li * 40 + i
            filler = "the data table scan join " * 3
            text = filler + " ".join(mks * (3 + i % 3))
            rows.append((doc_id, text, lang, "synthetic", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with mock.patch.object(ML, "load_table", lambda _s, _d, _t: df), mock.patch.object(
        ML, "fan_out", lambda d: d
    ):
        m = ML.q_naive_bayes_langid(spark, "unused").collect()
    total = sum(r["n_docs"] for r in m)
    correct = sum(r["n_docs"] for r in m if r["true_lang"] == r["pred_lang"])
    assert total > 0
    assert correct / total >= 0.9, (correct, total, m)
