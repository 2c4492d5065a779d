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


def test_kaplan_meier_matches_brute_force(spark):
    """KM invariants recomputed independently: at-risk bookkeeping and the
    survival product from the same per-user (lag, event) relation, via a
    plain single-threaded product — no exp/ln reformulation."""
    import math

    from pyspark.sql import functions as F

    from candyspark.plans.extensions import q_kaplan_meier

    got = {r["day"]: r for r in q_kaplan_meier(spark, SF).collect()}

    e = load_table(spark, SF, "events").select("user_id", "ts", "event_type").collect()
    end_ts = max(r["ts"] for r in e)
    signups, purchases = {}, {}
    for r in e:
        if r["event_type"] == "signup":
            u = r["user_id"]
            if u not in signups or r["ts"] < signups[u]:
                signups[u] = r["ts"]
    for r in e:
        if r["event_type"] == "purchase":
            purchases.setdefault(r["user_id"], []).append(r["ts"])
    per_user = []
    for u, s_ts in signups.items():
        convs = [t for t in purchases.get(u, []) if t >= s_ts]
        if convs:
            lag = (min(convs) - s_ts) // __import__("datetime").timedelta(microseconds=1)
            per_user.append((lag // 86400000000, 1))
        else:
            lag = (end_ts - s_ts) // __import__("datetime").timedelta(microseconds=1)
            per_user.append((lag // 86400000000, 0))
    days = {}
    for t, ev in per_user:
        d, c = days.get(t, (0, 0))
        days[t] = (d + ev, c + (1 - ev))
    n_risk = len(per_user)
    surv = 1.0
    for t in sorted(days):
        d, c = days[t]
        row = got[int(t)]
        assert row["n_risk"] == n_risk and row["n_events"] == d and row["n_censored"] == c
        surv *= 1.0 - d / n_risk
        assert abs(row["survival"] - surv) < 1e-4, (t, row["survival"], surv)
        n_risk -= d + c


def test_adamic_adar_matches_brute_force(spark):
    """AA scores recomputed from a python adjacency map over the same
    thresholded edge set — including the non-edge filter and hub weights."""
    import math

    from candyspark.plans.graph import _copurchase_edges, q_link_prediction_aa

    edges = {(r["u"], r["v"]) for r in _copurchase_edges(spark, SF).collect()}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    scores = {}
    for c, nbrs in adj.items():
        w = 1.0 / math.log(len(nbrs)) if len(nbrs) > 1 else None
        snaps = round(w, 9) if w else None
        for a in nbrs:
            for b in nbrs:
                if a < b:
                    scores[(a, b)] = scores.get((a, b), 0.0) + (snaps or 0.0)
    want = {
        k: round(v, 6)
        for k, v in scores.items()
        if k not in edges and v > 0
    }
    got = {
        (r["u"], r["v"]): r["adamic_adar"]
        for r in q_link_prediction_aa(spark, SF).collect()
    }
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert got == dict(top), (got, dict(top))


def test_markov_attribution_matches_numpy(spark):
    """The transition chain, base conversion probability, and per-channel
    removal effects recomputed independently: journeys rebuilt by a
    python loop over raw events, absorbing-chain solved with numpy."""
    from candyspark.plans.ml import _CHANNELS, q_markov_attribution

    got = {r["channel"]: r for r in q_markov_attribution(spark, SF).collect()}

    rows = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = {}
    for r in rows:
        if r["event_type"] in (*_CHANNELS, "purchase"):
            by_user.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], r["event_type"])
            )
    counts = {}
    for evs in by_user.values():
        evs.sort()
        seq = []
        for _, _, t in evs:
            seq.append(t)
            if t == "purchase":
                break
        if not seq or seq == ["purchase"]:
            if seq:  # purchase with no prior touch: START -> purchase
                counts[("START", "purchase")] = counts.get(("START", "purchase"), 0) + 1
            continue
        path = ["START"] + seq
        if path[-1] != "purchase":
            path.append("NULL")
        for a, b in zip(path, path[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1

    states = ["START", *_CHANNELS]

    def solve(removed):
        A = np.eye(len(states))
        b = np.zeros(len(states))
        for i, s in enumerate(states):
            if s == removed:
                continue
            out = {d: c for (a, d), c in counts.items() if a == s}
            tot = sum(out.values())
            if tot == 0:
                continue
            for d, c in out.items():
                p = c / tot
                if d == "purchase":
                    b[i] += p
                elif d in states and d != removed:
                    A[i, states.index(d)] -= p
        return float(np.linalg.solve(A, b)[0])

    base = solve(None)
    effects = {ch: max(base - solve(ch), 0.0) for ch in _CHANNELS}
    total = sum(effects.values()) or 1.0
    for ch in _CHANNELS:
        assert abs(got[ch]["base_conversion"] - base) < 1e-5
        assert abs(got[ch]["removal_effect"] - effects[ch]) < 1e-5
        assert abs(got[ch]["attribution_share"] - effects[ch] / total) < 1e-5


def test_isotonic_calibration_properties(spark):
    """The PAVA kernel's output must (a) be non-decreasing within each
    source, (b) preserve the weighted mean (the PAVA invariant), and
    (c) equal an independent single-threaded PAVA on the same aggregate."""
    from candyspark.plans.ml import q_isotonic_calibration

    rows = q_isotonic_calibration(spark, SF).collect()
    assert rows
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r["bin"])
        iso = [r["iso_rate"] for r in rs]
        assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:])), (source, iso)
        w = [r["n_docs"] for r in rs]
        raw = [r["raw_rate"] for r in rs]
        assert abs(
            sum(x * y for x, y in zip(iso, w)) - sum(x * y for x, y in zip(raw, w))
        ) <= 1e-3 * sum(w)

        # independent PAVA
        blocks = [[r, ww, 1] for r, ww in zip(raw, w)]
        i = 0
        while i < len(blocks) - 1:
            if blocks[i][0] > blocks[i + 1][0] + 1e-15:
                r1, w1, s1 = blocks[i]
                r2, w2, s2 = blocks[i + 1]
                blocks[i : i + 2] = [[(r1 * w1 + r2 * w2) / (w1 + w2), w1 + w2, s1 + s2]]
                i = max(i - 1, 0)
            else:
                i += 1
        want = []
        for r, _, span in blocks:
            want.extend([r] * span)
        assert all(abs(a - b) < 1e-5 for a, b in zip(iso, want)), (source, iso, want)


def test_ols_recovers_planted_structure(spark):
    """The OLS target is y = x1(1 - d): the fit must recover
    b1 ~ 1 - E[d] and b2 ~ -E[price]/100 with R^2 > 0.99 — a regression
    whose ground truth is planted, not assumed from the synthetic data
    (whose raw columns are mutually independent)."""
    from candyspark.plans.ml import q_ols_price_model
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    row = q_ols_price_model(spark, sf).collect()[0]
    li = load_table(spark, sf, "lineitem")
    stats = li.agg(
        F.avg("l_discount").alias("d"), F.avg("l_extendedprice").alias("p")
    ).collect()[0]
    assert row.r2 > 0.99, row
    assert abs(row.beta_price - (1 - stats.d)) < 0.02, (row.beta_price, stats.d)
    assert abs(row.beta_discount_pct - (-stats.p / 100)) / (stats.p / 100) < 0.1


def test_logistic_newton_matches_numpy(spark):
    """The in-engine 4-step Newton fit must match an independent numpy
    Newton on the same sufficient statistics (and thus the true MLE to
    within the 10-dp inter-step snap)."""
    import numpy as np

    from candyspark.plans.ml import q_logistic_newton

    SF = "/root/testdata/sf0.001"
    got = q_logistic_newton(spark, SF).collect()[0]

    import duckdb

    cells = duckdb.sql(
        f"""SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS INTEGER) AS x,
                   COUNT(*) AS n,
                   SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_pos
            FROM '{SF}/lineitem.parquet' GROUP BY 1"""
    ).fetchall()
    x = np.array([c[0] for c in cells], dtype=float)
    n = np.array([c[1] for c in cells], dtype=float)
    pos = np.array([c[2] for c in cells], dtype=float)
    b = np.zeros(2)
    for _ in range(4):
        p = 1.0 / (1.0 + np.exp(-(b[0] + b[1] * x)))
        g = np.array([np.sum(pos - n * p), np.sum(x * (pos - n * p))])
        w = n * p * (1 - p)
        H = np.array(
            [[np.sum(w), np.sum(x * w)], [np.sum(x * w), np.sum(x * x * w)]]
        )
        b = b + np.linalg.solve(H, g)
    assert abs(got["beta0"] - b[0]) < 1e-6, (got["beta0"], b[0])
    assert abs(got["beta1"] - b[1]) < 1e-6, (got["beta1"], b[1])
    # log-loss is a proper mean over rows
    p = 1.0 / (1.0 + np.exp(-(b[0] + b[1] * x)))
    ll = -np.sum(pos * np.log(p) + (n - pos) * np.log(1 - p)) / np.sum(n)
    assert abs(got["mean_log_loss"] - ll) < 1e-6


def test_kendall_tau_matches_bruteforce(spark, tmp_path):
    """τ-b from the contingency-grid algebra must equal the O(n²)
    definition on a small synthetic table (heavy ties on both axes)."""
    import itertools
    import math
    import random

    rng = random.Random(3)
    rows = [
        (rng.choice([0.0, 0.02, 0.05, 0.1]), float(rng.randint(1, 6)),
         "R" if rng.random() < 0.4 else "N")
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        rows, "l_discount double, l_quantity double, l_returnflag string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    from candyspark.plans.quality import q_kendall_tau

    got = q_kendall_tau(spark, str(tmp_path)).collect()[0]

    xy = [(round(d * 100), int(q)) for d, q, _ in rows]
    c = d_ = 0
    for (x1, y1), (x2, y2) in itertools.combinations(xy, 2):
        s = (x1 - x2) * (y1 - y2)
        if (x1 != x2) and (y1 != y2):
            c += s > 0
            d_ += s < 0
    n = len(xy)
    n0 = n * (n - 1) // 2
    from collections import Counter

    n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in xy).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in xy).values())
    tau = (c - d_) / math.sqrt((n0 - n1) * (n0 - n2))
    assert got["concordant"] == c and got["discordant"] == d_
    assert abs(got["tau_b"] - tau) < 1e-6


def test_shapley_efficiency_axiom(spark):
    """When every coalition is observed, Σφ_i = v(full) − v(∅) (the
    efficiency axiom) — checked against the lattice DuckDB computes."""
    import duckdb

    from candyspark.plans.sequences import q_shapley_attribution

    SF = "/root/testdata/sf0.01"
    rows = q_shapley_attribution(spark, SF).collect()
    lat = dict(
        (m, (nu, nc))
        for m, nu, nc in duckdb.sql(
            f"""SELECT mask, COUNT(*), SUM(conv) FROM (
                  SELECT user_id, DATE_TRUNC('day', ts) AS d,
                    MAX(CASE WHEN event_type='view' THEN 1 ELSE 0 END)
                    + 2*MAX(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
                    + 4*MAX(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS mask,
                    MAX(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS conv
                  FROM '{SF}/events.parquet' GROUP BY user_id, d)
               GROUP BY mask"""
        ).fetchall()
    )
    assert set(lat) == set(range(8)), "expected every coalition observed"
    v = {m: nc / nu for m, (nu, nc) in lat.items()}
    total_phi = sum(r["shapley_value"] for r in rows)
    assert abs(total_phi - (v[7] - v[0])) < 1e-4, (total_phi, v[7] - v[0])


def test_gradient_boost_stumps_matches_reference(spark):
    """The relational two-round boosting fit must equal an independent
    Python implementation on the same cells (splits, gammas, MSE)."""
    import duckdb

    from candyspark.plans.ml import q_gradient_boost_stumps

    SF = "/root/testdata/sf0.001"
    got = q_gradient_boost_stumps(spark, SF).collect()[0]

    cells = sorted(
        duckdb.sql(
            f"""SELECT CAST(l_quantity AS BIGINT), COUNT(*),
                       SUM(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END)
                FROM '{SF}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
    )
    n_tot = sum(c[1] for c in cells)
    f0 = round(sum(c[2] for c in cells) / n_tot, 10)

    def fit_round(resid_by_v):
        # resid_by_v: list of (v, n, r) in v order; returns (split, gl, gr)
        best = None
        nl = cl = 0.0
        r_tot = sum(r for _, _, r in resid_by_v)
        for v, n, r in resid_by_v[:-1]:
            nl += n
            cl += r
            gain = round(cl * cl / nl + (r_tot - cl) ** 2 / (n_tot - nl), 8)
            if best is None or gain > best[0]:
                best = (gain, v, round(cl / nl, 10),
                        round((r_tot - cl) / (n_tot - nl), 10))
        return best[1], best[2], best[3]

    r1 = [(v, n, sy - n * f0) for v, n, sy in cells]
    s1, gl1, gr1 = fit_round(r1)
    r2 = [
        (v, n, sy - n * (f0 + (gl1 if v <= s1 else gr1)))
        for v, n, sy in cells
    ]
    s2, gl2, gr2 = fit_round(r2)
    assert (got["split1"], got["split2"]) == (s1, s2)
    for name, want in (
        ("base_rate", f0),
        ("gamma_left_1", gl1),
        ("gamma_right_1", gr1),
        ("gamma_left_2", gl2),
        ("gamma_right_2", gr2),
    ):
        assert abs(got[name] - want) < 1e-9, (name, got[name], want)
    sse = sum(
        sy * (1 - (f0 + (gl1 if v <= s1 else gr1) + (gl2 if v <= s2 else gr2))) ** 2
        + (n - sy) * (f0 + (gl1 if v <= s1 else gr1) + (gl2 if v <= s2 else gr2)) ** 2
        for v, n, sy in cells
    )
    assert abs(got["train_mse"] - sse / n_tot) < 1e-6
