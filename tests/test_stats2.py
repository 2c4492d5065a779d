"""Planted-signal tests for the stats2 family (KS, Bartlett, runs test,
effect sizes): the oracle-parity suite pins the engine-vs-DuckDB contract;
these pin the STATISTICS — a planted distribution shift / variance gap /
serial pattern must move each test the textbook direction, and its absence
must not."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from candyspark.plans import collect_registry

REGISTRY = collect_registry()


def _lineitem(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_linestatus string, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_partkey long, l_suppkey long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _orders(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _li_row(i, flag, qty, price, disc):
    return (i, 1, flag, "F", float(qty), float(price), float(disc), 0.0, 1, 1)


def test_ks_detects_planted_distribution_shift(spark, tmp_path):
    """Returned items all at discount 0.10, kept all at 0.00 → D = 1 and
    the two-sided p must collapse; identical discount mixes → D = 0, p = 1."""
    rows = [_li_row(i, "R", 10, 100, 0.10) for i in range(80)] + [
        _li_row(100 + i, "N", 10, 100, 0.00) for i in range(80)
    ]
    r = REGISTRY["ks_test"].fn(spark, _lineitem(spark, tmp_path, rows)).collect()[0]
    assert r.d_stat == 1.0
    assert r.significant and r.p_value < 1e-6

    same = [_li_row(i, "R", 10, 100, (i % 5) / 100.0) for i in range(80)] + [
        _li_row(100 + i, "N", 10, 100, (i % 5) / 100.0) for i in range(80)
    ]
    r = REGISTRY["ks_test"].fn(spark, _lineitem(spark, tmp_path, same)).collect()[0]
    assert r.d_stat == 0.0
    assert not r.significant and r.p_value == 1.0


def test_bartlett_detects_planted_variance_gap(spark, tmp_path):
    """Flag 'A' prices spread 100× wider than 'N'/'R' → Bartlett must fire;
    three groups with the identical spread must not."""
    import itertools

    def spread(flag, base, step, n, start):
        return [
            _li_row(start + i, flag, 10, base + step * (i % 11 - 5), 0.0)
            for i in range(n)
        ]

    wide = (
        spread("A", 1000, 500, 60, 0)
        + spread("N", 1000, 5, 60, 100)
        + spread("R", 1000, 5, 60, 200)
    )
    r = REGISTRY["bartlett_test"].fn(spark, _lineitem(spark, tmp_path, wide)).collect()[0]
    assert r.k == 3 and r.significant and r.bartlett_t > 100

    flat = list(
        itertools.chain.from_iterable(
            spread(f, 1000, 5, 60, j * 100) for j, f in enumerate("ANR")
        )
    )
    r = REGISTRY["bartlett_test"].fn(spark, _lineitem(spark, tmp_path, flat)).collect()[0]
    assert not r.significant and abs(r.bartlett_t) < 1e-6


def test_runs_test_reads_oscillation_and_trend(spark, tmp_path):
    """Strictly alternating high/low days → runs = n (far too many, z > 0);
    low-half-then-high-half → runs = 2 (far too few, z < 0)."""
    days = [f"2024-{1 + i // 28:02d}-{1 + i % 28:02d}" for i in range(56)]
    alt = [(i, 1, 1000.0 if i % 2 == 0 else 10.0, days[i]) for i in range(56)]
    r = REGISTRY["runs_test"].fn(spark, _orders(spark, tmp_path, alt)).collect()[0]
    assert r.runs == 56 and r.z > 1.96 and r.significant

    trend = [(i, 1, 10.0 + (1000.0 if i >= 28 else 0.0) + i % 7, days[i]) for i in range(56)]
    r = REGISTRY["runs_test"].fn(spark, _orders(spark, tmp_path, trend)).collect()[0]
    assert r.runs == 2 and r.z < -1.96 and r.significant


def test_effect_sizes_full_dominance_and_null(spark, tmp_path):
    """All returned quantities strictly below all kept ones → Cliff's
    δ = −1, A = 0, d large-negative, magnitude 'large'; identical groups →
    δ = 0, A = 0.5, 'negligible'."""
    rows = [_li_row(i, "R", 5 + i % 3, 100, 0.0) for i in range(60)] + [
        _li_row(100 + i, "N", 30 + i % 3, 100, 0.0) for i in range(60)
    ]
    r = REGISTRY["effect_sizes"].fn(spark, _lineitem(spark, tmp_path, rows)).collect()[0]
    assert r.cliffs_delta == -1.0 and r.vd_a == 0.0
    assert r.cohens_d < -5 and r.magnitude == "large"

    same = [_li_row(i, "R", 10 + i % 5, 100, 0.0) for i in range(60)] + [
        _li_row(100 + i, "N", 10 + i % 5, 100, 0.0) for i in range(60)
    ]
    r = REGISTRY["effect_sizes"].fn(spark, _lineitem(spark, tmp_path, same)).collect()[0]
    assert r.cliffs_delta == 0.0 and r.vd_a == 0.5 and r.magnitude == "negligible"


def _embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_linear_cka_copy_vs_independent(spark, tmp_path):
    """Y-half an exact copy of the X-half → CKA = 1; structurally unrelated
    halves → CKA near 0."""
    copy = [
        (i, [float((i * 7 + j) % 5 - 2) for j in range(32)] * 2, 0)
        for i in range(40)
    ]
    r = REGISTRY["linear_cka"].fn(spark, _embeddings(spark, tmp_path, copy)).collect()[0]
    assert abs(r.cka - 1.0) < 1e-4

    indep = [
        (
            i,
            [float((i * 7 + j) % 5 - 2) for j in range(32)]
            + [float((i * i * 11 + 3 * j) % 7 - 3) for j in range(32)],
            0,
        )
        for i in range(40)
    ]
    r = REGISTRY["linear_cka"].fn(spark, _embeddings(spark, tmp_path, indep)).collect()[0]
    assert r.cka < 0.3


def test_frechet_distance_zero_and_planted_shift(spark, tmp_path):
    """Identical cohorts → FID 0; a +0.5 shift in every dimension →
    mean term = 64·0.25 = 16 exactly, zero covariance gap."""
    base = [float((j % 7) - 3) / 4.0 for j in range(64)]
    same = [(i, base, i % 10) for i in range(40)]
    r = REGISTRY["frechet_embedding_distance"].fn(
        spark, _embeddings(spark, tmp_path, same)
    ).collect()[0]
    assert r.fid_diag == 0.0

    shifted = [
        (i, base if i % 10 < 5 else [v + 0.5 for v in base], i % 10)
        for i in range(40)
    ]
    r = REGISTRY["frechet_embedding_distance"].fn(
        spark, _embeddings(spark, tmp_path, shifted)
    ).collect()[0]
    assert abs(r.mean_shift_sq - 16.0) < 1e-4
    assert abs(r.cov_gap) < 1e-6
    assert abs(r.fid_diag - 16.0) < 1e-4


def _docs(spark, tmp_path, texts):
    rows = [(i, t, "en", f"s{i}", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


_EVAL_TEXTS = [
    "hash hash hash hash hash",          # tf(hash)=5 → relevant, rank 1
    "join padding words here extra",      # tf(join)=1 → never relevant
    "stream stream stream stream f1 f2 f3 f4 f5 f6",  # tf=4, long
    "stream x",                           # tf=1, short — outranks doc 2
    "spark spark spark spark spark spark spark spark",  # tf=8 → grade 3
    "candy filler nothing else",
]


def _brute_rank(term):
    """Reference implementation of the shared scorer on _EVAL_TEXTS."""
    toks = [t.lower().split() for t in _EVAL_TEXTS]
    dls = [len(t) for t in toks]
    sumdl, n = sum(dls), len(toks)
    scored = []
    for d, tk in enumerate(toks):
        tf = tk.count(term)
        if tf:
            scored.append((-(2 * tf * sumdl) / (2 * tf * sumdl + 3 * dls[d] * n), d, tf))
    scored.sort()
    return [(d, tf) for _, d, tf in scored][:10]


def test_mrr_eval_planted_rankings(spark, tmp_path):
    sf = _docs(spark, tmp_path, _EVAL_TEXTS)
    rows = {r.term: r for r in REGISTRY["mrr_eval"].fn(spark, sf).collect()}
    for term in ("hash", "join", "stream", "spark"):
        ranked = _brute_rank(term)
        first = next((i + 1 for i, (_, tf) in enumerate(ranked) if tf >= 4), None)
        want_rr = 1.0 / first if first else 0.0
        assert rows[term].first_pos == (first or 0), term
        assert rows[term].rr == pytest.approx(want_rr, abs=1e-6), term
    want_mean = sum(
        (1.0 / next((i + 1 for i, (_, tf) in enumerate(_brute_rank(t)) if tf >= 4), 1e18))
        for t in ("hash", "join", "stream", "spark")
    ) / 4.0
    assert rows["__mean__"].rr == pytest.approx(want_mean, abs=1e-5)


def test_err_eval_planted_cascade(spark, tmp_path):
    """Brute-force the cascade model on the planted corpus: ERR must match
    Σ (1/i)·R_i·Π(1−R_j) with R from the tf grade bands."""
    sf = _docs(spark, tmp_path, _EVAL_TEXTS)
    rows = {r.term: r for r in REGISTRY["err_eval"].fn(spark, sf).collect()}

    def grade(tf):
        return 3 if tf >= 8 else 2 if tf >= 4 else 1 if tf >= 2 else 0

    for term in ("hash", "join", "stream", "spark"):
        err, stop = 0.0, 1.0
        for i, (_, tf) in enumerate(_brute_rank(term), start=1):
            r = (2 ** grade(tf) - 1) / 8.0
            err += stop * r / i
            stop *= 1.0 - r
        assert rows[term].err_10 == pytest.approx(err, abs=1e-5), term
    # the single tf=8 doc is grade 3: spark's ERR is exactly 7/8
    assert rows["spark"].err_10 == pytest.approx(0.875, abs=1e-6)


def test_ljung_box_white_noise_vs_weekly_cycle(spark, tmp_path):
    """A deterministic 7-day cycle has huge lag-7 autocorrelation → Q must
    fire; a constant-plus-tiny-jitter series with period ≫ 8 must not."""
    days = [f"2024-{1 + i // 28:02d}-{1 + i % 28:02d}" for i in range(112)]
    weekly = [(i, 1, 100.0 + 50.0 * (i % 7 == 0), days[i]) for i in range(112)]
    r = REGISTRY["ljung_box"].fn(spark, _orders(spark, tmp_path, weekly)).collect()[0]
    assert r.significant and r.q_stat > 20.1  # χ²(8) 99th pctile

    # period-97 pattern: lags 1..8 see an essentially flat series
    calm = [(i, 1, 100.0 + (i % 97 == 50) * 1.0, days[i]) for i in range(112)]
    r = REGISTRY["ljung_box"].fn(spark, _orders(spark, tmp_path, calm)).collect()[0]
    assert not r.significant


def test_permutation_entropy_monotone_vs_alternating(spark, tmp_path):
    """A strictly increasing series has ONE ordinal pattern (entropy 0); an
    alternation uses two patterns equally (entropy ln 2)."""
    import math

    days = [f"2024-{1 + i // 28:02d}-{1 + i % 28:02d}" for i in range(56)]
    up = [(i, 1, 100.0 + i, days[i]) for i in range(56)]
    r = REGISTRY["permutation_entropy"].fn(spark, _orders(spark, tmp_path, up)).collect()[0]
    assert r.n_patterns == 1 and r.entropy == 0.0

    alt = [(i, 1, 100.0 if i % 2 == 0 else 10.0, days[i]) for i in range(56)]
    r = REGISTRY["permutation_entropy"].fn(spark, _orders(spark, tmp_path, alt)).collect()[0]
    assert r.n_patterns == 2
    assert r.entropy == pytest.approx(math.log(2), abs=1e-5)


def test_oaxaca_identity_and_pure_endowment_gap(spark, tmp_path):
    """When both groups share the SAME price-per-line relation and differ
    only in line counts, the gap must be ~fully explained; the
    gap ≡ explained + unexplained identity must hold exactly."""
    li, od = [], []
    k = 0
    for g, (nl_lo, nl_hi, n_orders) in enumerate([(7, 9, 40), (1, 3, 40)]):
        for o in range(n_orders):
            k += 1
            nl = nl_lo if o % 2 == 0 else nl_hi  # mean 8 vs mean 2, y = 100·x
            pri = "1-URGENT" if g == 0 else "3-MEDIUM"
            od.append((k, 1, 100.0 * nl, f"2024-01-{1 + o % 28:02d}", pri))
            for ln in range(nl):
                li.append((k, ln + 1, "N", "F", 1.0, 100.0, 0.0, 0.0, 1, 1))
    spark.createDataFrame(
        od,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    sf = _lineitem(spark, tmp_path, li)
    r = REGISTRY["oaxaca_decomposition"].fn(spark, sf).collect()[0]
    assert r.gap == pytest.approx(600.0, abs=1e-6)
    assert r.gap == pytest.approx(r.explained + r.unexplained, abs=1e-6)
    # y = 100·x exactly in group B → β_B = 100 and the gap is all endowment
    assert r.explained == pytest.approx(600.0, abs=1e-4)
    assert abs(r.unexplained) < 1e-3


def test_ams_f2_sketch_tracks_exact_f2(spark, tmp_path):
    """On a planted corpus the 16-estimator median must land within the
    theoretical scatter of the exact F2 (and be exactly right when one
    term dominates everything)."""
    texts = [" ".join(["alpha"] * 50)] + [f"w{i} w{i} u{i}" for i in range(20)]
    sf = _docs(spark, tmp_path, texts)
    r = REGISTRY["ams_f2_sketch"].fn(spark, sf).collect()[0]
    exact = 50 * 50 + 20 * (4 + 1)
    assert r.f2_exact == float(exact)
    assert r.rel_error < 0.75  # median-of-16 bound on a skewed corpus


def _events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_cumulative_incidence_textbook_example(spark, tmp_path):
    """4 users, no censoring before the last event: u1 purchases at 1h,
    u2 errors at 2h, u3 purchases at 3h, u4 censored. Hand-computed
    Aalen-Johansen: CIF_p(1)=1/4, CIF_e(2)=1/4·... checked exactly."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def e(eid, uid, typ, hours):
        return (eid, t0 + dt.timedelta(hours=hours), uid, typ, 1.0, "{}")

    rows = [e(i, u, "signup", 0) for i, u in enumerate([1, 2, 3, 4])]
    rows += [
        e(10, 1, "purchase", 1.5),
        e(11, 2, "error", 2.5),
        e(12, 3, "purchase", 3.5),
        e(13, 4, "view", 10.5),  # admin-censors u4 at the last event ts
    ]
    out = {
        r.hours_since_signup: r
        for r in REGISTRY["cumulative_incidence"].fn(
            spark, _events(spark, tmp_path, rows)
        ).collect()
    }
    # h=1: 4 at risk, 1 purchase → CIF_p = 1/4
    assert out[1].at_risk == 4 and out[1].cif_purchase == pytest.approx(0.25, abs=1e-6)
    # h=2: 3 at risk, S(2-)=3/4, 1 error → CIF_e = (3/4)(1/3) = 1/4
    assert out[2].at_risk == 3 and out[2].cif_error == pytest.approx(0.25, abs=1e-6)
    # h=3: 2 at risk, S(3-)=3/4·2/3=1/2, 1 purchase → CIF_p = 1/4 + 1/4 = 1/2
    assert out[3].at_risk == 2 and out[3].cif_purchase == pytest.approx(0.5, abs=1e-6)
    # competing-risks sanity: CIFs sum below 1 at every time
    assert all(r.cif_purchase + r.cif_error <= 1.0 + 1e-9 for r in out.values())


def test_event_study_planted_lift(spark, tmp_path):
    """Treated users' engagement jumps +50 from their purchase day on;
    controls are flat — the curve must read ≈0 pre-event and ≈+50 post."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(10):  # treated: purchase on day 10
        rows.append((eid, t0 + dt.timedelta(days=10), u, "purchase", 1.0, "{}")); eid += 1
        for d in range(20):
            v = 10.0 + (50.0 if d >= 10 else 0.0)
            rows.append((eid, t0 + dt.timedelta(days=d, hours=5), u, "click", v, "{}")); eid += 1
    for u in range(100, 110):  # controls: flat 10/day
        for d in range(20):
            rows.append((eid, t0 + dt.timedelta(days=d, hours=6), u, "view", 10.0, "{}")); eid += 1
    out = {
        r.relative_day: r.effect
        for r in REGISTRY["event_study"].fn(
            spark, _events(spark, tmp_path, rows)
        ).collect()
    }
    for r in range(-5, 0):
        assert abs(out[r]) < 1e-6, f"pre-trend at r={r}"
    for r in range(0, 6):
        assert out[r] == pytest.approx(50.0, abs=1e-6), f"lift at r={r}"


def test_rake_scores_multiword_phrases(spark, tmp_path):
    """A repeated 3-word technical phrase must outscore isolated unigrams
    (degree/frequency rewards phrase membership), and stopwords must never
    appear inside any returned phrase."""
    texts = [
        "the adaptive query execution of the engine",
        "adaptive query execution is fast",
        "we like the engine and the engine is fast",
        "fast fast fast standalone words only",
    ]
    sf = _docs(spark, tmp_path, texts)
    rows = REGISTRY["rake_keywords"].fn(spark, sf).collect()
    by_phrase = {r.phrase: r for r in rows}
    assert "adaptive query execution" in by_phrase
    top = rows[0]
    assert top.phrase == "adaptive query execution" and top.n_words == 3
    stop = set(
        "the a an and or of to in on for with is are was were be as at by it "
        "this that from not but have has had will would can could".split()
    )
    for r in rows:
        assert not (set(r.phrase.split()) & stop), r.phrase
    # degree/freq: 'execution' deg=(3+3) freq=2 → 3.0 per word, phrase = 9.0
    assert by_phrase["adaptive query execution"].rake_score == pytest.approx(9.0, abs=1e-6)


def test_wasserstein_exact_point_mass_transport(spark, tmp_path):
    """All returned mass at 0.10, all kept at 0.00 → W₁ = 0.10 exactly
    (move everything 10 cents); identical distributions → 0; and the
    mean-shift lower bound must hold with equality for point masses."""
    rows = [_li_row(i, "R", 10, 100, 0.10) for i in range(50)] + [
        _li_row(100 + i, "N", 10, 100, 0.00) for i in range(50)
    ]
    r = REGISTRY["wasserstein_distance"].fn(
        spark, _lineitem(spark, tmp_path, rows)
    ).collect()[0]
    assert r.wasserstein == pytest.approx(0.10, abs=1e-9)
    assert r.mean_shift_bound == pytest.approx(0.10, abs=1e-9)
    assert r.bound_holds

    same = [_li_row(i, "R", 10, 100, (i % 3) / 100.0) for i in range(50)] + [
        _li_row(100 + i, "N", 10, 100, (i % 3) / 100.0) for i in range(50)
    ]
    r = REGISTRY["wasserstein_distance"].fn(
        spark, _lineitem(spark, tmp_path, same)
    ).collect()[0]
    assert r.wasserstein == 0.0


def test_energy_distance_brute_force(spark, tmp_path):
    """Energy distance recomputed pairwise in Python must match; identical
    distributions give exactly 0."""
    qa = [5 + i % 3 for i in range(30)]
    qb = [30 + i % 3 for i in range(40)]
    rows = [_li_row(i, "R", q, 100, 0.0) for i, q in enumerate(qa)] + [
        _li_row(100 + i, "N", q, 100, 0.0) for i, q in enumerate(qb)
    ]
    r = REGISTRY["energy_distance"].fn(
        spark, _lineitem(spark, tmp_path, rows)
    ).collect()[0]
    eab = sum(abs(x - y) for x in qa for y in qb) / (len(qa) * len(qb))
    eaa = sum(abs(x - y) for x in qa for y in qa) / (len(qa) ** 2)
    ebb = sum(abs(x - y) for x in qb for y in qb) / (len(qb) ** 2)
    assert r.energy_distance == pytest.approx(2 * eab - eaa - ebb, abs=1e-6)

    same = [_li_row(i, "R", 10 + i % 4, 100, 0.0) for i in range(40)] + [
        _li_row(100 + i, "N", 10 + i % 4, 100, 0.0) for i in range(40)
    ]
    r = REGISTRY["energy_distance"].fn(
        spark, _lineitem(spark, tmp_path, same)
    ).collect()[0]
    assert r.energy_distance == 0.0


def test_cochran_q_brute_force(spark, tmp_path):
    """Q recomputed from the textbook formula on a planted binary table
    (every user clicks ≥15×, none purchases ≥15×, views split) matches."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    patterns = []
    for u in range(24):
        g = (1, 1 if u % 2 == 0 else 0, 0)
        patterns.append(g)
        for typ, flag in zip(("click", "view", "purchase"), g):
            n_ev = 20 if flag else 2
            for i in range(n_ev):
                rows.append((eid, t0 + dt.timedelta(hours=eid % 700), u, typ, 1.0, "{}"))
                eid += 1
    r = REGISTRY["cochran_q"].fn(spark, _events(spark, tmp_path, rows)).collect()[0]
    k = 3
    cols = [sum(p[j] for p in patterns) for j in range(k)]
    t = sum(cols)
    l2 = sum(sum(p) ** 2 for p in patterns)
    q = k * (k - 1) * sum((c - t / k) ** 2 for c in cols) / (k * t - l2)
    assert r.q_stat == pytest.approx(q, abs=1e-4)
    assert r.significant  # click=24, view=12, purchase=0 is a huge split


def test_page_hinkley_detects_planted_level_shift(spark, tmp_path):
    """A 10× jump mid-series must alarm shortly after the shift; a flat
    series must not."""
    days = [f"2024-{1 + i // 28:02d}-{1 + i % 28:02d}" for i in range(84)]
    shift = [(i, 1, 100.0 + (900.0 if i >= 56 else 0.0) + i % 5, days[i]) for i in range(84)]
    r = REGISTRY["page_hinkley"].fn(spark, _orders(spark, tmp_path, shift)).collect()[0]
    assert r.drift_detected
    assert r.first_alarm_day >= "2024-03-01"  # after the day-56 shift

    flat = [(i, 1, 100.0 + i % 5, days[i]) for i in range(84)]
    r = REGISTRY["page_hinkley"].fn(spark, _orders(spark, tmp_path, flat)).collect()[0]
    assert not r.drift_detected and r.first_alarm_day == "none"


def test_pot_gpd_moments_match_hand_computation(spark, tmp_path):
    """MoM GPD fit on a planted tail: xi and sigma recomputed from the
    exceedance mean/variance in Python must match exactly."""
    days = [f"2024-{1 + i // 28:02d}-{1 + i % 28:02d}" for i in range(100)]
    # 95 body days at <=1000, 5 tail days: threshold = 5th largest
    vals = [100.0 + i % 7 for i in range(95)] + [2000.0, 3000.0, 4500.0, 7000.0, 11000.0]
    rows = [(i, 1, vals[i], days[i]) for i in range(100)]
    r = REGISTRY["pot_gpd_fit"].fn(spark, _orders(spark, tmp_path, rows)).collect()[0]
    u = sorted(vals)[-5]  # rank ceil(0.05·100)=5 from the top
    exc = [v - u for v in vals if v > u]
    m = sum(exc) / len(exc)
    s2 = sum(x * x for x in exc) / len(exc) - m * m
    xi = (1 - m * m / s2) / 2
    sigma = m * (m * m / s2 + 1) / 2
    assert r.threshold == u and r.n_exc == len(exc)
    assert r.xi_shape == pytest.approx(xi, abs=1e-4)
    assert r.sigma_scale == pytest.approx(sigma, abs=1e-2)


def test_rbo_full_agreement_is_one_minus_p_pow_depth(spark, tmp_path):
    """When both length penalties produce the SAME ranking (all docs equal
    length), truncated RBO = (1−p)Σp^{d−1} = 1 − p^10 exactly."""
    # every doc same length, distinct tf for 'hash' → identical rankings
    texts = ["hash " * (i + 1) + "pad " * (12 - i) for i in range(12)]
    texts = [" ".join(t.split()[:12]) for t in texts]  # exactly 12 tokens each
    sf = _docs(spark, tmp_path, texts)
    rows = {r.term: r.rbo for r in REGISTRY["rbo_rank_agreement"].fn(spark, sf).collect()}
    assert rows["hash"] == pytest.approx(1 - 0.9 ** 10, abs=1e-5)


def test_synthetic_control_recovers_planted_post_effect(spark, tmp_path):
    """Treated nation tracks the donor pool exactly pre-period, then adds
    +1000/month post: pre_mean_gap ≈ 0 and every post gap ≈ +1000."""
    cust, orders = [], []
    ok = 0
    n_nations, n_months = 6, 12
    for nk in range(n_nations):
        cust.append((nk + 1, f"C{nk}", nk, 100.0, "BUILDING"))
    for mi in range(n_months):
        month = f"2024-{mi + 1:02d}-15"
        for nk in range(n_nations):
            ok += 1
            base = 5000.0  # identical paths → perfect pre fit
            lift = 1000.0 if (nk == 0 and mi >= 6) else 0.0
            orders.append((ok, nk + 1, base + lift, month))
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    rows = REGISTRY["synthetic_control"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 6  # post months
    for r in rows:
        assert r.pre_mean_gap == pytest.approx(0.0, abs=1e-3)
        assert r.gap == pytest.approx(1000.0, abs=1e-3)


def test_markov_entropy_rate_deterministic_vs_uniform_chain(spark, tmp_path):
    """A strictly cyclic chain (A→B→C→A…) has entropy rate 0 and maximal
    predictability gain ln 3; an i.i.d. uniform alternation has H ≈ H₀
    (memory buys nothing)."""
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)
    types = ["click", "view", "purchase"]
    cyc = [
        (i, t0 + dt.timedelta(minutes=i), 1, types[i % 3], 1.0, "{}")
        for i in range(90)
    ]
    r = REGISTRY["markov_entropy_rate"].fn(
        spark, _events(spark, tmp_path, cyc)
    ).collect()[0]
    assert r.entropy_rate == 0.0
    # 89 transitions → from-state counts 30/30/29, so the empirical π̂ sits
    # ~1e-4 off uniform
    assert r.predictability_gain == pytest.approx(math.log(3), abs=1e-3)

    # de Bruijn-ish: every (s, t) pair equally often → p(t|s) uniform
    seq = []
    for a in range(3):
        for b in range(3):
            seq.extend([types[a], types[b]])
    iid = [
        (i, t0 + dt.timedelta(minutes=i), 1, seq[i % len(seq)], 1.0, "{}")
        for i in range(180)
    ]
    r = REGISTRY["markov_entropy_rate"].fn(
        spark, _events(spark, tmp_path, iid)
    ).collect()[0]
    assert r.predictability_gain == pytest.approx(0.0, abs=0.02)


def test_woe_iv_planted_predictive_band(spark, tmp_path):
    """Quantities 41–50 are always returned, the rest never → that band's
    WOE must be hugely negative (good share ≈ 0) and IV large; a flag
    independent of quantity → IV ≈ 0."""
    rows = [
        _li_row(i, "R" if 41 <= 41 + i % 10 else "N", 41 + i % 10, 100, 0.0)
        for i in range(100)
    ] + [_li_row(200 + i, "N", 1 + i % 40, 100, 0.0) for i in range(400)]
    r = {
        (x.band_lo, x.band_hi): x
        for x in REGISTRY["woe_information_value"]
        .fn(spark, _lineitem(spark, tmp_path, rows))
        .collect()
    }
    assert r[(41, 50)].n_good == 0 and r[(41, 50)].woe < -5
    assert r[(41, 50)].information_value > 1.0  # "suspiciously strong"

    indep = [_li_row(i, "R" if i % 5 == 0 else "N", 1 + i % 50, 100, 0.0) for i in range(500)]
    r2 = REGISTRY["woe_information_value"].fn(
        spark, _lineitem(spark, tmp_path, indep)
    ).collect()
    assert all(abs(x.information_value) < 0.05 for x in r2)


def test_poisson_rate_test_brute_force_binomial(spark, tmp_path):
    """p-value recomputed from the exact two-sided Binomial(n, 1/2) tail in
    Python must match: planted 30 early errors vs 10 late."""
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, "error", 1.0, "{}") for i in range(30)
    ] + [
        (100 + i, t0 + dt.timedelta(hours=900 + i), 1, "error", 1.0, "{}")
        for i in range(10)
    ]
    # pad the window so the midpoint falls between the two bursts
    rows.append((999, t0, 2, "view", 1.0, "{}"))
    rows.append((998, t0 + dt.timedelta(hours=1000), 2, "view", 1.0, "{}"))
    r = REGISTRY["poisson_rate_test"].fn(
        spark, _events(spark, tmp_path, rows)
    ).collect()[0]
    assert (r.first_half, r.second_half) == (30, 10)
    n = 40
    probs = [math.comb(n, k) * 0.5**n for k in range(n + 1)]
    p_two = sum(p for p in probs if p <= probs[30] + 1e-15)
    assert r.p_value == pytest.approx(p_two, rel=1e-3)
    assert r.significant


def test_interleave_eval_credits_better_ranker(spark, tmp_path):
    """A corpus where the strongly-length-normalized ranker (B) surfaces
    the relevant short docs higher must be credited: B's relevant docs
    outrank A's on the interleaved list."""
    # short docs with moderate tf (win under b=0.75), long docs with huge
    # tf (win under b=0.25); only the short ones are NOT relevant (tf<4)
    texts = (
        [f"hash hash hash hash hash hash {'pad ' * 200}" for _ in range(6)]  # long, tf=6 rel
        + ["hash hash hash x" for _ in range(6)]  # short, tf=3 not relevant
        + ["join join join join join " + "pad " * 200 for _ in range(3)]
        + ["join join y" for _ in range(3)]
        + ["stream stream stream stream stream " + "pad " * 200 for _ in range(3)]
        + ["stream z" for _ in range(3)]
        + ["spark spark spark spark " + "pad " * 200 for _ in range(3)]
        + ["spark w" for _ in range(3)]
    )
    sf = _docs(spark, tmp_path, texts)
    rows = {r.term: r for r in REGISTRY["interleave_eval"].fn(spark, sf).collect()}
    # relevant docs are the LONG ones — ranker A (mild normalization)
    # places them higher, so A must collect the relevant clicks
    assert rows["__wins__"].winner == "summary"
    total_a = sum(rows[t].clicks_a for t in ("hash", "join", "stream", "spark"))
    total_b = sum(rows[t].clicks_b for t in ("hash", "join", "stream", "spark"))
    assert total_a > total_b


def test_stl_strength_reads_planted_structure(spark, tmp_path):
    """A pure weekly square wave (no trend) → seasonal strength ≈ 1,
    trend strength ≈ 0; a pure ramp (no weekly pattern) → the reverse."""
    import datetime as dt

    # CONSECUTIVE calendar days — the fabricated 28-day months used
    # elsewhere leave real-calendar gaps that break dow alignment
    d0 = dt.date(2024, 1, 1)
    days = [(d0 + dt.timedelta(days=i)).isoformat() for i in range(112)]
    weekly = [(i, 1, 100.0 + (500.0 if i % 7 == 0 else 0.0), days[i]) for i in range(112)]
    r = REGISTRY["stl_strength"].fn(spark, _orders(spark, tmp_path, weekly)).collect()[0]
    assert r.seasonal_strength > 0.95 and r.trend_strength < 0.2

    ramp = [(i, 1, 100.0 + 25.0 * i, days[i]) for i in range(112)]
    r = REGISTRY["stl_strength"].fn(spark, _orders(spark, tmp_path, ramp)).collect()[0]
    assert r.trend_strength > 0.95 and r.seasonal_strength < 0.2


def test_rich_club_planted_hub_clique(spark, tmp_path):
    """A clique of 6 hub parts (every pair co-ordered) plus many degree-1
    spokes: φ must be 1.0 at thresholds the clique survives and the club
    sizes must match."""
    li = []
    # clique: orders 1..15 each pair two hub parts (full K6 = 15 edges)
    import itertools
    hubs = list(range(100, 106))
    for ok, (a, b) in enumerate(itertools.combinations(hubs, 2), start=1):
        li.append((ok, 1, "N", "F", 1.0, 10.0, 0.0, 0.0, a, 1))
        li.append((ok, 2, "N", "F", 1.0, 10.0, 0.0, 0.0, b, 1))
    # spokes: each hub co-ordered once with a unique leaf part
    ok = 100
    for h in hubs:
        for leaf in range(3):
            ok += 1
            li.append((ok, 1, "N", "F", 1.0, 10.0, 0.0, 0.0, h, 1))
            li.append((ok, 2, "N", "F", 1.0, 10.0, 0.0, 0.0, 1000 + h * 10 + leaf, 1))
    sf = _lineitem(spark, tmp_path, li)
    rows = {r.degree_threshold: r for r in REGISTRY["rich_club"].fn(spark, sf).collect()}
    # hubs have degree 5 + 3 = 8 > 4; leaves degree 1 → club at k=4 is K6
    assert rows[4].club_size == 6 and rows[4].club_edges == 15
    assert rows[4].phi == pytest.approx(1.0, abs=1e-9)
    assert rows[8].club_size == 0  # nothing exceeds degree 8


def test_poisson_rate_ratio_exact_mle(spark, tmp_path):
    """Urgent orders planted with exactly 3× the line count: the rate
    ratio must be 3.0 with a tight CI covering it."""
    li, od = [], []
    k = 0
    for g, (nl, n_orders) in enumerate([(9, 60), (3, 60)]):
        for o in range(n_orders):
            k += 1
            pri = "1-URGENT" if g == 0 else "3-MEDIUM"
            od.append((k, 1, 100.0, f"2024-01-{1 + o % 28:02d}", pri))
            for ln in range(nl):
                li.append((k, ln + 1, "N", "F", 1.0, 100.0, 0.0, 0.0, 1, 1))
    spark.createDataFrame(
        od,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    sf = _lineitem(spark, tmp_path, li)
    r = REGISTRY["poisson_rate_ratio"].fn(spark, sf).collect()[0]
    assert r.rate_ratio == pytest.approx(3.0, abs=1e-9)
    assert r.rr_ci_lo < 3.0 < r.rr_ci_hi and r.significant
    assert r.lr_stat > 100  # massive separation


def test_weibull_fit_recovers_exponential_shape(spark, tmp_path):
    """Deterministic exponential-quantile gaps (inverse-CDF ladder) must
    fit k ≈ 1 (the exponential is Weibull k=1) and a compressed
    (less-variable) ladder must fit k > 1."""
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)

    def ladder(stretch):
        # gaps = exponential quantiles at 99 evenly spaced probabilities,
        # raised to 1/stretch: stretch=1 → k≈1, stretch>1 → k≈stretch
        rows, eid, t = [], 0, t0
        for rep in range(3):
            for i in range(1, 100):
                gap_h = (-math.log(1 - i / 100.0)) ** (1.0 / stretch)
                t = t + dt.timedelta(hours=gap_h)
                rows.append((eid, t, 1, "click", 1.0, "{}"))
                eid += 1
        return rows

    r = REGISTRY["weibull_fit"].fn(
        spark, _events(spark, tmp_path, ladder(1.0))
    ).collect()[0]
    assert r.shape_k == pytest.approx(1.0, abs=0.12)

    r = REGISTRY["weibull_fit"].fn(
        spark, _events(spark, tmp_path, ladder(2.0))
    ).collect()[0]
    assert r.shape_k == pytest.approx(2.0, abs=0.25)
    assert not r.decreasing_hazard
