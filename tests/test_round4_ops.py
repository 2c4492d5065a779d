"""Round-3 session-4 behavioral tests: planted-signal and hand-math checks
for the inference staples added this session (cox_ph, friedman_test,
mood_median_test, fleiss_kappa, tost_equivalence)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from candyspark.plans import collect_registry

REGISTRY = collect_registry()


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def _events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _orders(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _customer(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "c_custkey long, c_mktsegment string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    return str(tmp_path)


def _documents(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _lineitem(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_linestatus string, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_partkey long, l_suppkey long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


# ---------------------------------------------------------------------------
# cox_ph
# ---------------------------------------------------------------------------


def _reference_cox(subjects, rounds=50):
    """Textbook per-subject Breslow partial-likelihood Newton (binary x):
    an INDEPENDENT implementation — per-subject loop over risk sets, not
    the engine's relational per-day aggregates."""
    beta = 0.0
    times = sorted({t for t, e, _ in subjects if e})
    for _ in range(rounds):
        u = 0.0
        info = 0.0
        eb = math.exp(beta)
        for td in times:
            d = sum(1 for t, e, _ in subjects if e and t == td)
            s1 = sum(x for t, e, x in subjects if e and t == td)
            r1 = sum(x for t, _, x in subjects if t >= td)
            r0 = sum(1 - x for t, _, x in subjects if t >= td)
            denom = r0 + r1 * eb
            u += s1 - d * r1 * eb / denom
            info += d * r0 * r1 * eb / denom**2
        if info <= 0:
            break
        beta += u / info
    return beta


def test_cox_recovers_planted_hazard_ratio(spark, tmp_path):
    """Early cohort converts twice as fast (subject i at day i; late
    subject j at day 2j): the engine's 4-round Newton must land on the
    textbook per-subject MLE (independent implementation) and report a
    hazard ratio materially above 1 for the early cohort."""
    rows = []
    eid = 0

    def ev(u, day, hour, t):
        nonlocal eid
        eid += 1
        return (eid, f"2024-01-{day:02d} {hour:02d}:00:00", u, t, 1.0, "{}")

    subjects = []
    # early cohort (x=1): signup Jan 1, convert after i days (i = 1..10)
    for i in range(1, 11):
        rows.append(ev(i, 1, 8, "signup"))
        rows.append(ev(i, 1 + i, 8, "purchase"))
        subjects.append((i, 1, 1))
    # late cohort (x=0): signup Jan 5, convert after 2j days (j = 1..10)
    for j in range(1, 11):
        u = 100 + j
        rows.append(ev(u, 5, 8, "signup"))
        rows.append(ev(u, 5 + 2 * j, 8, "purchase"))
        subjects.append((2 * j, 1, 0))
    # horizon far past every conversion so nothing censors
    rows.append(ev(999, 31, 23, "view"))

    out = REGISTRY["cox_ph"].fn(spark, _events(spark, tmp_path, rows)).collect()[0]
    ref = _reference_cox(subjects)
    assert out.n_events == 20
    assert out.beta == pytest.approx(ref, abs=5e-3)
    assert out.hazard_ratio > 1.5  # early cohort converts faster


def test_cox_null_covariate_is_flat(spark, tmp_path):
    """Identical conversion-time distributions in both cohorts → β ≈ 0,
    hazard ratio ≈ 1, score test quiet."""
    rows = []
    eid = 0

    def ev(u, day, t):
        nonlocal eid
        eid += 1
        return (eid, f"2024-01-{day:02d} 08:00:00", u, t, 1.0, "{}")

    for i in range(1, 11):
        rows.append(ev(i, 1, "signup"))
        rows.append(ev(i, 1 + i, "purchase"))
        u = 100 + i
        rows.append(ev(u, 9, "signup"))
        rows.append(ev(u, 9 + i, "purchase"))
    rows.append(ev(999, 31, "view"))
    out = REGISTRY["cox_ph"].fn(spark, _events(spark, tmp_path, rows)).collect()[0]
    assert abs(out.beta) < 0.05
    assert out.hazard_ratio == pytest.approx(1.0, abs=0.05)
    assert out.significant is False


# ---------------------------------------------------------------------------
# friedman_test
# ---------------------------------------------------------------------------


def _month_days(year, month):
    """First 7 dates of a month covering all 7 ISO weekdays (any 7
    consecutive days do)."""
    return [f"{year}-{month:02d}-{d:02d}" for d in range(1, 8)]


def test_friedman_perfect_consistency_reaches_max(spark, tmp_path):
    """Revenue strictly increasing in ISO weekday within every month →
    every block ranks identically and Q hits its algebraic maximum 6n
    (k = 7); with 4 blocks Q = 24 → significant."""
    import datetime as dt

    rows = []
    ok = 0
    for m in range(1, 5):
        for ds in _month_days(2024, m):
            isodow = dt.date.fromisoformat(ds).isoweekday()
            ok += 1
            rows.append((ok, 1, 100.0 * isodow, ds))
    out = REGISTRY["friedman_test"].fn(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert out.n_blocks == 4
    assert out.q_stat == pytest.approx(24.0, abs=1e-9)
    assert out.significant is True


def test_friedman_all_ties_is_zero(spark, tmp_path):
    """Identical revenue on every weekday of every month → all midranks
    equal → Q = 0 exactly, p = 1."""
    rows = []
    ok = 0
    for m in range(1, 4):
        for ds in _month_days(2024, m):
            ok += 1
            rows.append((ok, 1, 500.0, ds))
    out = REGISTRY["friedman_test"].fn(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert out.q_stat == pytest.approx(0.0, abs=1e-9)
    assert out.p_value == pytest.approx(1.0, abs=1e-9)
    assert out.significant is False


def test_friedman_incomplete_months_are_excluded(spark, tmp_path):
    """A month missing a weekday must not enter the block count (the
    balanced-design requirement)."""
    import datetime as dt

    rows = []
    ok = 0
    for m in (1, 2):
        for ds in _month_days(2024, m):
            isodow = dt.date.fromisoformat(ds).isoweekday()
            ok += 1
            rows.append((ok, 1, 100.0 * isodow, ds))
    # March: only 3 weekdays present
    for ds in ("2024-03-04", "2024-03-05", "2024-03-06"):
        ok += 1
        rows.append((ok, 1, 999.0, ds))
    out = REGISTRY["friedman_test"].fn(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert out.n_blocks == 2


# ---------------------------------------------------------------------------
# mood_median_test
# ---------------------------------------------------------------------------


def _li_row(i, flag, qty):
    return (i, 1, flag, "O", float(qty), 100.0, 0.0, 0.0, i, i)


def test_mood_detects_planted_location_shift(spark, tmp_path):
    """Returned quantities all 40-49, kept all 1-10 → every returned row
    sits above the pooled median and χ² is large."""
    rows = [_li_row(i, "R", 40 + i % 10) for i in range(50)]
    rows += [_li_row(100 + i, "N", 1 + i % 10) for i in range(50)]
    out = REGISTRY["mood_median_test"].fn(
        spark, _lineitem(spark, tmp_path, rows)
    ).collect()[0]
    assert out.above_returned == 50 and out.above_kept == 0
    assert out.significant is True


def test_mood_identical_distributions_is_quiet(spark, tmp_path):
    """Same quantity multiset in both groups → χ² = 0 exactly."""
    rows = [_li_row(i, "R", 1 + i % 10) for i in range(50)]
    rows += [_li_row(100 + i, "N", 1 + i % 10) for i in range(50)]
    out = REGISTRY["mood_median_test"].fn(
        spark, _lineitem(spark, tmp_path, rows)
    ).collect()[0]
    assert out.chi2 == pytest.approx(0.0, abs=1e-9)
    assert out.significant is False


# ---------------------------------------------------------------------------
# fleiss_kappa
# ---------------------------------------------------------------------------

_GOOD = ("word " * 50).strip()  # 249 chars, 50 words, alpha 200/249 > 0.6
_BAD = "12345"  # fails all three gates


def test_fleiss_perfect_agreement_is_one(spark, tmp_path):
    """Every document either passes all three gates or fails all three →
    κ = 1 exactly."""
    rows = [(i, _GOOD, "en", "s", len(_GOOD)) for i in range(10)]
    rows += [(100 + i, _BAD, "en", "s", len(_BAD)) for i in range(10)]
    out = REGISTRY["fleiss_kappa"].fn(
        spark, _documents(spark, tmp_path, rows)
    ).collect()[0]
    assert out.kappa == pytest.approx(1.0, abs=1e-9)
    assert out.agreement == "substantial"


def test_fleiss_systematic_disagreement_lowers_kappa(spark, tmp_path):
    """Half the corpus is long digit noise (length gate says keep, word
    and alpha gates say drop): agreement must fall well below the
    perfect-corpus κ and the split must land at exactly n1 = 1."""
    noise = "1" * 250
    rows = [(i, _GOOD, "en", "s", len(_GOOD)) for i in range(10)]
    rows += [(100 + i, noise, "en", "s", len(noise)) for i in range(10)]
    out = REGISTRY["fleiss_kappa"].fn(
        spark, _documents(spark, tmp_path, rows)
    ).collect()[0]
    # 10 docs at n1=3, 10 docs at n1=1: T=40, S=100, n=20
    # p_bar = (100+60-120)/60 = 2/3; p_e = (1600+400)/3600 = 5/9
    assert out.p_bar == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert out.p_e == pytest.approx(5.0 / 9.0, abs=1e-6)
    assert out.kappa == pytest.approx(0.25, abs=1e-6)


# ---------------------------------------------------------------------------
# tost_equivalence
# ---------------------------------------------------------------------------


def test_tost_identical_segments_are_equivalent(spark, tmp_path):
    """Same order-value distribution in both segments with n = 200 per
    side → both one-sided tests clear 1.645 and equivalence is claimed."""
    cust = [(i, "BUILDING") for i in range(200)]
    cust += [(1000 + i, "AUTOMOBILE") for i in range(200)]
    orders = [(i, i, 1000.0 + (i % 20), "2024-01-01") for i in range(200)]
    orders += [
        (1000 + i, 1000 + i, 1000.0 + (i % 20), "2024-01-01") for i in range(200)
    ]
    sf = _orders(spark, tmp_path, orders)
    _customer(spark, tmp_path, cust)
    out = REGISTRY["tost_equivalence"].fn(spark, sf).collect()[0]
    assert out.diff == pytest.approx(0.0, abs=1e-9)
    assert out.equivalent is True


def test_tost_large_gap_is_not_equivalent(spark, tmp_path):
    """Means 30% apart (≫ the ±5% margin) → z_upper goes negative and
    equivalence is refused, however tight the variances."""
    cust = [(i, "BUILDING") for i in range(100)]
    cust += [(1000 + i, "AUTOMOBILE") for i in range(100)]
    orders = [(i, i, 1300.0 + (i % 5), "2024-01-01") for i in range(100)]
    orders += [(1000 + i, 1000 + i, 1000.0 + (i % 5), "2024-01-01") for i in range(100)]
    sf = _orders(spark, tmp_path, orders)
    _customer(spark, tmp_path, cust)
    out = REGISTRY["tost_equivalence"].fn(spark, sf).collect()[0]
    assert out.equivalent is False
    assert out.z_upper < 0


# ---------------------------------------------------------------------------
# dunn_posthoc
# ---------------------------------------------------------------------------


def test_dunn_separates_planted_groups(spark, tmp_path):
    """Discounts: group A all at 1 cent, R all at 9 cents, N split across
    both -> the A-R pair must be strongly significant and signed by the
    rank order (R's mean rank higher)."""
    rows = []
    for i in range(60):
        rows.append((i, 1, "A", "O", 10.0, 100.0, 0.01, 0.0, i, i))
    for i in range(60):
        rows.append((100 + i, 1, "R", "O", 10.0, 100.0, 0.09, 0.0, i, i))
    for i in range(30):
        rows.append((200 + i, 1, "N", "O", 10.0, 100.0, 0.01, 0.0, i, i))
        rows.append((300 + i, 1, "N", "O", 10.0, 100.0, 0.09, 0.0, i, i))
    out = {
        (r.g1, r.g2): r
        for r in REGISTRY["dunn_posthoc"].fn(
            spark, _lineitem_disc(spark, tmp_path, rows)
        ).collect()
    }
    ar = out[("A", "R")]
    assert ar.z < -2.394 and ar.significant_bonferroni is True
    assert ar.mean_rank_g1 < ar.mean_rank_g2
    # N sits exactly between: |z| vs both A and R smaller than the A-R gap
    an, nr = out[("A", "N")], out[("N", "R")]
    assert abs(an.z) < abs(ar.z) and abs(nr.z) < abs(ar.z)


def _lineitem_disc(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_linestatus string, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_partkey long, l_suppkey long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_dunn_identical_groups_are_quiet(spark, tmp_path):
    """Same discount multiset in all three flags -> every pairwise z = 0."""
    rows = []
    k = 0
    for g in ("A", "N", "R"):
        for i in range(30):
            rows.append((k, 1, g, "O", 10.0, 100.0, (i % 5) / 100.0, 0.0, i, i))
            k += 1
    out = REGISTRY["dunn_posthoc"].fn(
        spark, _lineitem_disc(spark, tmp_path, rows)
    ).collect()
    assert all(r.z == pytest.approx(0.0, abs=1e-9) for r in out)


# ---------------------------------------------------------------------------
# distance_correlation
# ---------------------------------------------------------------------------


def test_dcor_linear_relation_is_one(spark, tmp_path):
    """Every order is exactly 100.0, so daily revenue = 100 * daily count:
    distance correlation of a perfect linear relation is 1."""
    rows = []
    ok = 0
    for d in range(1, 29):
        for _ in range(1 + d % 7):
            ok += 1
            rows.append((ok, 1, 100.0, f"2024-01-{d:02d}"))
    out = REGISTRY["distance_correlation"].fn(
        spark, _orders(spark, tmp_path, rows)
    ).collect()[0]
    assert out.dcor == pytest.approx(1.0, abs=1e-6)


def test_dcor_constant_revenue_is_null(spark, tmp_path):
    """One identical order per day -> zero distance variance on both
    axes -> honest NULL, not a 0/0 artifact."""
    rows = [(d, 1, 500.0, f"2024-01-{d:02d}") for d in range(1, 29)]
    out = REGISTRY["distance_correlation"].fn(
        spark, _orders(spark, tmp_path, rows)
    ).collect()[0]
    assert out.dcor is None
    assert out.dvar_orders == pytest.approx(0.0, abs=1e-12)


# ---------------------------------------------------------------------------
# bayesian_ab_beta
# ---------------------------------------------------------------------------


def _exact_p_b_beats_a(xa, na, xb, nb):
    """Independent exact computation: Evan Miller's closed form in pure
    Fraction arithmetic (integer Beta functions are factorials)."""
    from fractions import Fraction
    from math import factorial

    def beta(x, y):
        return Fraction(
            factorial(x - 1) * factorial(y - 1), factorial(x + y - 1)
        )

    aa, ba = xa + 1, na - xa + 1
    ab, bb = xb + 1, nb - xb + 1
    total = Fraction(0)
    for i in range(ab):
        total += beta(aa + i, ba + bb) / ((bb + i) * beta(1 + i, bb) * beta(aa, ba))
    return float(total)


def test_bayesian_ab_matches_exact_fraction_math(spark, tmp_path):
    """The ladder-assembled posterior probability must agree with the
    same closed form computed in exact rational arithmetic."""
    rows = []
    eid = 0
    for u in range(1, 41):
        eid += 1
        rows.append((eid, "2024-01-01 10:00:00", u, "view", 1.0, "{}"))
        if u % 3 == 0:
            eid += 1
            rows.append((eid, "2024-01-02 10:00:00", u, "purchase", 1.0, "{}"))
    out = REGISTRY["bayesian_ab_beta"].fn(
        spark, _events(spark, tmp_path, rows)
    ).collect()[0]
    expected = _exact_p_b_beats_a(out.x_a, out.n_a, out.x_b, out.n_b)
    assert out.p_b_beats_a == pytest.approx(expected, abs=1e-5)
    assert out.n_a + out.n_b == 40


def test_bayesian_ab_dominant_arm_is_decisive(spark, tmp_path):
    """Plant conversions so one md5 arm converts ~90% and the other ~10%
    with 60+ users per arm -> P(B beats A) leaves [0.05, 0.95]."""
    from pyspark.sql import functions as FF

    # discover arm assignment exactly as the engine does
    probe = spark.createDataFrame(
        [(u,) for u in range(1, 201)], "user_id long"
    ).select(
        "user_id",
        (
            FF.conv(
                FF.substring(FF.md5(FF.col("user_id").cast("string")), 1, 8), 16, 10
            ).cast("bigint")
            % 2
        ).alias("arm"),
    )
    arms = {r.user_id: r.arm for r in probe.collect()}
    rows = []
    eid = 0
    for u in range(1, 201):
        eid += 1
        rows.append((eid, "2024-01-01 10:00:00", u, "view", 1.0, "{}"))
        rate = 9 if arms[u] == 1 else 1  # arm B converts 90%, arm A 10%
        if u % 10 < rate:
            eid += 1
            rows.append((eid, "2024-01-02 10:00:00", u, "purchase", 1.0, "{}"))
    out = REGISTRY["bayesian_ab_beta"].fn(
        spark, _events(spark, tmp_path, rows)
    ).collect()[0]
    assert out.p_b_beats_a > 0.95
    assert out.decisive is True
    assert out.posterior_mean_lift > 0.5


# ---------------------------------------------------------------------------
# average_precision_eval
# ---------------------------------------------------------------------------


def test_average_precision_counts_corpus_relevance(spark, tmp_path):
    """A short non-relevant doc (tf=2, dl=4) outscores the long relevant
    one (tf=4, dl=100) under the length-normalized ranker, so the single
    relevant doc lands at position 2: AP = (1/2)/min(R_total=1, 10) = 0.5."""
    rel = "hash " * 4 + "pad " * 96  # tf=4, dl=100 -> relevant
    non = "hash hash is fast"  # tf=2, dl=4 -> scores higher, not relevant
    filler = "nothing to see here"
    rows = [
        (1, rel, "en", "s", len(rel)),
        (2, non, "en", "s", len(non)),
        (3, filler, "en", "s", len(filler)),
    ]
    out = {
        r.term: r
        for r in REGISTRY["average_precision_eval"].fn(
            spark, _documents(spark, tmp_path, rows)
        ).collect()
    }
    assert out["hash"].n_relevant_corpus == 1
    assert out["hash"].ap == pytest.approx(0.5, abs=1e-9)
    assert out["__mean__"].ap == pytest.approx(0.5, abs=1e-9)


def test_average_precision_perfect_ranking_is_one(spark, tmp_path):
    """All relevant docs ranked ahead of every non-relevant one (equal
    lengths, score monotone in tf) -> AP = 1 exactly."""
    docs = []
    for i, tf in enumerate([8, 6, 5, 2, 1]):
        body = "hash " * tf + "pad " * (20 - tf)
        docs.append((i + 1, body, "en", "s", len(body)))
    out = {
        r.term: r
        for r in REGISTRY["average_precision_eval"].fn(
            spark, _documents(spark, tmp_path, docs)
        ).collect()
    }
    assert out["hash"].n_relevant_corpus == 3
    assert out["hash"].ap == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# dickey_fuller / kpss_test
# ---------------------------------------------------------------------------


def test_dickey_fuller_flags_mean_reversion(spark, tmp_path):
    """A hard-alternating series (perfect mean reversion, gamma -> -2)
    must reject the unit root decisively."""
    rows = []
    for d in range(1, 61):
        price = 1000.0 if d % 2 == 0 else 3000.0
        rows.append((d, 1, price + (d % 7), f"2024-{1 + (d - 1) // 28:02d}-{1 + (d - 1) % 28:02d}"))
    out = REGISTRY["dickey_fuller"].fn(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert out.gamma < -1.5
    assert out.tau < -2.86
    assert out.stationary_5pct is True


def test_dickey_fuller_perfect_trend_is_null_tau(spark, tmp_path):
    """y_t = 100t: dy is constant, the regression fits perfectly and
    rss = 0 -> honest NULL tau (the chow_break perfect-fit rule)."""
    rows = [(d, 1, 100.0 * d, f"2024-01-{d:02d}") for d in range(1, 29)]
    out = REGISTRY["dickey_fuller"].fn(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert out.tau is None
    assert out.stationary_5pct is None


def test_kpss_quadrants(spark, tmp_path):
    """The DF/KPSS pairing: a level-stationary pseudo-noise series passes
    KPSS (small eta) while a strong drift fails it (eta >> 0.463)."""
    stat_rows = []
    for d in range(1, 57):
        price = 1000.0 + 700.0 * ((d * 3) % 7)  # bounded pseudo-noise
        stat_rows.append((d, 1, price, f"2024-{1 + (d - 1) // 28:02d}-{1 + (d - 1) % 28:02d}"))
    out = REGISTRY["kpss_test"].fn(spark, _orders(spark, tmp_path, stat_rows)).collect()[0]
    assert out.level_stationary_5pct is True

    drift_rows = [
        (d, 1, 100.0 * d, f"2024-{1 + (d - 1) // 28:02d}-{1 + (d - 1) % 28:02d}")
        for d in range(1, 57)
    ]
    out2 = REGISTRY["kpss_test"].fn(spark, _orders(spark, tmp_path, drift_rows)).collect()[0]
    assert out2.kpss_stat > 0.463
    assert out2.level_stationary_5pct is False


def test_kpss_antipersistent_series_stays_finite(spark, tmp_path):
    """A hard-alternating series pushes the Bartlett long-run variance
    toward 0 (odd-lag autocovariances nearly cancel gamma_0; only window
    edge effects keep it positive) - the statistic must come back finite,
    never inf, and the s2_lr <= 0 guard must not misfire on it."""
    import math

    rows = []
    for d in range(1, 57):
        price = 1000.0 if d % 2 == 0 else 3000.0
        rows.append((d, 1, price, f"2024-{1 + (d - 1) // 28:02d}-{1 + (d - 1) % 28:02d}"))
    out = REGISTRY["kpss_test"].fn(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert out.kpss_stat is not None and math.isfinite(out.kpss_stat)


# ---------------------------------------------------------------------------
# bradley_terry
# ---------------------------------------------------------------------------


def _li_parts(spark, tmp_path, rows, brands):
    """lineitem rows: (orderkey, partkey, qty); part rows: (partkey, brand)."""
    li = spark.createDataFrame(
        [(ok, 1, "N", "O", float(q), 100.0, 0.0, 0.0, pk, 1) for ok, pk, q in rows],
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_linestatus string, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_partkey long, l_suppkey long",
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    p = spark.createDataFrame(
        [(pk, f"n{pk}", b, "t", 1, 1.0) for pk, b in brands],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    p.write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    return str(tmp_path)


def test_bradley_terry_recovers_strict_dominance(spark, tmp_path):
    """A beats B, B beats C, A beats C in every shared order -> strength
    strictly ordered A > B > C with ranks 1, 2, 3."""
    brands = [(1, "A"), (2, "B"), (3, "C")]
    rows = []
    ok = 0
    for _ in range(10):
        ok += 1
        rows += [(ok, 1, 30), (ok, 2, 20), (ok, 3, 10)]
    out = {r.brand: r for r in REGISTRY["bradley_terry"].fn(
        spark, _li_parts(spark, tmp_path, rows, brands)
    ).collect()}
    assert out["A"].strength > out["B"].strength > out["C"].strength
    assert (out["A"].rank, out["B"].rank, out["C"].rank) == (1, 2, 3)
    assert out["A"].wins == 20 and out["C"].wins == 0


def test_bradley_terry_balanced_round_robin_is_uniform(spark, tmp_path):
    """Every pair splits its contests 1-1 -> all strengths equal 1/3."""
    brands = [(1, "A"), (2, "B"), (3, "C")]
    rows = []
    ok = 0
    for hi, lo in [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]:
        ok += 1
        rows += [(ok, hi, 30), (ok, lo, 10)]
    out = REGISTRY["bradley_terry"].fn(
        spark, _li_parts(spark, tmp_path, rows, brands)
    ).collect()
    for r in out:
        assert r.strength == pytest.approx(1.0 / 3.0, abs=1e-6)


# ---------------------------------------------------------------------------
# abc_xyz
# ---------------------------------------------------------------------------


def test_abc_xyz_pins_all_branches(spark, tmp_path):
    """Three brands engineered one per XYZ class (steady / variable /
    sporadic weekly demand) with revenue concentrated on the steady one:
    the matrix must place them in distinct XYZ columns and the revenue
    hog in class A."""
    rows = []
    ok = 0
    # 8 ISO weeks of Mondays: 2024-01-01 is a Monday
    import datetime as dt

    mondays = [dt.date(2024, 1, 1) + dt.timedelta(weeks=w) for w in range(8)]
    # brand X (part 1): identical demand every week, huge price -> class A
    for m in mondays:
        ok += 1
        rows.append((ok, 1, 100, 90000.0, m))
    # brand Y (part 2): alternating 10/30 (cv ~ 0.5-1)
    for i, m in enumerate(mondays):
        ok += 1
        rows.append((ok, 2, 10 if i % 2 == 0 else 30, 100.0, m))
    # brand Z (part 3): one giant spike week (cv > 1)
    ok += 1
    rows.append((ok, 3, 200, 100.0, mondays[0]))
    li = spark.createDataFrame(
        [
            (ok_, 1, "N", "O", float(q), float(px), "N", pk)
            for ok_, pk, q, px, m in [(r[0], r[1], r[2], r[3], r[4]) for r in rows]
            for m in [None]
        ],
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_linestatus string, l_quantity double, l_extendedprice double, "
        "x string, l_partkey long",
    )
    # simpler: build with shipdate directly
    data = [
        (r[0], 1, "N", "O", float(r[2]), float(r[3]), 0.0, 0.0, r[1], 1, str(r[4]))
        for r in rows
    ]
    li = spark.createDataFrame(
        data,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_linestatus string, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_partkey long, l_suppkey long, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("date"))
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    p = spark.createDataFrame(
        [(1, "n1", "BX", "t", 1, 1.0), (2, "n2", "BY", "t", 1, 1.0), (3, "n3", "BZ", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    p.write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    cells = REGISTRY["abc_xyz"].fn(spark, str(tmp_path)).collect()
    matrix = {(r.abc_class, r.xyz_class): r.n_brands for r in cells}
    assert matrix.get(("A", "X")) == 1  # steady revenue hog
    assert sum(n for (a, x), n in matrix.items() if x == "Y") == 1
    assert sum(n for (a, x), n in matrix.items() if x == "Z") == 1


# ---------------------------------------------------------------------------
# newsvendor_stock
# ---------------------------------------------------------------------------


def test_newsvendor_hits_the_critical_fractile(spark, tmp_path):
    """Demands 10,20,...,100 over ten days: the 0.8-fractile
    (percentile_disc) is 80; service level 0.8; expected shortfall
    ((90-80)+(100-80))/10 = 3."""
    rows = []
    for d in range(1, 11):
        rows.append((d, 1, "N", "O", float(10 * d), 100.0, 0.0, 0.0, 1, 1,
                     f"2024-01-{d:02d}"))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_linestatus string, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_partkey long, l_suppkey long, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("date"))
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    p = spark.createDataFrame(
        [(1, "n1", "B1", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    p.write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = REGISTRY["newsvendor_stock"].fn(spark, str(tmp_path)).collect()[0]
    assert out.stock_q80 == 80
    assert out.service_level == pytest.approx(0.8, abs=1e-9)
    assert out.expected_daily_shortfall == pytest.approx(3.0, abs=1e-9)
    assert out.mean_daily_demand == pytest.approx(55.0, abs=1e-9)


# ---------------------------------------------------------------------------
# katz_centrality
# ---------------------------------------------------------------------------


def _katz_reference(edges, rounds=6):
    """Pure-Python mirror of the scale-12 integer iteration."""
    nodes = sorted({v for e in edges for v in e})
    adj = {v: [] for v in nodes}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    x = {v: 10**12 for v in nodes}
    for _ in range(rounds):
        x = {
            v: 10**12 + (sum(x[u] for u in adj[v]) * 2 + 200) // 400
            for v in nodes
        }
    return x


def test_katz_star_matches_integer_reference(spark, tmp_path):
    """A 6-spoke star: the engine's top-25 must equal the pure-Python
    scale-12 integer iteration EXACTLY (bit-exact by construction), with
    the hub on top."""
    rows = []
    ok = 0
    for spoke in range(2, 8):  # orders pairing hub part 1 with each spoke
        ok += 1
        rows.append((ok, 1, 10))
        rows.append((ok, spoke, 10))
    out = {r.partkey: r for r in REGISTRY["katz_centrality"].fn(
        spark, _li_parts(spark, tmp_path, rows, [(i, f"B{i}") for i in range(1, 8)])
    ).collect()}
    ref = _katz_reference([(1, s) for s in range(2, 8)])
    for v, x12 in ref.items():
        assert out[v].katz == pytest.approx(x12 / 1e12, abs=0), f"node {v}"
    assert out[1].rank == 1
    assert out[1].katz > max(out[s].katz for s in range(2, 8))


# ---------------------------------------------------------------------------
# t_closeness
# ---------------------------------------------------------------------------


def _customers_priv(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_acctbal double, c_mktsegment string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    return str(tmp_path)


def test_t_closeness_separates_leaky_class(spark, tmp_path):
    """Global distribution uniform over the four balance bands; class
    (0, SAFE) mirrors it exactly -> t = 0; class (1, LEAK) sits entirely
    in the top band -> its ordered EMD must be large and flagged."""
    rows = []
    k = 0
    bands = [1000.0, 4000.0, 7000.0, 10000.0]  # one per band
    for rep in range(5):
        for b in bands:
            k += 1
            rows.append((k, 0, b, "SAFE"))
    for rep in range(20):
        k += 1
        rows.append((k, 1, 10000.0, "LEAK"))
    out = {
        (r.class_nation, r.class_segment): r
        for r in REGISTRY["t_closeness"].fn(
            spark, _customers_priv(spark, tmp_path, rows)
        ).collect()
    }
    safe = out[("0", "SAFE")]
    leak = out[("1", "LEAK")]
    # global: 5,5,5,25 of 40 -> cums .125 .25 .375 1
    # SAFE: uniform cums .25 .5 .75 1 -> sum|diff| = .125+.25+.375 = .75 -> t=.25
    assert safe.t_distance == pytest.approx(0.25, abs=1e-9)
    # LEAK: cums 0 0 0 1 -> sum|diff| = .125+.25+.375 = .75 -> t=.25? no:
    # |0-.125|+|0-.25|+|0-.375|+0 = .75 -> t = .25 as well by symmetry here
    assert leak.fails_t02 is True and safe.fails_t02 is True
    assert out[("__summary__", "")].t_distance >= leak.t_distance


def test_t_closeness_identical_class_is_zero(spark, tmp_path):
    """A single class IS the global distribution -> t = 0 exactly."""
    rows = [(k, 0, b, "ONLY") for k, b in enumerate([500.0, 3500.0, 6500.0, 9500.0] * 5)]
    out = REGISTRY["t_closeness"].fn(
        spark, _customers_priv(spark, tmp_path, rows)
    ).collect()
    for r in out:
        assert r.t_distance == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# kish_ess
# ---------------------------------------------------------------------------


def test_kish_equal_weights_are_fully_efficient(spark, tmp_path):
    """Identical documents -> identical weights -> ESS = n, deff = 1."""
    text = "solid words " * 30
    rows = [(i, text, "en", "s1", len(text)) for i in range(20)]
    out = {r.source: r for r in REGISTRY["kish_ess"].fn(
        spark, _documents(spark, tmp_path, rows)
    ).collect()}
    assert out["s1"].ess == pytest.approx(20.0, abs=1e-6)
    assert out["s1"].efficiency == pytest.approx(1.0, abs=1e-6)
    assert out["__corpus__"].deff == pytest.approx(1.0, abs=1e-6)


def test_kish_unequal_mixture_loses_efficiency(spark, tmp_path):
    """A corpus mixing high- and low-quality sources must report
    corpus-level efficiency < 1 while each homogeneous source stays 1."""
    good = "solid words " * 30
    bad = "x!!!"
    rows = [(i, good, "en", "good", len(good)) for i in range(10)]
    rows += [(100 + i, bad, "en", "bad", len(bad)) for i in range(10)]
    out = {r.source: r for r in REGISTRY["kish_ess"].fn(
        spark, _documents(spark, tmp_path, rows)
    ).collect()}
    assert out["good"].efficiency == pytest.approx(1.0, abs=1e-6)
    assert out["bad"].efficiency == pytest.approx(1.0, abs=1e-6)
    assert out["__corpus__"].efficiency < 0.95
    assert out["__corpus__"].deff > 1.05


# ---------------------------------------------------------------------------
# theil_inequality
# ---------------------------------------------------------------------------


def test_theil_equal_values_are_zero(spark, tmp_path):
    """Everyone spends the same -> every contribution is exactly 0."""
    cust = [(i, i % 3, 100.0, "SEG") for i in range(30)]
    orders = [(i, i, 5000.0, "2024-01-01") for i in range(30)]
    sf = _orders(spark, tmp_path, orders)
    spark.createDataFrame(
        cust, "c_custkey long, c_nationkey long, c_acctbal double, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = REGISTRY["theil_inequality"].fn(spark, sf).collect()
    for r in out:
        assert r.theil_contrib == pytest.approx(0.0, abs=1e-9)


def test_theil_between_only_decomposes_cleanly(spark, tmp_path):
    """Two nations, equal spend WITHIN each, 4x gap BETWEEN: within
    contributions ~0, between carries the whole index, and the total
    matches the direct textbook T computed in the test."""
    import math

    cust = [(i, 0, 100.0, "SEG") for i in range(10)]
    cust += [(100 + i, 1, 100.0, "SEG") for i in range(10)]
    orders = [(i, i, 1000.0, "2024-01-01") for i in range(10)]
    orders += [(1000 + i, 100 + i, 4000.0, "2024-01-01") for i in range(10)]
    sf = _orders(spark, tmp_path, orders)
    spark.createDataFrame(
        cust, "c_custkey long, c_nationkey long, c_acctbal double, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = {r.nation: r for r in REGISTRY["theil_inequality"].fn(spark, sf).collect()}
    tot = out["__total__"]
    assert abs(tot.within_contrib) < 1e-6
    xs = [1000.0] * 10 + [4000.0] * 10
    mu = sum(xs) / len(xs)
    t_direct = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
    assert tot.theil_contrib == pytest.approx(t_direct, abs=1e-5)
    assert tot.between_contrib == pytest.approx(t_direct, abs=1e-5)


# ---------------------------------------------------------------------------
# mincer_zarnowitz / diebold_mariano
# ---------------------------------------------------------------------------


def test_mz_perfect_forecaster_has_unit_slope(spark, tmp_path):
    """Daily revenue exactly linear in the date: the running-OLS one-step
    forecast is exact, so the MZ regression is y = p with rss = 0 ->
    slope 1, r2 = 1, and the t-test honestly NULL (no noise to test
    against)."""
    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    rows = [
        (d, 1, 1000.0 + 10.0 * d, str(d0 + dt.timedelta(days=d - 1)))
        for d in range(1, 61)
    ]
    out = REGISTRY["mincer_zarnowitz"].fn(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert out.slope == pytest.approx(1.0, abs=1e-6)
    assert out.r2 == pytest.approx(1.0, abs=1e-6)
    assert out.t_slope_vs_1 is None and out.miscalibrated is None


def test_dm_trend_model_beats_naive_on_trending_series(spark, tmp_path):
    """Linear trend plus a small alternating wiggle: the OLS forecaster
    tracks the trend (errors ~1) while the lag-6 naive is off by ~60-70
    every day -> DM decisively negative."""
    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    rows = []
    for d in range(1, 81):
        y = 1000.0 + 10.0 * d + (1.0 if d % 2 == 0 else 0.0)
        rows.append((d, 1, y, str(d0 + dt.timedelta(days=d - 1))))
    out = REGISTRY["diebold_mariano"].fn(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert out.mean_loss_diff < 0
    assert out.dm_stat < -1.96
    assert out.ols_significantly_better is True


# ---------------------------------------------------------------------------
# hosmer_lemeshow
# ---------------------------------------------------------------------------


def _hl_events(spark, tmp_path, flip_eval):
    """Three user tiers with INTERIOR conversion rates (8-view users at
    0.8, 4-view at 0.5, 2-view at 0.2), chosen so the purchase event
    cannot move a user-day across a bin boundary (8/9 -> d_8p, 4/5 ->
    c_4_7, 2/3 -> b_2_3). flip_eval swaps the heavy and light rates in
    the eval half so the train-fitted propensities miss badly."""
    rows = []
    eid = 0
    for day in range(1, 32):
        is_train = day < 16
        for u in range(1, 31):
            tier = (u - 1) // 10  # 0 heavy, 1 medium, 2 light
            n_views = (8, 4, 2)[tier]
            hi_rate = day % 5 != 0  # 80% of days
            mid_rate = day % 2 == 0  # ~50% of days
            lo_rate = day % 5 == 0  # 20% of days
            if tier == 0:
                converts = hi_rate if (is_train or not flip_eval) else lo_rate
            elif tier == 1:
                converts = mid_rate
            else:
                converts = lo_rate if (is_train or not flip_eval) else hi_rate
            for i in range(n_views):
                eid += 1
                rows.append((eid, f"2024-01-{day:02d} {8 + i % 12:02d}:00:00",
                             u, "view", 1.0, "{}"))
            if converts:
                eid += 1
                rows.append((eid, f"2024-01-{day:02d} 21:00:00",
                             u, "purchase", 1.0, "{}"))
    return _events(spark, tmp_path, rows)


def test_hl_calibrated_model_passes(spark, tmp_path):
    """Eval half behaves exactly like the train half -> every bin's
    realized rate equals its fitted propensity -> HL ~ 0."""
    out = REGISTRY["hosmer_lemeshow"].fn(
        spark, _hl_events(spark, tmp_path, flip_eval=False)
    ).collect()[0]
    assert out.n_bins == 3 and out.df == 1
    assert out.hl_stat < 3.841
    assert out.miscalibrated_5pct is False


def test_hl_flipped_eval_fails(spark, tmp_path):
    """Eval-half conversions inverted (heavy users stop converting,
    light users start) -> the train propensities miss every bin -> HL
    huge and flagged."""
    out = REGISTRY["hosmer_lemeshow"].fn(
        spark, _hl_events(spark, tmp_path, flip_eval=True)
    ).collect()[0]
    assert out.hl_stat > 50
    assert out.miscalibrated_5pct is True


# ---------------------------------------------------------------------------
# uplift_deciles
# ---------------------------------------------------------------------------


def test_uplift_concentrates_where_planted(spark, tmp_path):
    """Treatment lifts conversion ONLY among the high-activity half: top
    deciles must show strong positive uplift, bottom deciles ~0, and the
    overall row must sit between."""
    from pyspark.sql import functions as FF

    probe = spark.createDataFrame(
        [(u,) for u in range(1, 201)], "user_id long"
    ).select(
        "user_id",
        (
            FF.conv(
                FF.substring(FF.md5(FF.col("user_id").cast("string")), 1, 8), 16, 10
            ).cast("bigint")
            % 2
        ).alias("arm"),
    )
    arms = {r.user_id: r.arm for r in probe.collect()}
    rows = []
    eid = 0
    for u in range(1, 201):
        heavy = u > 100
        n_views = 12 if heavy else 2
        for i in range(n_views):
            eid += 1
            rows.append((eid, f"2024-01-{1 + i % 28:02d} 09:00:00", u, "view", 1.0, "{}"))
        if heavy and arms[u] == 1:  # uplift only for treated heavy users
            eid += 1
            rows.append((eid, "2024-01-30 10:00:00", u, "purchase", 1.0, "{}"))
    out = {r.decile: r for r in REGISTRY["uplift_deciles"].fn(
        spark, _events(spark, tmp_path, rows)
    ).collect()}
    assert out[10].uplift == pytest.approx(1.0, abs=1e-6)
    assert out[1].uplift == pytest.approx(0.0, abs=1e-6)
    assert 0.0 < out[0].uplift < 1.0  # overall row (decile 0)


# ---------------------------------------------------------------------------
# ivf_probe_curve
# ---------------------------------------------------------------------------


def test_ivf_probe_curve_is_monotone_and_consistent(spark):
    """On the real fixture: per-query recall must be non-decreasing in
    n_probe (probing more lists can only add candidates), and each
    level's __mean__ row (query_id = -1) must equal the mean of its
    per-query rows."""
    rows = REGISTRY["ivf_probe_curve"].fn(spark, "/root/testdata/sf0.001").collect()
    per_q = {}
    means = {}
    for r in rows:
        if r.query_id == -1:
            means[r.n_probe] = r.recall_at_10
        else:
            per_q.setdefault(r.query_id, {})[r.n_probe] = r.recall_at_10
    for q, by_level in per_q.items():
        assert by_level[1] <= by_level[2] <= by_level[4], f"query {q}"
    for level in (1, 2, 4):
        vals = [by[level] for by in per_q.values()]
        assert means[level] == pytest.approx(sum(vals) / len(vals), abs=1e-3)
    assert means[4] >= means[1]


# ---------------------------------------------------------------------------
# conformal_coverage
# ---------------------------------------------------------------------------


def _daily_orders(spark, tmp_path, ys):
    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    rows = [
        (i + 1, 1, float(y), str(d0 + dt.timedelta(days=i))) for i, y in enumerate(ys)
    ]
    return _orders(spark, tmp_path, rows)


def test_conformal_coverage_holds_under_exchangeability(spark, tmp_path):
    """Stationary bounded noise around a trend: the 90% interval
    calibrated on one window must cover ~90%+ of the untouched test
    window."""
    ys = [1000.0 + 10.0 * d + 30.0 * ((d * 7) % 11) for d in range(120)]
    out = REGISTRY["conformal_coverage"].fn(
        spark, _daily_orders(spark, tmp_path, ys)
    ).collect()[0]
    assert out.coverage >= 0.8
    assert out.undercovers is False


def test_conformal_coverage_detects_regime_break(spark, tmp_path):
    """Noise amplitude explodes 40x inside the test quarter: residuals
    blow past the calibrated quantile and the audit must flag
    undercoverage."""
    ys = []
    for d in range(120):
        amp = 30.0 if d < 90 else 1200.0
        ys.append(1000.0 + 10.0 * d + amp * ((d * 7) % 11))
    out = REGISTRY["conformal_coverage"].fn(
        spark, _daily_orders(spark, tmp_path, ys)
    ).collect()[0]
    assert out.coverage < 0.5
    assert out.undercovers is True


# ---------------------------------------------------------------------------
# pinball_loss
# ---------------------------------------------------------------------------


def test_pinball_hand_values_and_quantile_optimality(spark, tmp_path):
    """Demands 10..100: L(q80=80) = 8.0 and L(mean=55) = 12.5 by hand;
    the quantile rule must win at tau = 0.8."""
    rows = []
    for d in range(1, 11):
        rows.append((d, 1, "N", "O", float(10 * d), 100.0, 0.0, 0.0, 1, 1,
                     f"2024-01-{d:02d}"))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_linestatus string, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_partkey long, l_suppkey long, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("date"))
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "n1", "B1", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = REGISTRY["pinball_loss"].fn(spark, str(tmp_path)).collect()[0]
    assert out.s_q80 == 80 and out.s_mean == pytest.approx(55.0, abs=1e-9)
    assert out.pinball_q80 == pytest.approx(8.0, abs=1e-9)
    assert out.pinball_mean == pytest.approx(12.5, abs=1e-9)
    assert out.quantile_rule_wins is True


# ---------------------------------------------------------------------------
# mi_feature_ranking
# ---------------------------------------------------------------------------


def test_mi_ranking_finds_the_informative_feature(spark, tmp_path):
    """Return flag perfectly determined by line status (and nothing
    else): line_status must rank 1 with MI = ln 2 (balanced labels);
    constant features measure exactly 0."""
    import math

    rows = []
    for i in range(100):
        returned = i % 2 == 0
        rows.append((
            i, 1, "R" if returned else "N", "F" if returned else "O",
            10.0, 100.0, 0.05, 0.0, 1, 1, "2024-01-03",
        ))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_linestatus string, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_partkey long, l_suppkey long, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("date"))
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.feature: r for r in REGISTRY["mi_feature_ranking"].fn(
        spark, str(tmp_path)
    ).collect()}
    assert out["line_status"].rank == 1
    assert out["line_status"].mi == pytest.approx(math.log(2), abs=1e-6)
    for f in ("discount_cents", "quantity_band", "ship_dow"):
        assert out[f].mi == pytest.approx(0.0, abs=1e-9), f


# ---------------------------------------------------------------------------
# pq_recall / centered_anisotropy
# ---------------------------------------------------------------------------


def _embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_pq_rerank_recovers_exact_topk_when_shortlist_covers(spark, tmp_path):
    """48 vectors = 16 distinct +-1 bases (the codebook seeds) plus exact
    copies: the 50-wide shortlist covers the whole corpus, so the rerank
    stage IS the exact ranking -> rerank recall exactly 1.0; ADC, scoring
    on exact reconstructions, stays high."""
    import random

    rng = random.Random(7)
    bases = [
        [float(rng.choice([-1.0, 1.0])) for _ in range(64)] for _ in range(16)
    ]
    rows = [(k, bases[k], "b") for k in range(16)]
    rows += [(16 + k, bases[k % 16], "c") for k in range(32)]
    out = REGISTRY["pq_recall"].fn(
        spark, _embeddings(spark, tmp_path, rows)
    ).collect()
    rerank = [r for r in out if r.stage == "rerank"]
    adc = [r for r in out if r.stage == "adc"]
    assert all(r.recall_at_10 == pytest.approx(1.0, abs=1e-9) for r in rerank)
    assert sum(r.recall_at_10 for r in adc) / len(adc) >= 0.8


def test_pq_rerank_never_below_adc_on_fixture(spark):
    """Reranking a superset with the exact metric cannot lose to the
    ADC-only ranking: per query, rerank recall >= adc recall (real
    fixture, both SF-independent relations)."""
    out = REGISTRY["pq_recall"].fn(spark, "/root/testdata/sf0.001").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, {})[r.stage] = r.recall_at_10
    for q, d in by_q.items():
        assert d["rerank"] >= d["adc"], f"query {q}"


def test_centered_anisotropy_collapses_planted_cone(spark, tmp_path):
    """Vectors = big common mean + small distinct-direction noise: raw
    pair cosine ~1 (the cone), centered cosine must collapse toward 0
    and the helps flag must fire."""
    rows = []
    for k in range(128):  # two per bucket so every bucket yields a pair;
        v = [10.0] * 64
        # the pair-mates (k, k+64) get DIFFERENT noise directions
        v[(k + k // 64) % 64] += 5.0
        rows.append((k, [float(x) for x in v], "c"))
    out = REGISTRY["centered_anisotropy"].fn(
        spark, _embeddings(spark, tmp_path, rows)
    ).collect()[0]
    assert out.mean_cos_raw > 0.9
    assert abs(out.mean_cos_centered) < 0.3
    assert out.centering_helps is True


# ---------------------------------------------------------------------------
# code_detector
# ---------------------------------------------------------------------------

_CODE_BLOB = (
    "def process(items):\n"
    "    total = 0;\n"
    "    for x in items:\n"
    "        if (x > 0):\n"
    "            total = total + x;\n"
    "    return total\n"
    "class Runner:\n"
    "    import os\n"
    "    def run(self):\n"
    "        result = process([1, 2, 3]);\n"
    "        return result\n"
)
_PROSE = "the quick brown fox jumps over the lazy dog and keeps on running all day"


def test_code_detector_separates_code_from_prose(spark, tmp_path):
    rows = [(i, _CODE_BLOB, "en", "code_src", len(_CODE_BLOB)) for i in range(5)]
    rows += [(10 + i, _PROSE, "en", "prose_src", len(_PROSE)) for i in range(5)]
    out = {r.source: r for r in REGISTRY["code_detector"].fn(
        spark, _documents(spark, tmp_path, rows)
    ).collect()}
    assert out["code_src"].code_share == pytest.approx(1.0, abs=1e-9)
    assert out["prose_src"].code_share == pytest.approx(0.0, abs=1e-9)
    assert out["code_src"].mean_code_score > 0.5 > out["prose_src"].mean_code_score


# ---------------------------------------------------------------------------
# did_placebo
# ---------------------------------------------------------------------------


def _did_events(spark, tmp_path, treated_rise_everywhere):
    """Span 2024-01-01..2024-01-28 (quarters = weeks). Control users buy
    value 10 every week. Treated users (who click once) buy 10 in the
    pre half and 30 in the post half - or rise 10/20/30/40 across ALL
    quarters when treated_rise_everywhere (the broken-pretrend world)."""
    rows = []
    eid = 0
    for u in range(1, 21):
        treated = u <= 10
        if treated:
            eid += 1
            rows.append((eid, "2024-01-02 09:00:00", u, "click", 1.0, "{}"))
        for q in range(4):
            day = 2 + q * 7  # one purchase per quarter
            if treated:
                val = (
                    10.0 * (q + 1)
                    if treated_rise_everywhere
                    else (10.0 if q < 2 else 30.0)
                )
            else:
                val = 10.0
            eid += 1
            rows.append((eid, f"2024-01-{day:02d} 12:00:00", u, "purchase", val, "{}"))
    # span-pinning sentinel is a BALANCED control user (one value-10
    # purchase per quarter, endpoints included) so it shifts no cell mean
    for ts in ("2024-01-01 00:00:00", "2024-01-09 12:00:00",
               "2024-01-16 12:00:00", "2024-01-28 23:00:00"):
        eid += 1
        rows.append((eid, ts, 999, "purchase", 10.0, "{}"))
    return _events(spark, tmp_path, rows)


def test_did_placebo_quiet_under_parallel_pretrends(spark, tmp_path):
    out = REGISTRY["did_placebo"].fn(
        spark, _did_events(spark, tmp_path, treated_rise_everywhere=False)
    ).collect()[0]
    assert out.placebo_did == pytest.approx(0.0, abs=1e-6)
    assert out.did > 10.0
    assert out.pretrend_ok is True


def test_did_placebo_flags_diverging_pretrends(spark, tmp_path):
    out = REGISTRY["did_placebo"].fn(
        spark, _did_events(spark, tmp_path, treated_rise_everywhere=True)
    ).collect()[0]
    assert out.placebo_did > 5.0
    assert out.pretrend_ok is False
