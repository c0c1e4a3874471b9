"""Independent (non-oracle) references for the statmining queries:
pure-Python CUSUM / z-test / dominance checks on tiny fixtures —
third-party to BOTH the Spark plan and the DuckDB replay, so a shared
design bug in the two cannot hide."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from env_data_pipeline_spark.plans.statmining import (
    _AB_MIN_PURCHASES,
    events_ab_test_zstat,
    events_cusum_changepoint,
    part_price_size_skyline,
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    """10 days at value 10.0 then 10 days at 30.0, one event per day:
    |S| peaks exactly at the seam (day 10), and the segment means
    recover the two levels."""
    rows = []
    for d in range(20):
        rows.append(
            (
                d,
                dt.datetime(2024, 1, 1) + dt.timedelta(days=d),
                1,
                "click",
                10.0 if d < 10 else 30.0,
                "{}",
            )
        )
    _write_events(spark, tmp_path, rows)
    got = events_cusum_changepoint(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.change_day == "2024-01-10"
    assert r.days_before == 10 and r.n_days == 20
    assert r.mean_before == 10.0 and r.mean_after == 30.0
    # |S| at the seam: 10 days * (10 - 20) on the value*1e7 grid
    assert r.s_max_units == 10 * 10 * 10_000_000


def test_cusum_python_replay_on_irregular_days(spark, tmp_path):
    """Multi-event days + two types: replay the integer-grid CUSUM in
    pure Python and compare the argmax day per type."""
    vals = {
        "click": [3.0, 4.5, 4.5, 9.0, 9.5, 9.0, 8.5],
        "view": [100.0, 2.0, 50.0, 49.0, 51.0, 2.0, 100.0],
    }
    rows, eid = [], 0
    for typ, series in vals.items():
        for d, v in enumerate(series):
            for k in range(d % 3 + 1):  # 1-3 events per day
                rows.append(
                    (
                        eid,
                        dt.datetime(2024, 3, 1) + dt.timedelta(days=d),
                        1,
                        typ,
                        v + k,  # intra-day spread
                        "{}",
                    )
                )
                eid += 1
    _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_cusum_changepoint(spark, str(tmp_path)).collect()}

    for typ, series in vals.items():
        days = {}
        for d, v in enumerate(series):
            units = [
                math.floor((v + k) * 10000 + 0.5) for k in range(d % 3 + 1)
            ]
            days[d] = (sum(units) * 1000) // len(units)
        ms = [days[d] for d in sorted(days)]
        mbar = sum(ms) // len(ms)
        best = None
        cum = 0
        for i, m in enumerate(ms, start=1):
            cum += m
            s = abs(cum - i * mbar)
            if best is None or s > best[0]:
                best = (s, i)
        assert got[typ].days_before == best[1], typ
        assert got[typ].s_max_units == best[0], typ


def test_ab_zstat_matches_closed_form(spark, tmp_path):
    """Hash-split + conversion threshold replayed in pure Python; the
    z statistic must match the closed form to the rounded digit."""
    rows, eid = [], 0
    for uid in range(40):
        n_purch = uid % 25  # users 12..24 convert in their residue class
        for k in range(n_purch):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 5, 1, k % 24),
                    uid,
                    "purchase",
                    1.0,
                    "{}",
                )
            )
            eid += 1
        rows.append(
            (eid, dt.datetime(2024, 5, 2), uid, "view", 1.0, "{}")
        )
        eid += 1
    _write_events(spark, tmp_path, rows)
    got = events_ab_test_zstat(spark, str(tmp_path)).collect()[0]

    stats = {0: [0, 0], 1: [0, 0]}
    for uid in range(40):
        v = int(hashlib.md5(str(uid).encode()).hexdigest()[:12], 16) % 2
        stats[v][0] += 1
        stats[v][1] += int(uid % 25 >= _AB_MIN_PURCHASES)
    (nc, cc), (nt, ct) = stats[0], stats[1]
    assert (got.n_control, got.conv_control) == (nc, cc)
    assert (got.n_treatment, got.conv_treatment) == (nt, ct)
    pool = (cc + ct) / (nc + nt)
    z = (ct / nt - cc / nc) / math.sqrt(
        pool * (1 - pool) * (1 / nc + 1 / nt)
    )
    assert got.z_stat == round(z, 4)
    assert got.significant == (abs(z) > 1.96)
    assert got.degenerate is False


def test_ab_zstat_empty_arm_is_degenerate(spark, tmp_path):
    """A corpus whose md5 split leaves one arm empty must yield NULL
    rate/z/significant plus degenerate=true — not NaN from a division
    by zero (ADVICE r9)."""
    # uid=0 hashes to variant 1 (treatment); a single-user corpus
    # leaves the control arm empty.
    assert int(hashlib.md5(b"0").hexdigest()[:12], 16) % 2 == 1
    rows = [
        (k, dt.datetime(2024, 5, 1, k % 24), 0, "purchase", 1.0, "{}")
        for k in range(_AB_MIN_PURCHASES)
    ]
    _write_events(spark, tmp_path, rows)
    got = events_ab_test_zstat(spark, str(tmp_path)).collect()[0]
    assert (got.n_control, got.conv_control) == (0, 0)
    assert (got.n_treatment, got.conv_treatment) == (1, 1)
    assert got.rate_treatment == 1.0
    assert got.rate_control is None
    assert got.z_stat is None
    assert got.significant is None
    assert got.degenerate is True


def test_skyline_matches_bruteforce(spark, tmp_path):
    """Windowed-bucket skyline == quadratic dominance filter, on a
    fixture with duplicate prices, duplicate (price, size) pairs, and
    cross-bucket dominance (bucket width is $5 = 500 cents)."""
    parts = [
        # (partkey, price, size)
        (1, 900.00, 30),
        (2, 900.00, 30),  # duplicate pair: both stay
        (3, 900.00, 40),  # same price, bigger: dominated by 1/2
        (4, 901.00, 25),
        (5, 906.00, 24),  # next bucket; beats 4 on size
        (6, 906.00, 26),  # dominated by 4 (cheaper, smaller)
        (7, 950.00, 1),
        (8, 960.00, 1),  # dominated by 7 across buckets
        (9, 949.99, 2),
        (10, 970.00, 50),  # dominated by everything cheaper+smaller
    ]
    rows = [(k, f"part{k}", "B", "T", s, p) for k, p, s in parts]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))

    got = {r.partkey for r in part_price_size_skyline(spark, str(tmp_path)).collect()}

    def dominated(a):
        ka, pa, sa = a
        ca = math.floor(pa * 100 + 0.5)
        for kb, pb, sb in parts:
            cb = math.floor(pb * 100 + 0.5)
            if (cb < ca and sb <= sa) or (cb == ca and sb < sa):
                return True
        return False

    expect = {k for (k, p, s) in parts if not dominated((k, p, s))}
    assert got == expect == {1, 2, 4, 5, 7, 9}


def test_km_survival_textbook_fixture(spark, tmp_path):
    """Hand-computed product-limit estimate on a 5-order cohort with
    interleaved censoring (events at t=1,3,5; censored at t=2,4):
    S(1)=4/5, S(3)=4/5*2/3, S(5)=0 (last at-risk order ships)."""
    import datetime as dt

    from env_data_pipeline_spark.plans.statmining import orders_ship_survival_km

    day = dt.timedelta(days=1)
    cutoff = dt.datetime(1998, 1, 1)
    orders = [
        (1, dt.datetime(1997, 12, 1)),   # event t=1
        (2, cutoff - 2 * day),           # censored t=2
        (3, dt.datetime(1997, 12, 5)),   # event t=3
        (4, cutoff - 4 * day),           # censored t=4
        (5, dt.datetime(1997, 12, 10)),  # event t=5
    ]
    ships = {
        1: orders[0][1] + 1 * day,
        2: cutoff + 31 * day,
        3: orders[2][1] + 3 * day,
        4: cutoff + 60 * day,
        5: orders[4][1] + 5 * day,
    }
    spark.createDataFrame(
        [(k, "1-URGENT", od) for k, od in orders],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(k, ships[k]) for k, _ in orders],
        "l_orderkey long, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = [
        (r.t_days, r.n_risk, r.n_events, r.survival)
        for r in orders_ship_survival_km(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (1, 5, 1, 0.8),
        (3, 3, 1, round(0.8 * (2 / 3), 4)),
        (5, 1, 1, 0.0),
    ]


def test_entropy_and_hhi_degenerate_and_uniform_cases(spark, tmp_path):
    """Entropy/HHI sanity on planted distributions: one nation buys a
    single part type (H=0, norm NULL), another splits revenue evenly
    over four types (norm=1); a nation with a monopoly supplier has
    HHI=1.0, an even 4-way split has HHI=0.25."""
    import datetime as dt

    from env_data_pipeline_spark.plans.statmining import (
        nation_parttype_entropy,
        nation_supplier_hhi,
    )

    ts = dt.datetime(1997, 1, 1)
    spark.createDataFrame(
        [(0, "MONO", 0), (1, "EVEN", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(1, "c1", 0, 0.0, "B"), (2, "c2", 1, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(
        [(10, 1, "O", 0.0, ts, "1-URGENT"), (20, 2, "O", 0.0, ts, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(k, f"p{k}", "B", f"type{k}", 1, 0.0) for k in (1, 2, 3, 4)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    spark.createDataFrame(
        [(s, f"s{s}", 0 if s == 1 else 1, 0.0) for s in (1, 2, 3, 4, 5)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "supplier.parquet")
    )
    # MONO nation (cust 1): 4 lines all of part 1, supplier 1.
    # EVEN nation (cust 2): one line in each of parts 1-4 at equal
    # revenue, suppliers 2-5.
    li = [(10, 1, 1, i, 1.0, 100.0, 0.0, 0.0, "N", "O", ts) for i in range(4)]
    li += [(20, k, k + 1, k, 1.0, 100.0, 0.0, 0.0, "N", "O", ts) for k in (1, 2, 3, 4)]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )

    ent = {r.nation: r for r in nation_parttype_entropy(spark, str(tmp_path)).collect()}
    assert ent["MONO"].n_types == 1
    assert ent["MONO"].entropy_nats == -0.0 or ent["MONO"].entropy_nats == 0.0
    assert ent["MONO"].entropy_norm is None
    assert ent["EVEN"].n_types == 4
    assert ent["EVEN"].entropy_norm == 1.0

    hhi = {r.nation: r for r in nation_supplier_hhi(spark, str(tmp_path)).collect()}
    assert hhi["MONO"].n_suppliers == 1 and hhi["MONO"].hhi == 1.0
    assert hhi["EVEN"].n_suppliers == 4 and hhi["EVEN"].hhi == 0.25


def test_zipf_slope_on_synthetic_power_law(spark, tmp_path):
    """A corpus built with token frequencies f(r) = 1000/r must fit
    slope ~ -1 with r^2 ~ 1; a uniform corpus fits slope ~ 0."""
    from env_data_pipeline_spark.plans.textstats import text_zipf_fit

    docs = []
    words_pl = []
    for r in range(1, 41):
        words_pl += [f"w{r:03d}"] * (1000 // r)
    docs.append((1, " ".join(words_pl), "pl", "s", len(words_pl)))
    uni = []
    for r in range(40):
        uni += [f"u{r:03d}"] * 25
    docs.append((2, " ".join(uni), "un", "s", len(uni)))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {r.lang: r for r in text_zipf_fit(spark, str(tmp_path)).collect()}
    assert -1.05 < got["pl"].zipf_slope < -0.95
    assert got["pl"].r_squared > 0.99
    assert abs(got["un"].zipf_slope) < 0.01


def test_mann_kendall_matches_python_reference(spark, tmp_path):
    """Planted monotonic and flat series, with a pure-Python S /
    tie-corrected variance / z replay: an increasing series must be
    flagged, a constant one must be degenerate."""
    import math

    from env_data_pipeline_spark.plans.statmining import (
        events_mann_kendall_trend,
    )

    series = {
        "up": [1.0 * d for d in range(25)],       # strictly increasing
        "flat": [5.0] * 25,                       # all tied -> degenerate
        "wiggle": [3.0, 7.0, 1.0, 9.0, 2.0] * 5,  # no trend
        "oneday": [4.0],                          # single day: no pairs
    }
    rows, eid = [], 0
    for typ, vals in series.items():
        for d, v in enumerate(vals):
            rows.append(
                (eid, dt.datetime(2024, 6, 1) + dt.timedelta(days=d), 1, typ, v, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_mann_kendall_trend(spark, str(tmp_path)).collect()}

    for typ, vals in series.items():
        ms = [math.floor(v * 10000 + 0.5) * 1000 for v in vals]
        n = len(ms)
        s = sum(
            (1 if ms[j] > ms[i] else -1 if ms[j] < ms[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = {}
        for m in ms:
            ties[m] = ties.get(m, 0) + 1
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        r = got[typ]
        assert r.s_stat == s and r.n_days == n
        if var18 <= 0:
            assert r.trend == "degenerate" and r.z_stat is None
        else:
            z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var18 / 18.0) if s else 0.0
            assert r.z_stat == round(z, 4)
    assert got["up"].trend == "increasing"
    assert got["flat"].trend == "degenerate"
    assert got["wiggle"].trend == "no_trend"
    # a type with zero day pairs must surface as degenerate, not vanish
    assert got["oneday"].trend == "degenerate"
    assert got["oneday"].s_stat == 0 and got["oneday"].n_days == 1


def test_heaps_fit_on_synthetic_growth(spark, tmp_path):
    """A source whose every token is globally unique fits beta ~ 1
    (vocabulary == text); a source cycling a fixed 20-word vocabulary
    over many docs fits beta near 0."""
    from env_data_pipeline_spark.plans.textstats import text_heaps_fit

    docs, did = [], 0
    tok = 0
    for _ in range(30):
        words_u = [f"u{tok + i}" for i in range(20)]
        tok += 20
        docs.append((did, " ".join(words_u), "en", "uniq", 0))
        did += 1
    fixed = [f"f{i}" for i in range(20)]
    for d in range(30):
        docs.append((did, " ".join(fixed), "en", "tmpl", 0))
        did += 1
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {r.source: r for r in text_heaps_fit(spark, str(tmp_path)).collect()}
    assert got["uniq"].heaps_beta > 0.98
    assert got["tmpl"].heaps_beta < 0.2


def _truncdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — Spark `div` and DuckDB
    `//` semantics (both verified on negative operands in r10)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_holt_matches_python_fold(spark, tmp_path):
    """Holt recursion replayed in pure Python (truncating dyadic
    updates on the 1e7 grid) on a two-type fixture with an up-trend
    and a noisy flat series; single-day degenerate type included."""
    import math as _m

    from env_data_pipeline_spark.plans.statmining import (
        _HOLT_H,
        events_holt_trend_forecast,
    )

    vals = {
        "click": [10.0, 12.0, 14.5, 16.0, 18.5, 20.0],
        "view": [50.0, 48.0, 51.5, 49.0, 50.5],
        "signup": [7.25],
    }
    rows, eid = [], 0
    for typ, series in vals.items():
        for d, v in enumerate(series):
            for k in range(d % 2 + 1):
                rows.append(
                    (
                        eid,
                        dt.datetime(2024, 2, 1) + dt.timedelta(days=d),
                        1,
                        typ,
                        v + k,
                        "{}",
                    )
                )
                eid += 1
    _write_events(spark, tmp_path, rows)
    got = {
        r.event_type: r
        for r in events_holt_trend_forecast(spark, str(tmp_path)).collect()
    }
    for typ, series in vals.items():
        ms = []
        for d, v in enumerate(series):
            units = [
                _m.floor((v + k) * 10000 + 0.5) for k in range(d % 2 + 1)
            ]
            ms.append(_truncdiv(sum(units) * 1000, len(units)))
        l, b = ms[0], 0
        for x in ms[1:]:
            l_new = _truncdiv(x + l + b, 2)
            b = _truncdiv(l_new - l + b, 2)
            l = l_new
        r = got[typ]
        assert r.n_days == len(series), typ
        assert r.level == round(l / 1e7, 4), typ
        assert r.trend_per_day == round(b / 1e7, 4), typ
        assert getattr(r, f"forecast_{_HOLT_H}d") == round(
            (l + _HOLT_H * b) / 1e7, 4
        ), typ
    # the up-trend must register positive, the flat one near zero
    assert got["click"].trend_per_day > 0.5
    assert abs(got["view"].trend_per_day) < 1.0
    assert got["signup"].trend_per_day == 0.0
    assert got["signup"].level == got["signup"].forecast_7d


def test_did_uplift_matches_cell_means(spark, tmp_path):
    """Planted 2x2 panel: control flat at 100->110 (+10 trend),
    treatment 200->260 (+60) -> DiD = +50 exactly."""
    from env_data_pipeline_spark.plans.statmining import promo_did_uplift

    parts = [(1, "PROMO BRUSHED"), (2, "STANDARD POLISHED")]
    spark.createDataFrame(
        parts, "p_partkey long, p_type string"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    pre = dt.datetime(1994, 1, 1)
    post = dt.datetime(1996, 1, 1)
    li = [
        # (partkey, shipdate, extprice, discount)
        (1, pre, 200.0, 0.0),
        (1, pre, 200.0, 0.0),
        (1, post, 260.0, 0.0),
        (2, pre, 100.0, 0.0),
        (2, post, 110.0, 0.0),
        (2, post, 110.0, 0.0),
    ]
    spark.createDataFrame(
        li,
        "l_partkey long, l_shipdate timestamp, l_extendedprice double,"
        " l_discount double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = promo_did_uplift(spark, str(tmp_path)).collect()[0]
    assert (r.n_treat_pre, r.n_treat_post) == (2, 1)
    assert (r.n_control_pre, r.n_control_post) == (1, 2)
    assert r.mean_treat_pre == 200.0 and r.mean_treat_post == 260.0
    assert r.mean_control_pre == 100.0 and r.mean_control_post == 110.0
    assert r.did_uplift == 50.0


def test_priority_sample_exact_when_k_covers_all(spark, tmp_path):
    """With fewer items than k there is no tau row — the estimator
    must degrade to the exact sum (sample IS the population)...
    except the current contract REQUIRES a (k+1)-th row; this fixture
    instead plants k+1 <= n items and checks the DLT invariants:
    estimate >= sample weight sum, err_permille consistent, and the
    Python replay of priorities/tau/estimator matches exactly."""
    from env_data_pipeline_spark.plans.statmining import (
        _PRI_K,
        _PRI_U_GRID,
        lineitem_priority_sample_estimate,
    )

    n = _PRI_K + 200
    li = [
        (i, 1, 10.0 + (i % 97), 0.0)
        for i in range(1, n + 1)
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_linenumber long, l_extendedprice double,"
        " l_discount double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = lineitem_priority_sample_estimate(spark, str(tmp_path)).collect()[0]

    items = []
    total = 0
    for okey, ln, price, disc in li:
        item_id = okey * 10 + ln
        wt = math.floor(price * (1 - disc) * 10000 + 0.5)
        total += wt
        u = (
            int(hashlib.md5(str(item_id).encode()).hexdigest()[:12], 16)
            % _PRI_U_GRID
            + 1
        )
        items.append((item_id, wt, (wt * _PRI_U_GRID) // u))
    items.sort(key=lambda t: (-t[2], t[0]))
    tau = items[_PRI_K][2]
    est = sum(max(wt, tau) for _, wt, _ in items[:_PRI_K])
    assert r.exact_units == total
    assert r.estimate_units == est
    assert r.err_permille == abs(est - total) * 1000 // total
    # sanity: a 1000-of-1200 priority sample estimates within 25%
    assert r.err_permille <= 250


def test_price_elasticity_matches_numpy(spark, tmp_path):
    """Planted constant-elasticity demand (q = C * p^-1.5 exactly at
    integer grid points): the per-brand OLS must recover the slope to
    the quantization error, matching a numpy polyfit replay of the
    identical quantized points."""
    import numpy as np

    from env_data_pipeline_spark.plans.statmining import (
        _ELAS_LN_GRID,
        part_price_elasticity,
    )

    parts, li = [], []
    lid = 0
    for pk, cents in enumerate([10000, 20000, 40000, 80000, 160000], 1):
        parts.append((pk, "Brand#11"))
        price = cents / 100.0
        q = round(1e9 / (cents ** 1.5))
        for _ in range(2):  # two lineitems per part, same price
            li.append((pk, price, q / 2.0))
            lid += 1
    spark.createDataFrame(
        parts, "p_partkey long, p_brand string"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    spark.createDataFrame(
        li, "l_partkey long, l_extendedprice double, l_quantity double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = part_price_elasticity(spark, str(tmp_path)).collect()
    assert len(r) == 1 and r[0].brand == "Brand#11"

    xs, ys = [], []
    for pk, cents in enumerate([10000, 20000, 40000, 80000, 160000], 1):
        # engine half-up-rounds each q/2 half onto the integer grid
        # before summing (floor(q + 0.5), the cross-engine rule; odd
        # q gains one unit per half) — replay the identical rule
        q = round(1e9 / (cents ** 1.5))
        q_total = math.floor(q / 2 + 0.5) * 2
        xs.append(math.floor(math.log(cents) * _ELAS_LN_GRID))
        ys.append(math.floor(math.log(q_total) * _ELAS_LN_GRID))
    slope = np.polyfit(xs, ys, 1)[0]
    assert r[0].n_parts == 5
    assert abs(r[0].elasticity - (-1.5)) < 0.01
    assert abs(r[0].elasticity - slope) < 1e-3
    assert r[0].r_squared > 0.999


def test_fano_burstiness_poisson_vs_bursty(spark, tmp_path):
    """Planted uniform (1 event/day -> Fano 0) vs bursty (all mass on
    two days) daily profiles, replayed with the exact integer
    identity F = (n*S2 - S1^2) / (n*S1)."""
    from env_data_pipeline_spark.plans.statmining import (
        events_daily_fano_burstiness,
    )

    rows, eid = [], 0
    for d in range(10):  # 'view': one event per day, zero dispersion
        rows.append((eid, dt.datetime(2024, 6, 1) + dt.timedelta(days=d),
                     1, "view", 1.0, "{}"))
        eid += 1
    for d, c in ((0, 9), (9, 1)):  # 'error': bursty — 9 then 1
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 6, 1) + dt.timedelta(days=d),
                         1, "error", 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    got = {
        r.event_type: r
        for r in events_daily_fano_burstiness(spark, str(tmp_path)).collect()
    }
    assert got["view"].fano_permille == 0
    assert got["view"].overdispersed is False
    # error: n=2, S1=10, S2=82 -> 1000*(2*82-100)/(2*10) = 3200
    assert got["error"].n_days == 2
    assert got["error"].fano_permille == 3200
    assert got["error"].overdispersed is True


def test_pareto_8020_handcrafted(spark, tmp_path):
    """Five customers at revenue 50/20/15/10/5: total 100, the top-3
    cumulative (85) is the first to clear 80 -> k=3, 600 permille of
    the base, share 850 permille."""
    from env_data_pipeline_spark.plans.statmining import customer_pareto_8020

    revs = [(1, 50.0), (2, 20.0), (3, 15.0), (4, 10.0), (5, 5.0)]
    rows = [
        (ck * 10, ck, "O", amt, dt.datetime(1995, 1, 1), "1-URGENT")
        for ck, amt in revs
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = customer_pareto_8020(spark, str(tmp_path)).collect()[0]
    assert r.n_customers == 5
    assert r.top_k == 3
    assert r.top_k_permille == 600
    assert r.share_permille == 850


def test_interarrival_profile_matches_python(spark, tmp_path):
    """Planted arrival stream with known gaps: two types, one with
    gaps [1s x4, 10s, 100s] (median 1s lower-pinned, p90 = 100s at
    ceil(0.9*6)=6... rank 6 of 6 = 100s) — replayed exactly in pure
    Python against the engine's rank rules."""
    import datetime as dt

    from env_data_pipeline_spark.plans.statmining import (
        events_interarrival_profile,
    )

    base = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    offs = [0, 1, 2, 3, 4, 14, 114]  # gaps: 1,1,1,1,10,100 seconds
    for o in offs:
        rows.append((eid, base + dt.timedelta(seconds=o), 1, "a", 0.0, "{}"))
        eid += 1
    for k in range(3):  # type b: gaps 60, 60
        rows.append(
            (eid, base + dt.timedelta(minutes=k), 2, "b", 0.0, "{}")
        )
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: r
        for r in events_interarrival_profile(spark, str(tmp_path)).collect()
    }
    a, b = got["a"], got["b"]
    assert a.n_gaps == 6
    # lower median: rank (6+1) div 2 = 3 of sorted [1,1,1,1,10,100]s
    assert a.median_gap_us == 1_000_000
    # p90: rank (9*6+9) div 10 = 6 -> 100 s
    assert a.p90_gap_us == 100_000_000
    assert a.max_gap_us == 100_000_000
    assert b.n_gaps == 2 and b.median_gap_us == 60_000_000


def test_rfm_threshold_matrix_partitions_customers(spark, sf_dir):
    """The 8-cell matrix must partition the customer base exactly:
    cell customer counts sum to |distinct custkeys| and revenue
    permilles sum to ~1000 (truncation slack < n_cells)."""
    from env_data_pipeline_spark.catalog import table
    from env_data_pipeline_spark.plans.statmining import (
        customer_rfm_threshold_matrix,
    )

    rows = customer_rfm_threshold_matrix(spark, sf_dir).collect()
    n_cust = (
        table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    total_pm = sum(r.revenue_permille for r in rows)
    assert 1000 - len(rows) <= total_pm <= 1000


def test_monthly_seasonality_flat_year_reads_1000(spark, tmp_path):
    """A synthetic perfectly-uniform year must index every month at
    exactly 1000 permille (the flat-year calibration point)."""
    import datetime as dt

    from env_data_pipeline_spark.plans.statmining import (
        orders_monthly_seasonality,
    )

    rows = []
    for m in range(1, 13):
        for k in range(5):
            rows.append(
                (m * 100 + k, 1, "O", 100.0, dt.datetime(2025, m, 1 + k), "1-URGENT")
            )
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = orders_monthly_seasonality(spark, str(tmp_path)).collect()
    assert len(out) == 12
    assert all(r.seasonality_permille == 1000 for r in out)


def test_markov_transitions_planted_chain(spark, tmp_path):
    """A deterministic planted journey (a->b->a->b->c for one user,
    a->c for another): transition counts and row permilles replay the
    hand-counted matrix."""
    import datetime as dt

    from env_data_pipeline_spark.plans.statmining import (
        events_markov_transitions,
    )

    rows = []
    seq1 = ["a", "b", "a", "b", "c"]
    for i, t in enumerate(seq1):
        rows.append((i, dt.datetime(2026, 1, 1, i), 1, t, 0.0, "{}"))
    for i, t in enumerate(["a", "c"]):
        rows.append((10 + i, dt.datetime(2026, 1, 2, i), 2, t, 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.p_permille)
        for r in events_markov_transitions(spark, str(tmp_path)).collect()
    }
    # from a: a->b x2, a->c x1 -> 666/333 permille
    assert got[("a", "b")] == (2, 666)
    assert got[("a", "c")] == (1, 333)
    # from b: b->a x1, b->c x1 -> 500 each
    assert got[("b", "a")] == (1, 500)
    assert got[("b", "c")] == (1, 500)
    assert len(got) == 4  # terminal events emit no transition


def test_mad_anomalies_flags_only_the_spike(spark, tmp_path):
    """14 quiet days (3-5 events) plus one 50-event incident day: the
    median/MAD screen must flag exactly the incident, and a mean/std
    screen's weakness (the spike inflating its own threshold) must
    not occur — median 4, MAD 1, threshold 9."""
    import datetime as dt

    from env_data_pipeline_spark.plans.statmining import (
        events_daily_mad_anomalies,
    )

    rows, eid = [], 0
    counts = [3, 4, 5, 4, 3, 4, 5, 4, 3, 4, 5, 4, 3, 4, 50]
    for d, c in enumerate(counts):
        for k in range(c):
            rows.append(
                (
                    eid,
                    dt.datetime(2026, 2, 1) + dt.timedelta(days=d, minutes=k),
                    1,
                    "click",
                    0.0,
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = events_daily_mad_anomalies(spark, str(tmp_path)).collect()[0]
    assert r.n_days == 15
    assert r.median_daily == 4
    assert r.mad_daily == 1
    assert r.n_anomalous == 1
    assert r.max_daily == 50


def test_daily_acf_alternating_series(spark, tmp_path):
    """14 days alternating 10/20 for one type: lag-1 ACF strongly
    negative, lag-2 strongly positive, lag-7 (odd) negative — each
    value matching the exact integer replay (value*1e4 grid,
    floor-mean centering, BIGINT products)."""
    import datetime as dt

    from env_data_pipeline_spark.plans.statmining import events_daily_acf

    rows = []
    for d in range(14):
        rows.append(
            (
                d,
                dt.datetime(2026, 3, 1, 12) + dt.timedelta(days=d),
                1,
                "click",
                10.0 if d % 2 == 0 else 20.0,
                "{}",
            )
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    # exact integer replay
    m4 = [
        ((int(10.0 * 10000 + 0.5) if d % 2 == 0 else int(20.0 * 10000 + 0.5))
         * 1000) // 1 // 1000
        for d in range(14)
    ]
    mbar = sum(m4) // 14
    c = [v - mbar for v in m4]
    den = sum(x * x for x in c)
    expect = {}
    for lag in (1, 2, 3, 7):
        pairs = [(c[d], c[d + lag]) for d in range(14 - lag)]
        num = sum(a * b for a, b in pairs)
        expect[lag] = (len(pairs), num, round(num / den, 6))

    got = {
        r.lag: r for r in events_daily_acf(spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 2, 3, 7}
    for lag, (n_pairs, num, acf) in expect.items():
        r = got[lag]
        assert r.n_days == 14
        assert (r.n_pairs, r.acf_num_units, r.acf_den_units) == (
            n_pairs,
            num,
            den,
        )
        assert abs(r.acf - acf) < 1e-9
    assert got[1].acf < -0.8 and got[2].acf > 0.8 and got[7].acf < -0.4


def test_daily_acf_gap_days_pair_only_matched_lags(spark, tmp_path):
    """Days 0,1,3 present (day 2 missing): lag-1 pairs only (0,1),
    lag-2 only (1,3), lag-3 only (0,3) — gaps never fabricate
    pairs."""
    import datetime as dt

    from env_data_pipeline_spark.plans.statmining import events_daily_acf

    rows = [
        (d, dt.datetime(2026, 3, 1, 12) + dt.timedelta(days=d), 1, "click",
         float(v), "{}")
        for d, v in ((0, 10.0), (1, 30.0), (3, 20.0))
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.lag: r for r in events_daily_acf(spark, str(tmp_path)).collect()
    }
    assert [got[lag].n_pairs for lag in (1, 2, 3, 7)] == [1, 1, 1, 0]
    assert got[7].acf is None and got[7].acf_num_units == 0
