"""Closed-form truths for the r7 statistics layer.

verify_local proves Spark ≡ DuckDB, but both dialects can share a bug
(SURVEY §5's sum_charge lesson). These tests plant inputs whose OLS /
autocorrelation / peak / MAD / Gini values are known in closed form and
assert the operators recover them — no oracle in the loop.

Synthetic tables (deterministic, no rand()):
 - events: type 'lin' has EXACTLY 5+2d events on day d (d = 0..29) →
   slope 2, intercept 5, r² 1 by construction; type 'alt' alternates
   10/20 events per day → lag-1 autocorr −1, peaks = the 14 interior
   high days, MAD fence flags nothing.
 - orders: one order per customer, totalprice k cents for k = 1..N →
   Gini of the discrete uniform = (N²−1)/(3N²) ≈ 1/3; the 513-bucket
   grouped estimator must land within the bucket-collapse error.
"""

from __future__ import annotations

import datetime
import os

import pytest

CF_DIR = "/tmp/xps_closed_form"
_DAYS = 30
_N_CUST = 20_000


def _generate(path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    ts, types, eids, uids, vals = [], [], [], [], []
    eid = 0
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    for d in range(_DAYS):
        day = base + datetime.timedelta(days=d)
        for etype, n in (("lin", 5 + 2 * d), ("alt", 10 if d % 2 == 0 else 20)):
            for i in range(n):
                ts.append(day + datetime.timedelta(seconds=i))
                types.append(etype)
                eids.append(eid)
                uids.append(eid % 97)
                vals.append(1.0)
                eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(uids, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * len(eids), pa.string()),
            }
        ),
        os.path.join(path, "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(1, _N_CUST + 1), pa.int64()),
                "o_custkey": pa.array(range(1, _N_CUST + 1), pa.int64()),
                "o_orderstatus": pa.array(["O"] * _N_CUST, pa.string()),
                "o_totalprice": pa.array(
                    [k / 100.0 for k in range(1, _N_CUST + 1)], pa.float64()
                ),
                "o_orderdate": pa.array(
                    [datetime.date(2024, 1, 1)] * _N_CUST, pa.date32()
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * _N_CUST, pa.string()),
            }
        ),
        os.path.join(path, "orders.parquet"),
    )


@pytest.fixture(scope="module")
def cf_dir():
    if not os.path.exists(os.path.join(CF_DIR, "orders.parquet")):
        _generate(CF_DIR)
    return CF_DIR


def _row(df, **match):
    rows = [
        r.asDict()
        for r in df.collect()
        if all(r[k] == v for k, v in match.items())
    ]
    assert rows, f"no row matching {match}"
    return rows[0]


def test_trend_ols_recovers_planted_line(spark, queries, cf_dir):
    r = _row(queries["q_trend_ols"](spark, cf_dir), event_type="lin")
    assert r["n_days"] == _DAYS
    assert r["slope"] == 2.0
    assert r["intercept"] == 5.0
    assert r["r2"] == 1.0


def test_autocorr_is_minus_one_on_alternating_series(spark, queries, cf_dir):
    r = _row(queries["q_events_autocorr"](spark, cf_dir), event_type="alt")
    assert r["n_pairs"] == _DAYS - 1
    assert r["autocorr_lag1"] == -1.0


def test_peaks_counts_interior_highs_exactly(spark, queries, cf_dir):
    # alt = 10,20,10,20,... highs on odd days 1..29; day 29 has no next
    # neighbor, so interior highs = {1,3,...,27} = 14 peaks of height 20.
    r = _row(queries["q_events_peaks"](spark, cf_dir), event_type="alt")
    assert r["n_days"] == _DAYS
    assert r["n_peaks"] == 14
    assert r["max_peak"] == 20
    # lin is strictly increasing: no interior local maximum, NULL max.
    r = _row(queries["q_events_peaks"](spark, cf_dir), event_type="lin")
    assert r["n_peaks"] == 0 and r["max_peak"] is None


def test_mad_exact_on_planted_series(spark, queries, cf_dir):
    # lin: y = 5,7,...,63 → median 34, |dev| = {1,3,...,29} twice → MAD 15;
    # fence 3*1.4826*15 = 66.7 flags nothing on a 29-spread series.
    r = _row(queries["q_events_mad"](spark, cf_dir), event_type="lin")
    assert r["med_daily"] == 34.0
    assert r["mad_daily"] == 15.0
    assert r["n_outlier_days"] == 0
    # alt: median 15, deviations all 5 → MAD 5, nothing beyond 22.2.
    r = _row(queries["q_events_mad"](spark, cf_dir), event_type="alt")
    assert r["med_daily"] == 15.0 and r["mad_daily"] == 5.0
    assert r["n_outlier_days"] == 0


def test_gini_matches_discrete_uniform_closed_form(spark, queries, cf_dir):
    # Exact Gini of uniform {1..N}: (N²−1)/(3N²); bucket collapse (width
    # = max DIV 512) can shift it by at most ~the within-bucket spread.
    r = queries["q_spend_gini"](spark, cf_dir).collect()[0]
    exact = (_N_CUST**2 - 1) / (3.0 * _N_CUST**2)
    assert r["n_customers"] == _N_CUST
    assert abs(r["gini"] - exact) < 0.002, (r["gini"], exact)


def test_gmv_bridge_effects_sum_to_delta(spark, queries):
    """The Laspeyres/Paasche decomposition is an algebraic identity:
    volume_effect + price_effect must equal delta_cents/100 for every
    brand (up to the 6-dp output rounding of each effect)."""
    from tests.conftest import SF_SMALL

    rows = queries["q_orders_gmv_bridge"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        recon = r.volume_effect + r.price_effect
        assert abs(recon - r.delta_cents / 100.0) <= 1e-5, r
