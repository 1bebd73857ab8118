"""Pure-helper unit properties — no SparkSession, so these run in
milliseconds and catch cross-dialect generator drift (the Python
expression builders and their generated-SQL twins must be the same
function) plus driver-side numeric invariants."""

from __future__ import annotations

import duckdb
import numpy as np


def _z_ref(a: int, b: int, bits: int = 8) -> int:
    """Independent bit-interleave reference (a odd bits, b even bits)."""
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_sql_generator_matches_reference():
    """The generated DuckDB interleave arithmetic must equal the
    independent Python reference on a dense sample of the 8-bit x 8-bit
    domain (every bit position exercised both set and clear)."""
    from xml_processor_spark.operators.lakeops import _z_interleave_sql

    con = duckdb.connect()
    expr = _z_interleave_sql("a", "b")
    rows = con.execute(
        f"SELECT a, b, {expr} AS z FROM generate_series(0, 255, 7) t(a), "
        "generate_series(0, 255, 11) u(b)"
    ).fetchall()
    assert rows, "empty interleave sample"
    for a, b, z in rows:
        assert z == _z_ref(a, b), f"interleave({a},{b}) = {z} != {_z_ref(a, b)}"


def test_zorder_interleave_is_injective_on_corners():
    """Distinct (a, b) pairs must map to distinct z-values (bit
    interleaving is a bijection onto 16 bits)."""
    pts = [0, 1, 2, 127, 128, 254, 255]
    zs = {_z_ref(a, b) for a in pts for b in pts}
    assert len(zs) == len(pts) ** 2


def test_pq_train_is_deterministic_and_shaped():
    """Codebooks must be bit-identical across calls on the same sample
    (executors rely on this for reproducible codes) with shape
    (m, k, dim//m)."""
    from xml_processor_spark.functions.llm_vectors import _pq_train

    rng = np.random.default_rng(11)
    sample = rng.standard_normal((200, 16))
    b1 = _pq_train(sample, m=4, k=8, iters=5)
    b2 = _pq_train(sample.copy(), m=4, k=8, iters=5)
    assert b1.shape == (4, 8, 4)
    assert np.array_equal(b1, b2)


def test_pq_train_dedupes_duplicate_init_rows():
    """A sample whose head is all-duplicate rows must still seed k
    DISTINCT centroids when enough distinct rows exist later in the
    sample (the ADVICE r5 fix: first-k init on duplicated heads wasted
    codebook capacity forever)."""
    from xml_processor_spark.functions.llm_vectors import _pq_train

    from xml_processor_spark.functions.llm_vectors import _pq_quantize

    rng = np.random.default_rng(12)
    # quantize onto the trainer's exact 1e-3 integer grid (r12 contract:
    # _pq_train takes pre-quantized int64 input)
    distinct = _pq_quantize(rng.standard_normal((8, 4)))
    # head: the same row 10 times, then 8 distinct rows
    sample = np.vstack([np.tile(distinct[0], (10, 1)), distinct])
    books = _pq_train(sample, m=1, k=8, iters=0)  # iters=0 → raw init
    init = books[0]
    assert len(np.unique(init, axis=0)) == 8, "duplicate centroids seeded"


def test_shard_and_split_sql_twins_agree_with_python():
    """The md5-derived shard/split bucket SQL must reproduce Python's
    hashlib on sample strings — the cross-engine determinism everything
    hash-routed rests on."""
    import hashlib

    from xml_processor_spark.functions.deterministic import phash60_sql

    con = duckdb.connect()
    for s in ("", "a", "hello world", "batch part spark line", "w123 " * 50):
        got = con.execute(
            f"SELECT {phash60_sql('?')} ", [s]
        ).fetchone()[0]
        want = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        assert got == want, f"phash60 mismatch for {s!r}"


def test_table_cache_hangs_off_the_session_object(monkeypatch):
    """The DataFrame cache must live ON the session object, never in an
    id()-keyed module dict: CPython reuses addresses of collected
    sessions, so an id()-keyed memo can hand a fresh session a dead
    session's handle (VERDICT r6 #2). Two distinct session objects must
    get independent caches, and a repeat call must return the SAME
    cached object (identity, not re-load)."""
    from xml_processor_spark import io as xio

    loads = []

    def fake_load(spark, path, name):
        loads.append((id(spark), path))
        return object()  # unique sentinel per load

    monkeypatch.setattr(xio, "_load", fake_load)

    class FakeSession:
        pass

    s1, s2 = FakeSession(), FakeSession()
    a = xio.table(s1, "/sf", "region")
    assert xio.table(s1, "/sf", "region") is a  # memo hit, no second load
    assert len(loads) == 1
    b = xio.table(s2, "/sf", "region")
    assert b is not a  # distinct session -> distinct cache
    assert len(loads) == 2
    # the memo dies with the session: it is an attribute, not module state
    assert getattr(s1, "_xps_df_cache", None) is not None
    assert s1._xps_df_cache is not s2._xps_df_cache


def test_q21_rewrite_equals_exists_formulation():
    """q_tpch_q21 is dialect-split (r12): the engine runs the
    single-aggregate rewrite, the oracle the canonical EXISTS/NOT-EXISTS
    subquery form. This pins their algebraic equality directly — both
    formulations, one engine (DuckDB), same result set."""
    import duckdb

    from xml_processor_spark.operators.composite import (
        _Q21_ORACLE_SQL, _Q21_SQL,
    )

    con = duckdb.connect()
    for t in ("supplier", "lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    a = con.execute(_Q21_SQL).fetchall()
    b = con.execute(_Q21_ORACLE_SQL).fetchall()
    assert a == b and len(a) > 0


def test_elasticity_ylut_bit_equals_duckdb_ln():
    """q_part_price_elasticity's engine replaces round(ln(q)·1e6) with a
    50-entry literal lookup computed by python math.log + half-away (r13).
    Pin every entry against DuckDB's own CAST(round(ln(q)*1e6) AS BIGINT)
    — both call the same glibc log, so the fixed-point integers must be
    bit-identical for the full quantity domain 1..50."""
    import math

    import duckdb

    from xml_processor_spark.functions.deterministic import py_half_away

    py = [py_half_away(math.log(i) * 1_000_000) for i in range(1, 51)]
    duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(round(ln(CAST(q AS DOUBLE)) * 1000000) AS BIGINT) "
            "FROM range(1, 51) t(q) ORDER BY q"
        ).fetchall()
    ]
    assert py == duck


def test_half_away_long_equals_f_round_on_doubles(spark):
    """half_away_long (codegen arithmetic) must agree with both Spark's
    F.round(v, 0) (BigDecimal HALF_UP) and DuckDB's scale-0 round
    (std::round, half-away) on a hostile double sample: exact .5 ties,
    values 1 ulp either side of ties, negatives, and the elasticity
    operator's actual magnitude range (ln·1e6 ≈ 1.2e7)."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    from xml_processor_spark.functions.deterministic import half_away_long

    vals = []
    for k in [0, 1, 2, 3, 7, 99, 1023, 1_000_000, 11_512_925]:
        for base in [float(k), k + 0.5, k + 0.25, k + 0.75]:
            vals += [base, -base]
            vals += [math.nextafter(base, 0.0), math.nextafter(base, 1e18)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        (r["a"], r["b"])
        for r in df.select(
            half_away_long(F.col("v")).alias("a"),
            F.round("v", 0).cast("long").alias("b"),
        ).collect()
    ]
    duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(round(v) AS BIGINT) FROM (SELECT unnest(?) AS v)",
            params=[vals],
        ).fetchall()
    ]
    assert [g[0] for g in got] == [g[1] for g in got]  # == F.round
    assert [g[0] for g in got] == duck  # == DuckDB round


def test_half_away_nn_variants_agree_on_nonnegative_doubles(spark):
    """The non-negative fast path (half_away_long_nn / ha_sql_nn, r14:
    signum/abs dropped for schema-non-negative columns) must agree with
    the signed form, F.round, and DuckDB round on the non-negative half
    of the hostile sample — exact .5 ties, ulp-neighbors, and the price
    magnitude range. ha_sql_nn is additionally pinned inside DuckDB
    itself (FLOOR arithmetic == round) since the engine-dialect SQL
    string must hold on both parsers."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    from xml_processor_spark.functions.deterministic import (
        ha_sql_nn, half_away_long, half_away_long_nn,
    )

    vals = []
    for k in [0, 1, 2, 3, 7, 99, 1023, 1_000_000, 11_512_925]:
        for base in [float(k), k + 0.5, k + 0.25, k + 0.75]:
            vals.append(base)
            vals += [abs(math.nextafter(base, 0.0)),
                     math.nextafter(base, 1e18)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select(
        half_away_long_nn(F.col("v")).alias("nn"),
        half_away_long(F.col("v")).alias("signed"),
        F.round("v", 0).cast("long").alias("fr"),
        F.expr(f"CAST({ha_sql_nn('v')} AS BIGINT)").alias("sqlnn"),
    ).collect()
    assert [r["nn"] for r in rows] == [r["signed"] for r in rows]
    assert [r["nn"] for r in rows] == [r["fr"] for r in rows]
    assert [r["nn"] for r in rows] == [r["sqlnn"] for r in rows]
    duck = duckdb.sql(
        f"SELECT CAST(round(v) AS BIGINT), CAST({ha_sql_nn('v')} AS BIGINT) "
        "FROM (SELECT unnest(?) AS v)",
        params=[vals],
    ).fetchall()
    assert [r["nn"] for r in rows] == [d[0] for d in duck]
    assert [d[0] for d in duck] == [d[1] for d in duck]


def test_ps_cte_engine_equals_canonical_round_form():
    """The de-facto-partsupp CTE is dialect-split (r13): the engine runs
    _PS_CTE_ENGINE (half-away FLOOR arithmetic), the q2/q11/q16 oracles
    the canonical round() form. Pin their algebraic equality directly —
    both formulations, one engine (DuckDB), full result-set compare."""
    import duckdb

    from xml_processor_spark.operators.composite import (
        _PS_CTE, _PS_CTE_ENGINE,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/lineitem.parquet')"
    )
    order = " ORDER BY ps_partkey, ps_suppkey"
    a = con.execute(_PS_CTE + order).fetchall()
    b = con.execute(_PS_CTE_ENGINE + order).fetchall()
    assert len(a) > 0 and a == b


def test_partsupp_pushdown_engine_equals_canonical_oracle():
    """r14: the q2/q11/q16 engine dialects push the supplier/part
    predicates BELOW the (partkey, suppkey) pair aggregate as group-key
    semi/anti joins (valid: the filters are functions of the group keys,
    so they remove whole groups, never rows of surviving groups). Pin the
    algebraic equality directly — both formulations, one engine (DuckDB),
    full result-set compare, no Spark in the loop."""
    import duckdb

    from xml_processor_spark.operators.composite import (
        _Q2_ENGINE_SQL, _Q11_ENGINE_SQL, _Q16_ENGINE_SQL,
    )
    from xml_processor_spark.registry import get_oracles

    con = duckdb.connect()
    for t in ("lineitem", "part", "supplier", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    oracles = get_oracles()
    for key, engine_sql in (
        ("q_tpch_q2", _Q2_ENGINE_SQL),
        ("q_tpch_q11", _Q11_ENGINE_SQL),
        ("q_tpch_q16", _Q16_ENGINE_SQL),
    ):
        a = con.execute(engine_sql).fetchall()
        b = con.execute(oracles[key]).fetchall()
        assert len(a) > 0 and a == b, key


def test_pca_invariant_checker_accepts_correct_and_rejects_corrupt():
    """The E-EMB-PCA tolerance checker (VERDICT r14 #3) must pass a
    faithful engine simulation — raw float32 vectors projected onto the
    eigenbasis of the grid covariance, exactly what e_emb_pca emits —
    and fail outputs with a real pipeline defect: a rescaled component
    (variance != eigenvalue), swapped component order, and a
    non-centered projection. No Spark: the simulation IS the engine's
    driver-side math, the checker's twin is independent DuckDB SQL."""
    from tools.verify_local import _pca_invariant_check

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    mat = np.asarray([r[1] for r in rows], dtype=np.float32).astype(
        np.float64
    )
    n, dim = mat.shape
    q = np.sign(mat * 1000) * np.floor(
        np.abs(mat * 1000) + 0.5
    )  # half-away grid, the engine's F.round
    mu = q.sum(axis=0) / 1e3 / n
    g = (q.T @ q) / 1e6
    cov = g / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    comps = v[:, order].T
    proj = (mat - mu) @ comps.T  # raw-minus-grid-mean, like e_emb_pca

    def as_rows(p):
        return [
            (rows[r][0], c, float(p[r, c]))
            for r in range(n)
            for c in range(8)
        ]

    cols = ["vec_id", "component", "value"]
    assert _pca_invariant_check(cols, as_rows(proj), con) == []

    bad = proj.copy()
    bad[:, 3] *= 1.01  # 2% variance error >> noise bound
    assert any(
        "variance" in p for p in _pca_invariant_check(cols, as_rows(bad), con)
    )
    swapped = proj[:, [1, 0, 2, 3, 4, 5, 6, 7]]  # component order defect
    assert _pca_invariant_check(cols, as_rows(swapped), con) != []
    uncentered = proj + 0.05
    assert any(
        "mean" in p
        for p in _pca_invariant_check(cols, as_rows(uncentered), con)
    )


def test_row_count_matches_footer_and_handles_dir_layout(tmp_path):
    """io.row_count must return the exact table cardinality the replaced
    Spark count job returned (the r15 route-cutover decisions key on it),
    for both the single-file testdata layout and a directory of part
    files (fixture layout)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xml_processor_spark.io import row_count

    # Single-file layout: footer metadata is the ground truth the old
    # count() job scanned for.
    for sf_dir, name in (
        ("/root/testdata/sf0.01", "documents"),
        ("/root/testdata/sf0.01", "embeddings"),
        ("/root/testdata/sf0.1", "documents"),
    ):
        meta = pq.read_metadata(f"{sf_dir}/{name}.parquet")
        assert row_count(sf_dir, name) == meta.num_rows

    # Directory-of-parts layout: counts must sum across part files and
    # ignore non-parquet sidecars.
    d = tmp_path / "documents.parquet"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": list(range(7))}), d / "part-0.parquet")
    pq.write_table(pa.table({"doc_id": list(range(5))}), d / "part-1.parquet")
    (d / "_layout.json").write_text("{}")
    assert row_count(str(tmp_path), "documents") == 12
