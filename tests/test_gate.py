"""Gate-hardening tests (judge round-2 items #2 and #8).

Round 2 shipped three driver hash-fails that the local gate missed because
it compared with ``np.allclose`` (hides ``-0.0``) and float-cast integers
(hides DuckDB HUGEINT leakage). These tests pin the hardened gate
(`tools/check_correctness._compare_exact`) against exactly those bug
classes, and pin the event-analytics outputs as timezone-insensitive
epoch integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _compare(s, o):
    import tools.check_correctness as gate

    cols = sorted(s.columns)
    return gate._compare_exact(
        s[cols].sort_values(cols).reset_index(drop=True),
        o[cols].sort_values(cols).reset_index(drop=True),
        cols,
    )


def test_gate_catches_hugeint_int_vs_float_typing():
    """DuckDB HUGEINT arrives in pandas as float64; against Spark's int64
    the values round-trip equal but the driver's typed hash differs. The
    gate must fail on dtype kind, not value."""
    s = pd.DataFrame({"k": pd.array([1, 2], dtype="int64")})
    o = pd.DataFrame({"k": pd.array([1.0, 2.0], dtype="float64")})
    bad = _compare(s, o)
    assert bad is not None and bad[0] == "k" and "dtype kind" in bad[1]


def test_gate_catches_negative_zero():
    s = pd.DataFrame({"score": np.array([0.0, 1.5])})
    o = pd.DataFrame({"score": np.array([-0.0, 1.5])})
    bad = _compare(s, o)
    assert bad is not None and bad[0] == "score"


def test_gate_catches_sub_allclose_ulp_difference():
    a = 0.1
    b = np.nextafter(a, 1.0)  # 1 ulp apart — allclose(atol=1e-12) passes
    bad = _compare(pd.DataFrame({"x": [a]}), pd.DataFrame({"x": [b]}))
    assert bad is not None


def test_gate_passes_exact_match_and_int32_vs_int64():
    s = pd.DataFrame({"n": pd.array([1, 2], dtype="int32"), "x": [0.25, -0.5]})
    o = pd.DataFrame({"n": pd.array([1, 2], dtype="int64"), "x": [0.25, -0.5]})
    assert _compare(s, o) is None


@pytest.mark.parametrize("qname", ["event_window", "user_sessions"])
def test_event_outputs_are_timezone_insensitive(spark, qname):
    """The driver-gate entries emit epoch-microsecond BIGINTs, never raw
    timestamps, so the value hash cannot depend on the session timezone
    (judge r2 'timestamp-output hardening')."""
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[qname]
    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "UTC")
        utc = fn(spark, SF_DIR).toPandas()
        spark.conf.set(key, "America/New_York")
        nyc = fn(spark, SF_DIR).toPandas()
    finally:
        spark.conf.set(key, prev)

    # no timestamp-typed column survives to the gate surface
    for df in (utc, nyc):
        assert not any(
            pd.api.types.is_datetime64_any_dtype(df[c]) for c in df.columns
        ), df.dtypes
    cols = sorted(utc.columns)
    u = utc[cols].sort_values(cols).reset_index(drop=True)
    n = nyc[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(u, n)


def test_oracle_sql_yields_no_hugeint_typing():
    """Every oracle's integer outputs must reach pandas as integer dtypes
    (HUGEINT → float64 leakage is a driver typed-hash fail even when the
    values are equal). Checks the two windowed-sum oracles that regressed
    in round 2."""
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    oracles = entrymod.oracle_sql()
    for name, col in [("event_window", "sum_k"), ("user_sessions", "session_no")]:
        df = con.execute(oracles[name]).fetchdf()
        assert df[col].dtype.kind in "iu", (name, col, df[col].dtype)
        for tcol in ("window_start", "session_start", "session_end"):
            if tcol in df.columns:
                assert df[tcol].dtype.kind in "iu", (name, tcol, df[tcol].dtype)


# --------------------------------------------------- cache lifecycle (#6) #
class _StubSession:
    """Mimics the session.sparkContext._jsc.sc().isStopped() chain."""

    class _JSC:
        def __init__(self, owner):
            self._owner = owner

        def sc(self):
            return self

        def isStopped(self):
            return self._owner.stopped

    def __init__(self):
        self.stopped = False
        self.sparkContext = type("SC", (), {})()
        self.sparkContext._jsc = self._JSC(self)


class _StubDF:
    def __init__(self):
        self.unpersisted = False

    def unpersist(self):
        self.unpersisted = True


def test_session_cache_sweeps_dead_sessions_on_access():
    """Entries owned by a stopped session vanish on the next cache access —
    no explicit release_caches() call required (judge r2 #6)."""
    from sparkforward.session import SessionScopedCache

    cache = SessionScopedCache()
    live, dying = _StubSession(), _StubSession()
    df_live, df_dying = _StubDF(), _StubDF()
    cache.put(live, ("a",), df_live)
    cache.put(dying, ("b",), df_dying)
    assert len(cache) == 2

    dying.stopped = True
    assert cache.get(live, ("a",)) is df_live  # access sweeps
    assert len(cache) == 1
    assert cache.get(dying, ("b",)) is None

    cache.release()
    assert len(cache) == 0
    assert df_live.unpersisted and not df_dying.unpersisted  # dead: no-op


def test_wand_index_cache_builds_once_and_release_removes_dir(spark):
    """The WAND gate entries share ONE index build per (session, corpus)
    and release_caches() removes the temp directory (judge r3 #3/#4)."""
    import os

    from sparkforward import queries

    queries.release_caches()
    sf_dir = "/root/testdata/sf0.001"
    idx1 = queries._wand_index(spark, sf_dir)
    idx2 = queries._wand_index(spark, sf_dir)
    assert idx1 is idx2  # second call is a cache hit, not a rebuild
    assert len(queries._WAND_INDEX_CACHE) == 1
    hit = queries._WAND_INDEX_CACHE.get(spark, (sf_dir,))
    path = hit[1]
    assert os.path.isdir(path) and os.path.exists(
        os.path.join(path, "stats.json")
    )
    # the gate entries themselves go through the cache
    queries.q_bm25_wand_topk(spark, sf_dir).count()
    assert len(queries._WAND_INDEX_CACHE) == 1

    queries.release_caches()
    assert len(queries._WAND_INDEX_CACHE) == 0
    assert not os.path.exists(path)


def test_caches_auto_expire_across_real_session_stop(tmp_path):
    """Integration: populate both engine caches, stop the session, start a
    new one — the caches are empty and the new context has nothing
    persisted, without anyone calling release_caches()."""
    import subprocess
    import sys

    script = r"""
import sys
sys.path.insert(0, "/root/repo")
from sparkforward.session import get_spark
from sparkforward import bm25, queries

s1 = get_spark(app_name="cache-life-1", cores=2, shuffle_partitions=2)
queries._bm25_ranked(s1, "/root/testdata/sf0.001").count()
assert len(queries._RANKED_CACHE) == 1
assert len(bm25._TF_CACHE) == 1
s1.stop()

s2 = get_spark(app_name="cache-life-2", cores=2, shuffle_partitions=2)
# first access after the stop sweeps the dead entries
assert queries._RANKED_CACHE.get(s2, ("/root/testdata/sf0.001",)) is None
assert len(queries._RANKED_CACHE) == 0
assert bm25._TF_CACHE.get(s2, ("anything",)) is None
assert len(bm25._TF_CACHE) == 0
assert len(dict(s2.sparkContext._jsc.getPersistentRDDs())) == 0
s2.stop()
print("CACHE_LIFECYCLE_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert "CACHE_LIFECYCLE_OK" in out.stdout, out.stderr[-2000:]
