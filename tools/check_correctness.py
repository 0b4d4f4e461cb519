"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
row-count, schema (column names) and order-insensitive values against
``oracle_sql()`` via DuckDB. Usage: python tools/check_correctness.py [names...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _compare_exact(s, o, cols):
    """Exact typed comparison mirroring the driver's value hash.

    The round-2 gate used ``np.allclose`` (treats ``-0.0 == 0.0``) and
    str/float-cast fallbacks (masks DuckDB HUGEINT leaking through Arrow
    as float64 against Spark BIGINT) — exactly the two blind spots that
    shipped three driver hash-fails. Rules now:

    * dtype KINDS must match — an int column on one side vs float on the
      other (HUGEINT leakage) is a failure even if the values round-trip;
    * float columns compare bit-exactly on their float64 patterns, so
      ``-0.0`` vs ``+0.0`` and NaN-payload differences fail;
    * everything else compares by exact canonical string equality.

    Returns ``None`` on match, else ``(column, reason)``.
    """
    import numpy as np

    for c in cols:
        sv, ov = s[c], o[c]
        sk, ok = sv.dtype.kind, ov.dtype.kind
        # 'i'/'u' are both integer kinds; anything else must match exactly
        norm = {"u": "i"}
        if norm.get(sk, sk) != norm.get(ok, ok):
            return c, f"dtype kind mismatch: {sv.dtype} vs {ov.dtype} (typed-hash fail)"
        if sk == "f":
            a = sv.to_numpy(dtype=np.float64).view(np.int64)
            b = ov.to_numpy(dtype=np.float64).view(np.int64)
            if not np.array_equal(a, b):
                return c, "float64 bit-pattern mismatch (allclose would hide -0.0/ulp)"
        elif sk in "iu":
            if not np.array_equal(sv.to_numpy(dtype=np.int64), ov.to_numpy(dtype=np.int64)):
                return c, "integer value mismatch"
        else:
            if not (sv.astype(str).to_numpy() == ov.astype(str).to_numpy()).all():
                return c, "value mismatch"
    return None


def main(names: list[str]) -> int:
    import __spark_entry__ as entrymod
    from sparkforward.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    selected = names or list(qs)
    failures = 0
    for name in selected:
        fn = qs[name]
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL  {name}: schema {scols} vs {ocols}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
            failures += 1
            continue
        s = sdf[scols].sort_values(scols).reset_index(drop=True)
        o = odf[scols].sort_values(scols).reset_index(drop=True)
        mismatch = _compare_exact(s, o, scols)
        if mismatch:
            col, why = mismatch
            print(f"FAIL  {name}: column {col}: {why}")
            import numpy as np

            sv, ov = s[col], o[col]
            if sv.dtype.kind == "f" and ov.dtype.kind == "f":
                bad = sv.to_numpy().view(np.int64) != ov.to_numpy().view(np.int64)
            else:
                bad = sv.astype(str).to_numpy() != ov.astype(str).to_numpy()
            print(s[bad].head(5))
            print(o[bad].head(5))
            failures += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
