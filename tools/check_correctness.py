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
        mismatch = None
        for c in scols:
            sv, ov = s[c], o[c]
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                import numpy as np

                if not np.allclose(
                    sv.astype(float), ov.astype(float), rtol=0, atol=1e-12, equal_nan=True
                ):
                    mismatch = c
                    break
            elif not (sv.astype(str) == ov.astype(str)).all():
                mismatch = c
                break
        if mismatch:
            print(f"FAIL  {name}: value mismatch in column {mismatch}")
            bad = (s[mismatch].astype(str) != o[mismatch].astype(str))
            print(s[bad].head(5))
            print(o[bad].head(5))
            failures += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
