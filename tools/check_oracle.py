#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin
on the same parquet tables, compares row count, column names, and an
order-insensitive value hash. Stricter than the driver can be: exact value
equality after canonicalization, so a pass here should pass any reasonable
driver comparison.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import hashlib
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v):
    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        # repr of double — exact round-trip formatting
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (np.datetime64,)):
        ts = v.astype("datetime64[us]").astype(dt.datetime)
        return ts.isoformat()
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def driver_shape_error(df) -> str | None:
    """Re-enact the driver's canonicalization (pandas ``sort_values`` over
    every column) and return the error string if the frame's cell shapes
    would crash it — e.g. a bare ndarray/list column is unhashable in
    pandas' lexsort factorize (the CORRECTNESS_r06 ``embedding_quantize``
    failure). A gate-rotation candidate must pass this on BOTH frames.
    Probing the first 100 rows suffices — the crash is a property of the
    cell TYPES, identical in every row of a column — and avoids paying a
    second full-frame sort per query on large --sf fixtures."""
    try:
        df.head(100).sort_values(by=sorted(df.columns))
        return None
    except Exception as exc:  # noqa: BLE001 - any crash here crashes the driver
        return f"{type(exc).__name__}: {exc}"


def frame_digest(df) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        rows.append("\x1f".join(canon(v) for v in rec))
    rows.sort()
    digest = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return len(rows), cols, digest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default="/root/testdata/sf0.01",
        help="fixture dir, or 'all' to sweep sf0.001/sf0.01/sf0.1 — the "
        "three-scale sweep is what caught the tpch_q14 1-ULP divergence "
        "(degenerate small-data shapes diverge where big ones agree)",
    )
    ap.add_argument("--show-diff", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bravo_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    sf_dirs = (
        [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
        if args.sf == "all"
        else [args.sf]
    )
    total_failures = 0
    for sf_dir in sf_dirs:
        if len(sf_dirs) > 1:
            print(f"=== {sf_dir} ===")
        total_failures += _run_sf(spark, entry, sf_dir, args)
    spark.stop()
    return 1 if total_failures else 0


def _run_sf(spark, entry, sf_dir: str, args) -> int:
    import duckdb

    from bravo_spark.inventory.registry import GATE_PRIORITY

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        fn = qs[name]
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"[FAIL] {name}: SPARK ERROR")
            traceback.print_exc(limit=8)
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"[FAIL] {name}: ORACLE ERROR")
            traceback.print_exc(limit=8)
            failures += 1
            continue
        shape_errs = [
            f"{side} frame would crash the driver canonicalizer: {err}"
            for side, frame in (("spark", sdf), ("oracle", odf))
            if (err := driver_shape_error(frame))
        ]
        if shape_errs:
            # fatal for gate-window queries, loud warning for the rest
            tag = "FAIL" if name in GATE_PRIORITY else "warn"
            for msg in shape_errs:
                print(f"[{tag}] {name}: {msg}")
            if name in GATE_PRIORITY:
                failures += 1
                continue
        sc_, scols, shash = frame_digest(sdf)
        oc_, ocols, ohash = frame_digest(odf)
        ok = (sc_, scols, shash) == (oc_, ocols, ohash)
        status = "ok" if ok else "FAIL"
        print(f"[{status}] {name}: spark=({sc_},{shash}) oracle=({oc_},{ohash})")
        if not ok:
            failures += 1
            if scols != ocols:
                print(f"       cols spark={scols} oracle={ocols}")
            if args.show_diff and scols == ocols:
                srows = {r for r in ("\x1f".join(canon(v) for v in rec) for rec in sdf[sorted(sdf.columns)].itertuples(index=False, name=None))}
                orows = {r for r in ("\x1f".join(canon(v) for v in rec) for rec in odf[sorted(odf.columns)].itertuples(index=False, name=None))}
                for r in list(srows - orows)[:5]:
                    print("       spark-only:", r.replace("\x1f", " | ")[:200])
                for r in list(orows - srows)[:5]:
                    print("       oracle-only:", r.replace("\x1f", " | ")[:200])
    print(f"\n{len(names) - failures}/{len(names)} ok")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
