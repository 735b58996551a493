#!/usr/bin/env python
"""Capture .explain("formatted") for bench rows into plans/<tag>/.

Usage: python tools/capture_plans.py --tag r19 --suffix before [names...]

With no names, captures every row in bench.HEADLINE. Each query function
is invoked once (fixture side effects included) and its formatted plan is
written to plans/<tag>/<name>_<suffix>.txt. No actions are executed beyond
what a query function itself runs at plan-build time (fixture writes,
index builds), so this is cheap relative to the bench.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import bench
    from bravo_spark.session import get_spark
    import __spark_entry__ as entry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bravo_plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    names = args.names or bench.HEADLINE
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(outdir, exist_ok=True)
    # r20 (advice): capture failures are still recorded in the output file
    # so the artifact set stays complete, but they now fail the run —
    # a broken plan construction must not hide inside a green exit code.
    failed: list[str] = []
    for name in names:
        if name not in qs:
            print(f"# skip {name}: not registered", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record, keep capturing
            plan = f"ERROR capturing plan: {exc!r}\n"
            failed.append(name)
        fname = f"{name}_{args.suffix}.txt" if args.suffix else f"{name}.txt"
        with open(os.path.join(outdir, fname), "w") as fh:
            fh.write(plan)
        print(f"# {name}: {len(plan)} chars", file=sys.stderr)
    spark.stop()
    if failed:
        print(f"# {len(failed)} capture(s) FAILED: {failed}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
