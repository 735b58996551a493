#!/usr/bin/env python
"""Dedicated-session settlement bench: time a SUBSET of registered
queries with the headline protocol (warmup + 3 timed runs, min + spread,
load-avg annotations) in a fresh quiet JVM. This is the tool behind
BASELINE.md's judging bands — a full-bench session's later rows inherit
executor drain from earlier rows, so band evidence comes from sessions
that run ONLY the rows under settlement.

Usage: python tools/bench_settle.py name [name...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line {"queries": {name: min}, "spread": ..., "load": ...}.
Refuses to start when the 1-min load average says the box is busy —
a "dedicated quiet session" reading taken under load is worse than no
reading (it pollutes the min-of-mins history).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_settle.py query [query...]", file=sys.stderr)
        raise SystemExit(2)

    load0 = os.getloadavg()[0]
    limit = max(2.0, 0.25 * (os.cpu_count() or 8))
    if load0 > limit and os.environ.get("SPARK_GRAFT_FORCE") != "1":
        print(
            f"load {load0:.2f} > {limit:.2f}: not a quiet box — refusing "
            "(SPARK_GRAFT_FORCE=1 overrides)",
            file=sys.stderr,
        )
        raise SystemExit(3)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from bravo_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(app_name="bravo_settle", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        raise SystemExit(2)

    qs["p1_value_kv"](spark, sf_dir).count()  # JVM/footer warmup, untimed

    timings, spreads, loads = {}, {}, {}
    for name in names:
        qs[name](spark, sf_dir).count()  # per-query codegen warmup
        before = round(os.getloadavg()[0], 2)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        spreads[name] = [round(r, 3) for r in sorted(runs)]
        loads[name] = [before, round(os.getloadavg()[0], 2)]
        print(f"# {name}: min={timings[name]:.3f}s spread={spreads[name]}"
              f" load={loads[name]}", file=sys.stderr)

    print(json.dumps({"queries": timings, "spread": spreads, "load": loads,
                      "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
