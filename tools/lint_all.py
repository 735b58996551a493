#!/usr/bin/env python
"""Lint every side-effect-free registered query's plan with
bravo_spark.plan_lint and summarize findings by severity.

The gate window lints as a standing pytest (tests/test_plan_lint.py);
this sweep covers the WHOLE registry so the COVERAGE.md claim ("all
side-effect-free registered plans lint error-free") is reproducible:

    python tools/lint_all.py [--sf /root/testdata/sf0.001]

Queries whose CONSTRUCTION runs work (streaming lifecycles, state
surgery, index/fixture writes) are skipped by the same marker list the
standing test uses, plus the fixture-writing format/ingest rows.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# superset of tests/test_plan_lint.py's markers: the format/ingest rows
# write fixture files at construction time
SIDE_EFFECTFUL_MARKERS = (
    "streaming", "rewrite", "rewind", "state_diff", "state_read",
    "state_migration", "savepoint_diff", "rescale", "lloyd", "bpe_train",
    "pagerank", "dedup_clusters", "dedup_semantic", "ivf_index_search",
    "write_roundtrip", "sink", "source_roundtrip", "ingest",
    "phrase_search_index", "roundtrip",
    # r17: construction persists an index/LM before the returned plan
    "index_stats", "persist",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bravo_spark.plan_lint import lint_plan
    from bravo_spark.session import get_spark

    spark = get_spark(app_name="bravo_lint_all", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    linted = skipped = 0
    errors: dict[str, list[str]] = {}
    warns = infos = 0
    for name, fn in qs.items():
        if any(m in name for m in SIDE_EFFECTFUL_MARKERS):
            skipped += 1
            continue
        try:
            findings = lint_plan(fn(spark, args.sf))
        except Exception as exc:  # noqa: BLE001 - report, don't die
            errors[name] = [f"lint crashed: {type(exc).__name__}: {exc}"]
            continue
        linted += 1
        errs = [f.check for f in findings if f.severity == "error"]
        warns += sum(1 for f in findings if f.severity == "warn")
        infos += sum(1 for f in findings if f.severity == "info")
        if errs:
            errors[name] = errs
    print(
        f"linted={linted} skipped_side_effectful={skipped}"
        f" error_plans={len(errors)} warn_findings={warns}"
        f" info_findings={infos}"
    )
    for name, errs in errors.items():
        print(f"[ERROR] {name}: {errs}")
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
