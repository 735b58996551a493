"""Standing guards for bench.py's stdout contract.

BENCH_r16.json was ``parsed: null`` because the r16 headline line grew
past the driver's ~2000-char combined-output tail capture. These tests
make that failure structural-impossible: the serialized headline payload
for the CURRENT row count must stay under 1800 chars, and the detail
fields that caused the overflow must never return to the headline.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _worst_case_timings(bench) -> dict[str, float]:
    # Worst realistic serialization: every row present, 3-digit integer
    # part + 2 decimals (e.g. 123.45 — no headline row has ever exceeded
    # 10 s, so this over-provisions by an order of magnitude).
    return {name: 123.45 for name in bench.HEADLINE}


def test_headline_line_fits_driver_tail(bench):
    payload = bench.headline_payload(_worst_case_timings(bench), 0.1)
    line = json.dumps(payload)
    assert len(line) < 1800, (
        f"headline JSON is {len(line)} chars for {len(bench.HEADLINE)} "
        "rows; the driver tail-captures ~2000 chars of combined output — "
        "shorten row names, trim fields, or split the suite before adding "
        "more rows"
    )


def test_headline_has_only_compact_fields(bench):
    payload = bench.headline_payload(_worst_case_timings(bench), 0.1)
    assert set(payload) == {
        "metric", "value", "unit", "queries", "like_for_like_sec", "sf"
    }
    # the r16 overflow fields must stay in BENCH_DETAIL.json
    for banned in ("spread", "load", "phase_order"):
        assert banned not in payload


def test_headline_queries_rounded_to_2dp(bench):
    payload = bench.headline_payload({"tpch_q1": 1.23456}, 0.1)
    assert payload["queries"]["tpch_q1"] == 1.23


def test_like_for_like_is_r1_row_set(bench):
    # pinned to BENCH_r01.json's exact 17 rows
    assert len(bench.LIKE_FOR_LIKE) == 17
    assert set(bench.LIKE_FOR_LIKE) <= set(bench.HEADLINE)
    t = {name: 1.0 for name in bench.HEADLINE}
    assert bench.headline_payload(t, 0.1)["like_for_like_sec"] == 17.0
