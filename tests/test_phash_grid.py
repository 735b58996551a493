"""Exhaustive sweep of image_phash_dedup's md5-derived parameter grid.

The query's oracle asserts ``jpeg_stable = 1`` (and
``shift_invariant = 1``) closed-form for EVERY row, but only ~500 of
the 75,240 reachable (w, h, p, q, r) combinations are exercised per
corpus run — the r10 ADVICE finding was that one adversarial combo on a
different corpus would flip the oracle red with no engine bug. This
sweep verifies the Hamming<=10 bound after the quality-95 JPEG round
trip, and exact dHash/aHash equality under a +5 brightness shift, for
the FULL finite grid the md5 derivation can reach, so the closed-form
oracle assertion is actually proven for every reachable input.

Grid (from image_phash_dedup): w in 18..36, h in 14..24, p in 40..79,
q in 3..5, r in 1..3 — 19*11*40*3*3 = 75,240 combos. ~280 s
single-core, fanned across cores with fork-multiprocessing (the worker
imports only the pure-Python codec modules, no JVM).
"""

from __future__ import annotations

import multiprocessing
import os


def _sweep_wh(args):
    """All 360 (p, q, r) combos for one (w, h); returns failures."""
    w, h = args
    from bravo_spark.inventory.jpeg import jpeg_decode_pixels, jpeg_encode
    from bravo_spark.inventory.multimodal import ahash64, dhash64

    bad = []
    for p in range(40, 80):
        for q in (3, 4, 5):
            for r in (1, 2, 3):
                raw = bytes(
                    p + q * min(x, w - 1 - x) + r * y
                    for y in range(h)
                    for x in range(w)
                )
                d0, a0 = dhash64(raw, w, h, 1), ahash64(raw, w, h, 1)
                shifted = bytes(v + 5 for v in raw)
                if (dhash64(shifted, w, h, 1), ahash64(shifted, w, h, 1)) != (
                    d0,
                    a0,
                ):
                    bad.append(("shift", w, h, p, q, r))
                    continue
                gw, gh, mode, back = jpeg_decode_pixels(
                    jpeg_encode(w, h, "L", raw, quality=95)
                )
                if (gw, gh, mode) != (w, h, "L"):
                    bad.append(("shape", w, h, p, q, r))
                    continue
                hd = bin(d0 ^ dhash64(back, w, h, 1)).count("1")
                ha = bin(a0 ^ ahash64(back, w, h, 1)).count("1")
                if hd > 10 or ha > 10:
                    bad.append(("jpeg", w, h, p, q, r, hd, ha))
    return bad


def test_full_parameter_grid_is_shift_invariant_and_jpeg_stable():
    grid = [(w, h) for w in range(18, 37) for h in range(14, 25)]
    assert len(grid) == 19 * 11
    workers = min(32, os.cpu_count() or 4)
    with multiprocessing.get_context("fork").Pool(workers) as pool:
        failures = [f for fs in pool.map(_sweep_wh, grid) for f in fs]
    assert not failures, f"{len(failures)} combos broke: {failures[:10]}"
