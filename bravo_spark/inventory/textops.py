"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting, multimodal column plumbing.

All per-document, embarrassingly parallel (no shuffle at all — these scan,
compute JVM-side expressions, and write); at 100 TB they pipeline with the
parquet scan. No Python UDFs in any of them except the multimodal decode
stub, which is explicitly the mapInPandas plumbing demonstration.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

from bravo_spark import catalog
from bravo_spark.inventory.registry import query

TOKEN_RE = "[a-z0-9]+"


def _docs_payload(spark, sf_dir):
    """(doc_id, payload) scan for the per-document codec rows (JPEG/GIF/
    AVI/DIB/WAV/phash/resample), SPREAD across the session's cores when
    the fixture scan yields too few splits (catalog.table_spread — a
    conditional round-robin that is a no-op at production split counts).
    r20, guide §2.5 input skew: the pure-Python codec CPU *is* these
    jobs, and the one-row-group fixture parquet previously serialized
    all of it onto a single core (~50 s combined per full-registry
    sweep). The exchange moves (doc_id, text) once — metadata-scale
    next to the per-document codec work it unblocks — and the scan
    stays pruned to exactly (doc_id, text) (pinned in
    tests/test_plans.py::test_r8_modality_queries_are_map_only_and_pruned)."""
    return catalog.table_spread(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

# ---------------------------------------------------------------------------
# language ID: stopword-hit scoring over fixed per-language lists.
# count(w) via the length-difference-of-replace trick — identical replace
# semantics (greedy, non-overlapping, all occurrences) on both engines.
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "les", "et", "des", "un"],
}


def _count_expr(word: str) -> str:
    # occurrences of ' word ' in the space-padded, lowercased text
    pat = f" {word} "
    return (
        f"CAST((length(padded) - length(replace(padded, '{pat}', '')))"
        f" / {len(pat)} AS BIGINT)"
    )


def _langid_sql() -> str:
    scores = ", ".join(
        "(" + " + ".join(_count_expr(w) for w in ws) + f") AS s_{lang}"
        for lang, ws in _STOPWORDS.items()
    )
    langs = list(_STOPWORDS)
    mx = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pick = "CASE " + " ".join(
        f"WHEN s_{lang} = mx AND mx > 0 THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    return (
        f"SELECT doc_id, {pick} AS lang_pred, mx AS best_score FROM ("
        f"SELECT doc_id, {scores}, {mx} AS mx FROM ("
        "SELECT doc_id, concat(' ', lower(text), ' ') AS padded FROM documents"
        ") p) s"
    )


@query("text_lang_id", oracle=_langid_sql())
def text_lang_id(spark, sf_dir):
    """N-gram/stopword-heuristic language ID; ties broken by fixed language
    priority so the result is deterministic."""
    return spark.sql(_langid_sql())


# ---------------------------------------------------------------------------
# quality scoring: length / word stats / stopword ratio.
# ---------------------------------------------------------------------------


def _quality_spark_sql() -> str:
    return f"""
SELECT doc_id, n_chars_actual, n_words, alpha_chars,
  CAST(alpha_chars AS DOUBLE) / nullif(n_words, 0) AS avg_word_len,
  CAST(stop_hits AS DOUBLE) / nullif(n_words, 0) AS stop_ratio,
  CASE WHEN n_words BETWEEN 10 AND 10000
        AND CAST(alpha_chars AS DOUBLE) / nullif(n_words, 0) BETWEEN 2.0 AND 12.0
       THEN 1 ELSE 0 END AS is_quality
FROM (
  SELECT doc_id, length(text) AS n_chars_actual,
    size(regexp_extract_all(lower(text), '{TOKEN_RE}', 0)) AS n_words,
    length(regexp_replace(lower(text), '[^a-z0-9]', '')) AS alpha_chars,
    CAST((length(concat(' ', lower(text), ' ')) -
      length(replace(concat(' ', lower(text), ' '), ' the ', ''))) / 5 AS BIGINT)
    AS stop_hits
  FROM documents) t
"""


def _quality_duck_sql() -> str:
    return f"""
SELECT doc_id, n_chars_actual, n_words, alpha_chars,
  CAST(alpha_chars AS DOUBLE) / nullif(n_words, 0) AS avg_word_len,
  CAST(stop_hits AS DOUBLE) / nullif(n_words, 0) AS stop_ratio,
  CASE WHEN n_words BETWEEN 10 AND 10000
        AND CAST(alpha_chars AS DOUBLE) / nullif(n_words, 0) BETWEEN 2.0 AND 12.0
       THEN 1 ELSE 0 END AS is_quality
FROM (
  SELECT doc_id, length(text) AS n_chars_actual,
    len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_words,
    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alpha_chars,
    CAST((length(concat(' ', lower(text), ' ')) -
      length(replace(concat(' ', lower(text), ' '), ' the ', ''))) / 5 AS BIGINT)
    AS stop_hits
  FROM documents) t
"""


@query("text_quality", oracle=_quality_duck_sql())
def text_quality(spark, sf_dir):
    return spark.sql(_quality_spark_sql())


# ---------------------------------------------------------------------------
# token counting: whitespace tokens + BPE-ish subword estimate (regex of
# letter-runs, digit-runs and residual symbols — a cheap proxy with the
# shape of a real tokenizer count).
# ---------------------------------------------------------------------------

_BPE_RE = "[a-z]{1,4}|[0-9]|[^a-z0-9 ]"


@query(
    "text_token_count",
    oracle=(
        "SELECT doc_id,"
        f" len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS ws_tokens,"
        f" len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS bpe_tokens"
        " FROM documents"
    ),
)
def text_token_count(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")).alias(
            "ws_tokens"
        ),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{_BPE_RE}', 0)")).alias(
            "bpe_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# document fingerprint: normalized-text digest (md5; first 16 hex chars) —
# the cheap exact-dup key for incremental pipelines.
# ---------------------------------------------------------------------------


@query(
    "text_fingerprint",
    oracle=(
        "SELECT doc_id, substr(md5(trim(lower(text))), 1, 16) AS fp FROM documents"
    ),
)
def text_fingerprint(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.substring(F.md5(F.trim(F.lower("text"))), 1, 16).alias("fp")
    )


# ---------------------------------------------------------------------------
# multimodal columns: opaque binary payload + typed metadata. The payload
# here is the utf-8 bytes of ``text`` standing in for image/audio bytes; the
# byte-level plumbing (binary column, octet length, prefix inspection) is
# real and oracle-checked.
# ---------------------------------------------------------------------------


@query(
    "multimodal_meta",
    oracle=(
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes,"
        " hex(encode(substr(text, 1, 8))) AS prefix_hex FROM documents"
    ),
)
def multimodal_meta(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.hex(F.encode(F.substring("text", 1, 8), "utf-8")).alias("prefix_hex"),
    )


@query(
    "multimodal_decode",
    oracle=(
        "SELECT doc_id,"
        " 1 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 1024 AS width,"
        " 1 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 1024 AS height,"
        " (1 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 1024) *"
        " (1 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 1024) AS n_pixels,"
        " 'synthetic' AS source"
        " FROM documents"
    ),
)
def multimodal_decode(spark, sf_dir):
    """Image-decode over a binary column via mapInPandas, with PER-PAYLOAD
    runtime selection (inventory/multimodal.py): real image containers
    (PNG/GIF/JPEG magic) decode their TRUE dims from the format headers —
    pure Python, no image library — while non-image payloads (this
    synthetic corpus) fall back to deterministic md5 stand-ins the oracle
    reproduces. The ``source`` column exposes which tier fired, so the
    oracle also proves the selector never mistakes a text payload for an
    image; the pixel tier (pure-Python PNG codec, Pillow for the rest)
    runs on the same plumbing — see ``multimodal_pixel_resize``."""
    from bravo_spark.inventory import multimodal as mm

    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            ids, ws, hs, srcs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, src = mm.decode_meta(bytes(payload))
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                srcs.append(src)
            out = pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs}
            )
            out["n_pixels"] = out["width"] * out["height"]
            out["source"] = srcs
            yield out

    return docs.mapInPandas(
        decode_batches,
        schema="doc_id long, width long, height long, n_pixels long,"
               " source string",
    )


@query(
    "multimodal_pixel_resize",
    oracle="""
WITH dims AS (
  SELECT doc_id,
    1 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 32 AS w,
    1 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 32 AS h
  FROM documents),
fit AS (
  SELECT doc_id, w, h,
    CASE WHEN greatest(w, h) <= 16 THEN w
         ELSE greatest(1, (w * 16) // greatest(w, h)) END AS out_w,
    CASE WHEN greatest(w, h) <= 16 THEN h
         ELSE greatest(1, (h * 16) // greatest(w, h)) END AS out_h
  FROM dims)
SELECT doc_id, w, h, out_w, out_h, out_w * out_h AS raw_len FROM fit
""",
)
def multimodal_pixel_resize(spark, sf_dir):
    """REAL pixel-tier plumbing end-to-end, zero image libraries: per row,
    build a small grayscale PNG (dims md5-derived so the oracle knows
    them; deterministic gradient content), run the pure-Python RFC 2083
    pipeline — ``png_encode`` → ``resize_pixels`` (inflate, un-filter,
    integer nearest-neighbor, re-encode) → ``png_decode_pixels`` — and
    report the dims and raw-byte length of the ACTUAL decoded output.
    Every reported number comes from decoding real bytes the pipeline
    produced, so a wrong stride, filter reconstruction, or resample grid
    breaks the hash; pixel VALUES are golden-pinned in
    test_multimodal.py (not SQL-expressible). Arrow-batched mapInPandas,
    map-only plan — the exact shape a 100 TB image-corpus resize job
    has, with the decode swapped for the heavier real codec."""
    from bravo_spark.inventory import multimodal as mm

    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def resize_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                w = 1 + int(digest[0:8], 16) % 32
                h = 1 + int(digest[8:16], 16) % 32
                raw = bytes((x * y) % 256 for y in range(h) for x in range(w))
                png = mm.png_encode(w, h, "L", raw)
                out_w, out_h, mode, out_raw = mm.png_decode_pixels(
                    mm.resize_pixels(png, box=16)
                )
                assert mode == "L"
                rows.append((doc_id, w, h, out_w, out_h, len(out_raw)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "w", "h", "out_w", "out_h", "raw_len"]
            )

    return docs.mapInPandas(
        resize_batches,
        schema="doc_id long, w long, h long, out_w long, out_h long,"
               " raw_len long",
    )


@query(
    "multimodal_jpeg_roundtrip",
    oracle="""
SELECT doc_id,
  8 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 25 AS w,
  8 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 25 AS h,
  CAST(1 AS BIGINT) AS within_tol
FROM documents
""",
)
def multimodal_jpeg_roundtrip(spark, sf_dir):
    """The pure-Python baseline JPEG codec (inventory/jpeg.py) proven
    end-to-end per row: md5-derived dims → deterministic RGB gradient →
    ``jpeg_encode`` (4:4:4, q95) → ``jpeg_decode_pixels`` → report the
    DECODED dims and a within-tolerance flag (max per-channel error ≤ 3 —
    the DCT quantization floor for smooth content at q95). The oracle
    derives the dims from the same md5 and asserts within_tol = 1 for
    every document, so a stride, Huffman, dequantization, or color-space
    regression flips real rows red; exact pixel bounds per sampling/
    restart variant are pinned in tests/test_jpeg.py (not SQL-
    expressible). Arrow-batched mapInPandas, map-only plan — the per-
    payload codec cost IS the job, exactly how a 100 TB image-corpus
    transcode distributes."""
    from bravo_spark.inventory.jpeg import jpeg_decode_pixels, jpeg_encode

    docs = _docs_payload(spark, sf_dir)

    def roundtrip_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                w = 8 + int(digest[0:8], 16) % 25
                h = 8 + int(digest[8:16], 16) % 25
                # wrap-free gradients (dims ≤ 32, so x*7 ≤ 217, y*6 ≤ 186)
                # — a modulo wrap would put a step edge in the content and
                # DCT ringing past the smooth-content tolerance
                raw = bytes(
                    (x * 7, y * 6, x * 3 + y * 3)[c]
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                enc = jpeg_encode(w, h, "RGB", raw, quality=95)
                got_w, got_h, mode, out = jpeg_decode_pixels(enc)
                assert mode == "RGB"
                max_err = max(
                    abs(a - b) for a, b in zip(out, raw)
                ) if out else 0
                rows.append(
                    (doc_id, got_w, got_h, 1 if max_err <= 3 else 0)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "w", "h", "within_tol"]
            )

    return docs.mapInPandas(
        roundtrip_batches,
        schema="doc_id long, w long, h long, within_tol long",
    )


@query(
    "multimodal_gif_roundtrip",
    oracle="""
SELECT doc_id,
  4 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 29 AS w,
  4 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 29 AS h,
  CAST(1 AS BIGINT) AS exact
FROM documents
""",
)
def multimodal_gif_roundtrip(spark, sf_dir):
    """The pure-Python GIF codec (inventory/gif.py) proven end-to-end per
    row: md5-derived dims → ≤256-color deterministic pattern →
    ``gif_encode`` (LZW) → ``gif_decode_pixels`` → report decoded dims
    and an EXACTNESS flag. GIF is palette-lossless, so unlike the JPEG
    tier's tolerance audit the oracle asserts BYTE-EXACT recovery for
    every document — any LZW, palette, or compositing regression flips
    real rows red. Arrow-batched mapInPandas, map-only plan."""
    from bravo_spark.inventory.gif import gif_decode_pixels, gif_encode

    docs = _docs_payload(spark, sf_dir)

    def roundtrip_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                w = 4 + int(digest[0:8], 16) % 29
                h = 4 + int(digest[8:16], 16) % 29
                # 16x16-cell color grid: ≤256 distinct colors at any dims
                raw = bytes(
                    ((x * 16) % 256, (y * 16) % 256, 40)[c]
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                enc = gif_encode(w, h, "RGB", raw)
                got_w, got_h, mode, out = gif_decode_pixels(enc)
                assert mode == "RGB"
                rows.append(
                    (doc_id, got_w, got_h, 1 if out == raw else 0)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "w", "h", "exact"]
            )

    return docs.mapInPandas(
        roundtrip_batches,
        schema="doc_id long, w long, h long, exact long",
    )


@query(
    "multimodal_gif_frame_sample",
    oracle="""
WITH meta AS (
  SELECT doc_id,
    2 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 6 AS n_frames
  FROM documents)
SELECT doc_id, n_frames, unnest(list_distinct(
  [CAST(0 AS BIGINT), n_frames // 2, n_frames - 1])) AS frame_idx,
  CAST(1 AS BIGINT) AS exact
FROM meta
ORDER BY doc_id, frame_idx
""",
)
def multimodal_gif_frame_sample(spark, sf_dir):
    """REAL frame sampling over an animated container, end-to-end pure
    Python: per document, build an animated GIF (md5-derived frame count,
    deterministic per-frame palette pattern), then decode it back with
    ``gif_iter_frames`` and keep the first/middle/last frames — the
    uniform-k sampling a video-training pipeline runs, with the decode
    step REAL instead of the digest stand-in ``multimodal_frame_sample``
    uses for opaque video bytes. Each sampled frame's decoded pixels are
    compared against the generator (GIF is lossless), so the oracle can
    assert exact = 1 for every row; any LZW or multi-frame compositing
    regression flips real rows red. 1→k mapInPandas, map-only plan."""
    from bravo_spark.inventory.gif import gif_encode_animation, gif_iter_frames

    docs = _docs_payload(spark, sf_dir)

    def sample_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        w, h = 16, 12

        def frame_raw(k: int) -> bytes:
            # 16 colors per frame × ≤7 frames ≤ 112 distinct total — well
            # under the 256-color global-palette lossless bound
            return bytes(
                ((x + k) % 4 * 64, (y + k) % 4 * 64, (k % 4) * 64)[c]
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                n = 2 + int(digest[0:8], 16) % 6
                frames = [frame_raw(k) for k in range(n)]
                anim = gif_encode_animation(w, h, frames)
                decoded = {
                    i: raw for i, _, _, _, raw in gif_iter_frames(anim)
                }
                assert len(decoded) == n
                for idx in sorted({0, n // 2, n - 1}):
                    ok = 1 if decoded[idx] == frames[idx] else 0
                    rows.append((doc_id, n, idx, ok))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "frame_idx", "exact"]
            )

    return docs.mapInPandas(
        sample_batches,
        schema="doc_id long, n_frames long, frame_idx long, exact long",
    )


@query(
    "audio_wav_features",
    oracle="""
WITH params AS (
  SELECT doc_id,
    200 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 800 AS n,
    100 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 900 AS amp,
    5 + CAST(('0x' || substr(md5(text), 17, 8)) AS BIGINT) % 36 AS period
  FROM documents)
SELECT doc_id, n AS n_frames, n // 8 AS duration_ms, amp AS peak,
  amp * 1000 AS rms_milli, (n - 1) // period AS zero_crossings
FROM params
""",
)
def audio_wav_features(spark, sf_dir):
    """The AUDIO modality end-to-end, pure Python (inventory/audio.py):
    per document, synthesize a square wave with md5-derived amplitude /
    period / length, container it as real 16-bit PCM RIFF/WAVE, then
    DECODE the bytes back and extract integer-exact signal features
    (peak, RMS in milli-units, zero crossings, duration). A square wave's
    features have closed forms — RMS = amplitude exactly — so the oracle
    recomputes every value from the same md5 and the driver's hash check
    covers the whole WAV parse + PCM decode + DSP path; byte-level codec
    pins (8/24/32-bit, foreign-encoder files, truncation fuzz) live in
    tests/test_audio.py. Arrow-batched mapInPandas, map-only plan."""
    from bravo_spark.inventory.audio import pcm_features, wav_encode

    docs = _docs_payload(spark, sf_dir)

    def feature_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                n = 200 + int(digest[0:8], 16) % 800
                amp = 100 + int(digest[8:16], 16) % 900
                period = 5 + int(digest[16:24], 16) % 36
                wave = [
                    amp if (i // period) % 2 == 0 else -amp for i in range(n)
                ]
                feats = pcm_features(wav_encode(8000, 1, 16, wave))
                rows.append(
                    (
                        doc_id, feats["n_frames"], feats["duration_ms"],
                        feats["peak"], feats["rms_milli"],
                        feats["zero_crossings"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "duration_ms", "peak",
                    "rms_milli", "zero_crossings",
                ],
            )

    return docs.mapInPandas(
        feature_batches,
        schema="doc_id long, n_frames long, duration_ms long, peak long,"
               " rms_milli long, zero_crossings long",
    )


@query(
    "quality_calibration_by_source",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source,
    len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS score
  FROM documents),
ranked AS (
  SELECT source, score,
    row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS rk,
    count(*) OVER (PARTITION BY source) AS n
  FROM scored)
SELECT source,
  CASE WHEN n = 1 THEN 0
       ELSE LEAST(9, ((rk - 1) * 10) // (n - 1)) END AS decile,
  count(*) AS n_docs, min(score) AS min_score, max(score) AS max_score
FROM ranked
GROUP BY source, CASE WHEN n = 1 THEN 0
                      ELSE LEAST(9, ((rk - 1) * 10) // (n - 1)) END
""",
)
def quality_calibration_by_source(spark, sf_dir):
    """Per-domain quality calibration: a raw quality signal (here token
    count; any integer score plugs in) is NOT comparable across sources
    — a p50 news article and a p50 forum post differ wildly — so rank-
    normalize within source before any global threshold. Deciles are
    computed from integer ranks with floor division (no percent_rank
    float), so every bucket boundary is bit-identical cross-engine; ties
    break on doc_id for determinism.

    Scale shape: one shuffle on the calibration key (source), ranking as
    a within-partition window, then partial-aggregated decile stats —
    output is O(sources × 10). The exact-rank form is the
    oracle-checkable variant; at 100 TB with mega-domains you'd swap the
    window for approx percentile boundaries (approx_sketch_accuracy
    gates that path) and keep this as the acceptance check."""
    from pyspark.sql import Window as _W

    docs = catalog.table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).cast("long").alias("score"),
    )
    w = _W.partitionBy("source").orderBy("score", "doc_id")
    ranked = scored.select(
        "source",
        "score",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(_W.partitionBy("source")).alias("n"),
    )
    decile = F.when(F.col("n") == 1, F.lit(0)).otherwise(
        F.least(F.lit(9), F.expr("((rk - 1) * 10) div (n - 1)"))
    )
    return (
        ranked.withColumn("decile", decile.cast("long"))
        .groupBy("source", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
    )


@query(
    "audio_float_features",
    oracle="""
WITH params AS (
  SELECT doc_id,
    200 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 800 AS n,
    100 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 900 AS m,
    5 + CAST(('0x' || substr(md5(text), 17, 8)) AS BIGINT) % 36 AS period
  FROM documents)
SELECT doc_id, n AS n_frames, n // 8 AS duration_ms,
  CAST(FLOOR((3 * m * 32767.0) / 65536.0 + 0.5) AS BIGINT) AS peak,
  CAST(FLOOR((3 * m * 32767.0) / 65536.0 + 0.5) AS BIGINT) * 1000
    AS rms_milli,
  (n - 1) // period AS zero_crossings
FROM params
""",
)
def audio_float_features(spark, sf_dir):
    """The FLOAT-PCM audio path end-to-end: per document, synthesize a
    square wave with md5-derived amplitude numerator m (float value
    ±3m/65536 — a dyadic rational, exactly representable in float32, so
    the normalization floor(|f|*32767 + 0.5) is reproducible closed-form
    in any IEEE engine yet NOT the identity), container it as a real
    IEEE-float RIFF/WAVE (format 3), decode through the shared
    clamp-and-round normalizer, and extract the integer-exact features.
    The oracle recomputes peak = floor(3m*32767/65536 + 0.5) and
    RMS = peak exactly (square wave), so the driver's hash check covers
    the float parse +
    normalization + DSP path. Arrow-batched mapInPandas, map-only."""
    from bravo_spark.inventory.audio import pcm_features, wav_encode_float

    docs = _docs_payload(spark, sf_dir)

    def feature_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl
        import struct as _st

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                n = 200 + int(digest[0:8], 16) % 800
                m = 100 + int(digest[8:16], 16) % 900
                period = 5 + int(digest[16:24], 16) % 36
                # dyadic rational (odd numerator 3m over 2^16):
                # exactly representable in float32, and the normalizer's
                # floor(|f|*32767 + 0.5) is NOT the identity on it, so
                # the oracle genuinely re-derives the quantization
                amp = (3 * m) / 65536.0
                # round-trip through float32 exactly as storage will
                amp = _st.unpack("<f", _st.pack("<f", amp))[0]
                wave = [
                    amp if (i // period) % 2 == 0 else -amp
                    for i in range(n)
                ]
                feats = pcm_features(wav_encode_float(8000, 1, wave))
                rows.append(
                    (
                        doc_id, feats["n_frames"], feats["duration_ms"],
                        feats["peak"], feats["rms_milli"],
                        feats["zero_crossings"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "duration_ms", "peak",
                    "rms_milli", "zero_crossings",
                ],
            )

    return docs.mapInPandas(
        feature_batches,
        schema="doc_id long, n_frames long, duration_ms long, peak long,"
               " rms_milli long, zero_crossings long",
    )


_FP_NIBS = ",\n    ".join(
    f"CAST(('0x' || substr(md5(text), {i + 1}, 1)) AS BIGINT) AS n{i}"
    for i in range(16)
)
_FP_BITS = " + ".join(
    f"(CASE WHEN n{i + 1} > n{i} THEN {1 << (14 - i)} ELSE 0 END)"
    for i in range(15)
)


@query(
    "audio_fingerprint",
    oracle=f"""
WITH nibs AS (
  SELECT doc_id,
    {_FP_NIBS}
  FROM documents)
SELECT doc_id, CAST({_FP_BITS} AS BIGINT) AS fingerprint,
  CAST(1 AS BIGINT) AS gain_invariant
FROM nibs
""",
)
def audio_fingerprint(spark, sf_dir):
    """Acoustic fingerprinting, value-checked: per document, synthesize
    a 16-window signal whose window amplitudes come from the md5
    nibbles, round-trip it through real 16-bit PCM WAV, and compute the
    energy-delta fingerprint (one bit per consecutive window pair — the
    Shazam-style sketch's integer-exact core). Window energy is
    amp²·window_len exactly for a square wave, so consecutive-energy
    comparisons ARE consecutive-nibble comparisons and the oracle
    recomputes the exact 15-bit fingerprint integer from the same md5 —
    a windowing offset, energy overflow, or bit-order bug flips real
    values red. ``gain_invariant`` pins the key's dedup property: a 3×
    amplified copy fingerprints identically (energies scale by the same
    square). Arrow-batched mapInPandas, map-only."""
    from bravo_spark.inventory.audio import (
        energy_fingerprint,
        wav_decode,
        wav_encode,
    )

    docs = _docs_payload(spark, sf_dir)
    N_WIN, WLEN, PERIOD = 16, 32, 8

    def fp_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                wave = []
                for wdx in range(N_WIN):
                    amp = 100 + 50 * int(digest[wdx], 16)
                    wave += [
                        amp if (i // PERIOD) % 2 == 0 else -amp
                        for i in range(WLEN)
                    ]
                _sr, _ch, _bits, samples = wav_decode(
                    wav_encode(8000, 1, 16, wave)
                )
                fp = energy_fingerprint(samples, N_WIN)
                louder = [min(3 * s, 32767) for s in samples]
                inv = 1 if energy_fingerprint(louder, N_WIN) == fp else 0
                rows.append((doc_id, fp, inv))
            yield pd.DataFrame(
                rows, columns=["doc_id", "fingerprint", "gain_invariant"]
            )

    return docs.mapInPandas(
        fp_batches,
        schema="doc_id long, fingerprint long, gain_invariant long",
    )


@query(
    "image_phash_dedup",
    oracle="""
SELECT doc_id,
  18 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 19 AS w,
  14 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 11 AS h,
  CAST(1 AS BIGINT) AS shift_invariant,
  CAST(1 AS BIGINT) AS jpeg_stable
FROM documents
""",
)
def image_phash_dedup(spark, sf_dir):
    """Perceptual image hashing — the image analog of SimHash text
    dedup: dHash/aHash keys group byte-different but visually-identical
    images (recompressed, brightness-shifted), exactly the near-dups a
    crawl corpus is full of. Per document: synthesize a smooth tent
    gradient (md5-derived, wrap-free), then check the two contracts that
    make the hash a dedup key:

    - ``shift_invariant``: a +5 brightness shift must produce the
      IDENTICAL 64-bit dHash and aHash — structurally exact for our
      integer pipeline (both hashes compare values whose order a
      constant shift preserves; the aHash integer mean shifts by
      exactly 5), so the oracle asserts 1 closed-form.
    - ``jpeg_stable``: a quality-95 JPEG round trip must stay within
      Hamming distance 10 of 64 (random pairs sit near 32). The tent's
      downsampled neighbor steps (≥6 gray levels) dominate the ±3
      quantization floor everywhere but the apex column, bounding the
      flippable bits well under the threshold — and the bound is not
      an informal argument: tests/test_phash_grid.py exhaustively
      sweeps ALL 75,240 reachable (w, h, p, q, r) combinations, so the
      oracle's closed-form ``1`` is verified for every input any
      corpus can md5-derive.

    At scale the 64-bit key feeds the same machinery as text SimHash:
    group equal keys, or band the bits for Hamming-near buckets.
    Arrow-batched mapInPandas, map-only."""
    from bravo_spark.inventory.jpeg import jpeg_decode_pixels, jpeg_encode
    from bravo_spark.inventory.multimodal import ahash64, dhash64

    docs = _docs_payload(spark, sf_dir)

    def hash_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                w = 18 + int(digest[0:8], 16) % 19
                h = 14 + int(digest[8:16], 16) % 11
                p = 40 + int(digest[16:24], 16) % 40
                q = 3 + int(digest[24:28], 16) % 3
                r = 1 + int(digest[28:32], 16) % 3
                raw = bytes(
                    p + q * min(x, w - 1 - x) + r * y
                    for y in range(h)
                    for x in range(w)
                )
                d0, a0 = dhash64(raw, w, h, 1), ahash64(raw, w, h, 1)
                shifted = bytes(v + 5 for v in raw)
                d1, a1 = dhash64(shifted, w, h, 1), ahash64(shifted, w, h, 1)
                gw, gh, mode, back = jpeg_decode_pixels(
                    jpeg_encode(w, h, "L", raw, quality=95)
                )
                assert (gw, gh, mode) == (w, h, "L")
                d2, a2 = dhash64(back, w, h, 1), ahash64(back, w, h, 1)
                hd = bin(d0 ^ d2).count("1")
                ha = bin(a0 ^ a2).count("1")
                rows.append(
                    (
                        doc_id, w, h,
                        1 if (d0 == d1 and a0 == a1) else 0,
                        1 if (hd <= 10 and ha <= 10) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "w", "h", "shift_invariant", "jpeg_stable"],
            )

    return docs.mapInPandas(
        hash_batches,
        schema="doc_id long, w long, h long, shift_invariant long,"
               " jpeg_stable long",
    )


@query(
    "heavy_hitters_two_phase",
    oracle=(
        "SELECT w, cnt FROM ("
        " SELECT w, count(*) AS cnt, row_number() OVER ("
        "  ORDER BY count(*) DESC, w) AS rk"
        f" FROM (SELECT unnest(regexp_extract_all(lower(text),"
        f" '{TOKEN_RE}')) AS w FROM documents) t GROUP BY w) r"
        " WHERE rk <= 20"
    ),
)
def heavy_hitters_two_phase(spark, sf_dir):
    """Exact top-20 tokens WITHOUT ever shuffling the full vocabulary —
    the two-phase heavy-hitters pattern a 100 TB corpus needs:

    1. map-side weighted-SpaceSaving summaries (capacity 200) per
       partition via ``mapInPandas`` — zero shuffle, each partition
       emits ≤200 candidate tokens plus one total row carrying its
       token count and whether it ever evicted;
    2. exact recount restricted to the candidate union (a broadcast
       semi-join keeps only candidate tokens, so the one aggregation
       shuffle carries candidates instead of the whole vocabulary),
       then the tiny global top-k.

    The sketch phase is vectorized: each Arrow batch is pre-reduced
    with ``value_counts()`` (C-side), and the SpaceSaving structure is
    updated once per UNIQUE token with its batch count — the classic
    weighted-SpaceSaving update, whose per-partition guarantee (any
    absent token's true partition count ≤ the minimum counter ≤
    N_p/capacity) is order- and weight-independent. Eviction uses a
    lazy-deletion heap, so each update is O(log cap) amortized instead
    of an O(cap) min() scan.

    Coverage is a THEOREM for the key union, not an assumption: a token
    absent from every partition summary has global count ≤ Σ N_p/cap =
    N/cap. That alone does NOT prove the true top-k is covered on a
    flat distribution (a 20th-ranked token could hide below N/cap), so
    the plan VALIDATES the precondition at runtime instead of asserting
    it: the output is exact iff no partition ever evicted (summaries =
    exact per-partition vocabularies) OR the recounted 20th candidate
    count exceeds N/cap (then any non-candidate is strictly outranked
    by 20 candidates). When neither holds the query raises via
    ``assert_true`` rather than silently returning a wrong "exact"
    top-k — the refuse-loudly posture; on such corpora run the plain
    exact group-by instead. The oracle is the exact top-20 SQL, so a
    dropped heavy hitter OR a spurious raise turns the row red.
    Estimates are never reported; the sketch only proposes, exact
    counts decide."""
    docs = catalog.table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("w")
    )

    cap = 200
    candidates, totals = _spacesaving_sketch(words, cap=cap)
    recount = (
        words.join(F.broadcast(candidates), "w", "left_semi")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window as _W

    rk = F.row_number().over(_W.orderBy(F.col("cnt").desc(), F.col("w")))
    top = recount.withColumn("rk", rk).filter(F.col("rk") <= 20)
    # runtime validation of the coverage precondition (metadata-scale:
    # ≤20 rows × one totals row). kth = the worst recounted candidate in
    # the returned window; exact iff no eviction anywhere or kth·cap > N.
    guard = F.assert_true(
        (F.col("ev") == 0) | (F.col("kth") * F.lit(cap) > F.col("n_total")),
        "heavy_hitters_two_phase: sketch coverage precondition failed "
        "(flat head distribution) — rerun with a larger capacity or the "
        "plain exact group-by",
    )
    return (
        top.withColumn("kth", F.min("cnt").over(_W.partitionBy()))
        .crossJoin(F.broadcast(totals))
        .filter(guard.isNull())
        .select("w", "cnt")
    )


def _spacesaving_reduce(series_iter, cap: int):
    """Weighted SpaceSaving over an iterable of pandas string Series
    (one per Arrow batch): returns ``(counters, n_seen, evicted,
    n_updates)``. Each batch is pre-reduced C-side with
    ``value_counts()`` and the summary updated once per UNIQUE token
    with its batch count — n_updates counts exactly those Python
    iterations, pinned O(unique-per-batch) by
    tests/test_heavy_hitters.py. Eviction pops a lazy-deletion heap
    (stale entries carry counts strictly below the live value, because
    a live counter only grows and a re-inserted key restarts above its
    eviction floor), so updates are O(log cap) amortized; ties evict
    the smallest (count, key) exactly like the min() scan it replaces.

    Invariant (weighted SpaceSaving, order-independent): any token
    absent from ``counters`` has true weight ≤ min(counters.values())
    ≤ n_seen/cap — the per-partition half of the coverage theorem in
    heavy_hitters_two_phase's docstring."""
    import heapq

    counters: dict[str, int] = {}
    heap: list[tuple[int, str]] = []  # lazy (count, key) entries
    n_seen = 0
    evicted = 0
    n_updates = 0
    for series in series_iter:
        n_seen += len(series)
        # C-side pre-reduction: one Python-loop iteration per UNIQUE
        # token in the batch (sorted for deterministic eviction order)
        vc = series.value_counts().sort_index()
        for w, c in vc.items():
            n_updates += 1
            c = int(c)
            if w in counters:
                counters[w] += c
                heapq.heappush(heap, (counters[w], w))
            elif len(counters) < cap:
                counters[w] = c
                heapq.heappush(heap, (c, w))
            else:
                while counters.get(heap[0][1]) != heap[0][0]:
                    heapq.heappop(heap)
                mv, mk = heapq.heappop(heap)
                del counters[mk]
                counters[w] = mv + c
                heapq.heappush(heap, (mv + c, w))
                evicted = 1
    return counters, n_seen, evicted, n_updates


def _spacesaving_sketch(words, cap: int):
    """Per-partition weighted SpaceSaving over a single string column
    ``w``: returns (candidates DF ['w'], totals DF ['n_total','ev'])
    where n_total is the global token count and ev flags whether any
    partition evicted. One pass, zero shuffle; the sketch output is
    metadata-scale (≤ cap+1 rows per partition) and cached so its two
    consumers never rescan the token stream."""

    def spacesaving_batches(batches: Iterator[pd.DataFrame]):
        # one summary per PARTITION (batches of the same partition
        # stream through a single call)
        counters, n_seen, evicted, _ = _spacesaving_reduce(
            (pdf["w"] for pdf in batches), cap
        )
        yield pd.DataFrame(
            {
                "w": list(counters.keys()) + [None],
                "n": [None] * len(counters) + [n_seen],
                "ev": [None] * len(counters) + [evicted],
            }
        )

    from bravo_spark import llmops

    sketch = llmops.track_cache(
        words.mapInPandas(
            spacesaving_batches, schema="w string, n long, ev long"
        )
    )
    candidates = sketch.filter(F.col("w").isNotNull()).select("w").distinct()
    totals = sketch.filter(F.col("w").isNull()).agg(
        F.sum("n").alias("n_total"), F.max("ev").alias("ev")
    )
    return candidates, totals


@query(
    "corpus_drift_tv",
    oracle=f"""
WITH toks AS (
  SELECT CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 2 AS half,
    unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS w
  FROM documents),
counts AS (
  SELECT w,
    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oa,
    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ob
  FROM toks GROUP BY w),
top AS (
  SELECT w, oa, ob FROM (
    SELECT w, oa, ob,
      row_number() OVER (ORDER BY oa + ob DESC, w) AS rk
    FROM counts) r WHERE rk <= 50),
tot AS (SELECT CAST(sum(oa) AS BIGINT) AS na,
               CAST(sum(ob) AS BIGINT) AS nb FROM top)
SELECT na AS n_tokens_a, nb AS n_tokens_b,
  CAST(SUM(abs(CAST(oa AS HUGEINT) * nb - CAST(ob AS HUGEINT) * na)
           * 1000000 // (2 * CAST(na AS HUGEINT) * nb))
       AS BIGINT) AS tv_ppm
FROM top, tot GROUP BY na, nb
""",
)
def corpus_drift_tv(spark, sf_dir):
    """Corpus drift monitoring: total-variation distance between two
    corpus snapshots' token distributions over the vocabulary head
    (top-50 tokens by combined count, deterministic tie-break) — the
    acceptance check before a refreshed crawl replaces last month's in a
    training mix. Snapshots here are the md5-parity halves so the oracle
    can recompute them; in production they are two crawl dates.

    Integer-exact by construction: TV = ½·Σ|p_a − p_b| is computed as
    per-term floor((|o_a·n_b − o_b·n_a|·10⁶) / (2·n_a·n_b)) in 128-bit
    integer arithmetic — DECIMAL(38,0) on Spark (whose ``div`` is exact
    integral division), HUGEINT on DuckDB — because o·n·10⁶ ~ N²·10⁶
    leaves int64 once per-snapshot totals reach ~3 M tokens (and Spark
    would wrap while DuckDB raises); 38 digits cover corpora past 10¹⁵
    tokens. Flooring PER TERM keeps the summed result identical across
    engines; the ≤50-unit downward bias is part of the metric's
    definition. One shuffle on the token, a 50-row head, and a scalar
    join — output is one row. The 50-row head is CACHED because both the
    TV sum and its na/nb normalizer derive from it: uncached, the
    broadcast-scalar branch would re-execute the whole scan+explode+agg
    lineage, doubling the dominant corpus pass (plan-pinned in
    test_plans: exactly one Generate/explode in the physical plan)."""
    docs = catalog.table(spark, sf_dir, "documents")
    half = (
        F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long")
        % 2
    )
    toks = docs.select(
        half.alias("half"),
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("w"),
    )
    counts = toks.groupBy("w").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("oa"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("ob"),
    )
    from pyspark.sql import Window as _W

    rk = F.row_number().over(
        _W.orderBy((F.col("oa") + F.col("ob")).desc(), F.col("w"))
    )
    from bravo_spark import llmops as _llm

    top = _llm.track_cache(
        counts.withColumn("rk", rk).filter(F.col("rk") <= 50)
    )
    tot = top.agg(
        F.sum("oa").alias("na"), F.sum("ob").alias("nb")
    )
    return top.crossJoin(F.broadcast(tot)).groupBy("na", "nb").agg(
        F.sum(
            F.expr(
            "abs(CAST(oa AS DECIMAL(38,0)) * nb - CAST(ob AS DECIMAL(38,0))"
            " * na) * 1000000 div (2 * CAST(na AS DECIMAL(38,0)) * nb)"
        )
        ).alias("tv_ppm")
    ).select(
        F.col("na").alias("n_tokens_a"),
        F.col("nb").alias("n_tokens_b"),
        F.col("tv_ppm"),
    )


@query(
    "multimodal_bilinear_resize",
    oracle="""
WITH params AS (
  SELECT doc_id,
    8 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 17 AS w,
    6 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 11 AS h,
    10 + CAST(('0x' || substr(md5(text), 17, 8)) AS BIGINT) % 40 AS p,
    1 + CAST(('0x' || substr(md5(text), 25, 4)) AS BIGINT) % 5 AS q,
    1 + CAST(('0x' || substr(md5(text), 29, 4)) AS BIGINT) % 5 AS r
  FROM documents),
px AS (
  SELECT doc_id, w, h, p, q, r, idx,
    LEAST(GREATEST((2 * (idx % 16) + 1) * w - 16, 0), (w - 1) * 32) AS sx,
    LEAST(GREATEST((2 * (idx // 16) + 1) * h - 10, 0), (h - 1) * 20) AS sy
  FROM params, (SELECT UNNEST(generate_series(0, 159)) AS idx) g)
SELECT doc_id,
  CAST(16 AS BIGINT) AS out_w, CAST(10 AS BIGINT) AS out_h,
  CAST(SUM(((p * 640 + q * sx * 20 + r * sy * 32 + 320) // 640)
      * (idx + 1)) AS BIGINT) AS checksum,
  CAST(1 AS BIGINT) AS exact
FROM px GROUP BY doc_id
""",
)
def multimodal_bilinear_resize(spark, sf_dir):
    """The BILINEAR tier of the pixel pipeline, value-checked: per
    document, synthesize a linear grayscale gradient p + q·x + r·y
    (md5-derived, wrap-free by construction), round-trip it through the
    real PNG codec, resample to 16×10 with the integer fixed-point
    bilinear kernel, and checksum the actual output pixels
    (Σ value·(idx+1)). Bilinear interpolation reproduces linear
    polynomials, so the oracle recomputes every output pixel closed-form
    — p·D + q·sx·dy + r·sy·dx over D with one half-up rounding — from
    the same md5 and GROUP-BY-sums the identical checksum: any grid,
    clamp, weight, or rounding drift flips real rows red (stronger than
    a tolerance flag — exact values). Arrow-batched mapInPandas,
    map-only."""
    from bravo_spark.inventory.multimodal import (
        png_decode_pixels,
        png_encode,
        resample_bilinear,
    )

    docs = _docs_payload(spark, sf_dir)
    OW, OH = 16, 10

    def resize_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                w = 8 + int(digest[0:8], 16) % 17
                h = 6 + int(digest[8:16], 16) % 11
                p = 10 + int(digest[16:24], 16) % 40
                q = 1 + int(digest[24:28], 16) % 5
                r = 1 + int(digest[28:32], 16) % 5
                raw = bytes(
                    p + q * x + r * y for y in range(h) for x in range(w)
                )
                gw, gh, mode, back = png_decode_pixels(
                    png_encode(w, h, "L", raw)
                )
                assert (gw, gh, mode, back) == (w, h, "L", raw)
                out = resample_bilinear(back, w, h, 1, OW, OH)
                checksum = sum(v * (i + 1) for i, v in enumerate(out))
                # closed form of the same fixed-point spec
                dx, dy = 2 * OW, 2 * OH
                expect = 0
                for idx in range(OW * OH):
                    sx = min(max((2 * (idx % OW) + 1) * w - OW, 0),
                             (w - 1) * dx)
                    sy = min(max((2 * (idx // OW) + 1) * h - OH, 0),
                             (h - 1) * dy)
                    num = p * dx * dy + q * sx * dy + r * sy * dx
                    expect += ((num + dx * dy // 2) // (dx * dy)) * (idx + 1)
                rows.append(
                    (doc_id, OW, OH, checksum, 1 if checksum == expect else 0)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "out_w", "out_h", "checksum", "exact"],
            )

    return docs.mapInPandas(
        resize_batches,
        schema="doc_id long, out_w long, out_h long, checksum long,"
               " exact long",
    )


@query(
    "audio_resample_features",
    oracle="""
WITH params AS (
  SELECT doc_id,
    5 * (40 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 160) AS n,
    100 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 900 AS amp,
    5 * (1 + CAST(('0x' || substr(md5(text), 17, 8)) AS BIGINT) % 7) AS period
  FROM documents)
SELECT doc_id, n // 5 AS n_frames, (n // 5) * 1000 // 1600 AS duration_ms,
  amp AS peak, amp * 1000 AS rms_milli,
  (n // 5 - 1) // (period // 5) AS zero_crossings
FROM params
""",
)
def audio_resample_features(spark, sf_dir):
    """The resample stage of an audio pipeline: decode a real 16-bit
    PCM WAV, boxcar-decimate by 5 (the integer-exact anti-alias +
    downsample pair of a 48k→16k chain), and extract features of the
    downsampled signal. Wave length and period are multiples of the
    factor, so every boxcar window lies inside one square-wave plateau
    and the decimated signal is closed-form — a square wave of length
    n/5 and period p/5 at the same amplitude — which the oracle
    recomputes from the same md5: any off-by-one in window alignment,
    the torn-window drop rule, or the floor mean flips real rows red.
    Arrow-batched mapInPandas, map-only."""
    from bravo_spark.inventory.audio import (
        pcm_decimate,
        signal_features,
        wav_decode,
        wav_encode,
    )

    docs = _docs_payload(spark, sf_dir)

    def feature_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                n = 5 * (40 + int(digest[0:8], 16) % 160)
                amp = 100 + int(digest[8:16], 16) % 900
                period = 5 * (1 + int(digest[16:24], 16) % 7)
                wave = [
                    amp if (i // period) % 2 == 0 else -amp for i in range(n)
                ]
                _sr, _ch, _bits, samples = wav_decode(
                    wav_encode(8000, 1, 16, wave)
                )
                feats = signal_features(pcm_decimate(samples, 5), 1600)
                rows.append(
                    (
                        doc_id, feats["n_frames"], feats["duration_ms"],
                        feats["peak"], feats["rms_milli"],
                        feats["zero_crossings"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "duration_ms", "peak",
                    "rms_milli", "zero_crossings",
                ],
            )

    return docs.mapInPandas(
        feature_batches,
        schema="doc_id long, n_frames long, duration_ms long, peak long,"
               " rms_milli long, zero_crossings long",
    )


@query(
    "video_avi_frame_sample",
    oracle="""
WITH meta AS (
  SELECT doc_id,
    2 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 7 AS n_frames,
    16 + 8 * (CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 3) AS w,
    16 + 8 * (CAST(('0x' || substr(md5(text), 17, 8)) AS BIGINT) % 2) AS h
  FROM documents)
SELECT doc_id, w, h, n_frames, unnest(list_distinct(
  [CAST(0 AS BIGINT), n_frames // 2, n_frames - 1])) AS frame_idx,
  CAST(1 AS BIGINT) AS within_tol
FROM meta
ORDER BY doc_id, frame_idx
""",
)
def video_avi_frame_sample(spark, sf_dir):
    """The VIDEO modality end-to-end, pure Python: per document, build an
    MJPEG AVI (md5-derived frame count and dims; every frame a real
    baseline JPEG from inventory/jpeg.py), then DEMUX the container
    (inventory/avi.py RIFF walk), sample first/middle/last frames, and
    REALLY DECODE each sampled frame's JPEG bytes, reporting a
    within-tolerance flag against the generator (≤3, the smooth-content
    quantization floor at q95). This is the actual video-training
    frame-extraction job with the codec chain real instead of stubbed;
    non-MJPEG codecs (H.264 etc.) refuse by name rather than fake
    frames. The oracle derives dims/count/indices from the same md5 and
    asserts within_tol = 1 for every sampled frame, so a demux offset,
    index, or codec regression flips real rows red. Arrow-batched 1→k
    mapInPandas, map-only plan."""
    from bravo_spark.inventory.avi import avi_encode_mjpeg, avi_iter_frames
    from bravo_spark.inventory.jpeg import jpeg_decode_pixels, jpeg_encode

    docs = _docs_payload(spark, sf_dir)

    def sample_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        def frame_raw(w: int, h: int, k: int) -> bytes:
            # wrap-free gradients (dims ≤ 32, k ≤ 8): smooth content so
            # the q95 JPEG round trip stays within the ±3 floor
            return bytes(
                (x * 6 + k * 3, y * 5, x * 2 + y * 2 + k * 2)[c]
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                n = 2 + int(digest[0:8], 16) % 7
                w = 16 + 8 * (int(digest[8:16], 16) % 3)
                h = 16 + 8 * (int(digest[16:24], 16) % 2)
                raws = [frame_raw(w, h, k) for k in range(n)]
                avi = avi_encode_mjpeg(
                    w, h,
                    [jpeg_encode(w, h, "RGB", r, quality=95) for r in raws],
                    fps=10,
                )
                jpegs = dict(avi_iter_frames(avi))
                assert len(jpegs) == n
                for idx in sorted({0, n // 2, n - 1}):
                    got_w, got_h, mode, out = jpeg_decode_pixels(jpegs[idx])
                    ok = (
                        1
                        if (got_w, got_h, mode) == (w, h, "RGB")
                        and max(
                            abs(a - b) for a, b in zip(out, raws[idx])
                        ) <= 3
                        else 0
                    )
                    rows.append((doc_id, got_w, got_h, n, idx, ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "w", "h", "n_frames", "frame_idx", "within_tol",
                ],
            )

    return docs.mapInPandas(
        sample_batches,
        schema="doc_id long, w long, h long, n_frames long, frame_idx long,"
               " within_tol long",
    )


@query(
    "video_dib_frame_sample",
    oracle="""
WITH meta AS (
  SELECT doc_id,
    2 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 6 AS n_frames,
    9 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 12 AS w,
    7 + CAST(('0x' || substr(md5(text), 17, 8)) AS BIGINT) % 8 AS h
  FROM documents)
SELECT doc_id, w, h, n_frames, unnest(list_distinct(
  [CAST(0 AS BIGINT), n_frames // 2, n_frames - 1])) AS frame_idx,
  CAST(1 AS BIGINT) AS exact
FROM meta
ORDER BY doc_id, frame_idx
""",
)
def video_dib_frame_sample(spark, sf_dir):
    """The RAW-video path of the video modality: per document, build an
    uncompressed 'DIB ' AVI (md5-derived frame count and dims; every
    frame a raw RGB gradient), demux it, and decode the sampled
    first/middle/last frames through the BMP pixel tier
    (avi_iter_frames_pixels). BI_RGB 24-bit is lossless, so the check is
    BYTE-EXACT recovery (exact = 1) — stricter than the MJPEG sibling's
    quantization tolerance; any demux offset, stride/padding, or
    bottom-up row-order regression flips real rows red. Deliberately
    odd, non-word-aligned widths exercise the 4-byte row padding.
    Arrow-batched 1→k mapInPandas, map-only plan — the same shape as
    video_avi_frame_sample (cf. reference test strategy: bravo's
    roundtrip conformance tests, src/test/java/com/king/bravo)."""
    from bravo_spark.inventory.avi import (
        avi_encode_dib,
        avi_iter_frames_pixels,
    )

    docs = _docs_payload(spark, sf_dir)

    def sample_batches(batches: Iterator[pd.DataFrame]):
        import hashlib as _hl

        def frame_raw(w: int, h: int, k: int) -> bytes:
            return bytes(
                ((x * 7 + k * 13) % 256, (y * 11 + k) % 256,
                 (x + y * 3 + k * 29) % 256)[c]
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = _hl.md5(bytes(payload)).hexdigest()
                n = 2 + int(digest[0:8], 16) % 6
                w = 9 + int(digest[8:16], 16) % 12  # hits odd widths
                h = 7 + int(digest[16:24], 16) % 8
                raws = [frame_raw(w, h, k) for k in range(n)]
                avi = avi_encode_dib(w, h, raws, fps=10)
                decoded = {
                    i: (fw, fh, mode, out)
                    for i, fw, fh, mode, out in avi_iter_frames_pixels(avi)
                }
                assert len(decoded) == n
                for idx in sorted({0, n // 2, n - 1}):
                    fw, fh, mode, out = decoded[idx]
                    ok = (
                        1
                        if (fw, fh, mode) == (w, h, "RGB")
                        and out == raws[idx]
                        else 0
                    )
                    rows.append((doc_id, fw, fh, n, idx, ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "w", "h", "n_frames", "frame_idx", "exact",
                ],
            )

    return docs.mapInPandas(
        sample_batches,
        schema="doc_id long, w long, h long, n_frames long, frame_idx long,"
               " exact long",
    )


@query(
    "word_freq_topk",
    oracle=(
        "SELECT w, cnt FROM ("
        " SELECT w, count(*) AS cnt, row_number() OVER ("
        "  ORDER BY count(*) DESC, w) AS rk"
        " FROM (SELECT unnest(regexp_extract_all(lower(text),"
        f" '{TOKEN_RE}')) AS w FROM documents) t GROUP BY w) r"
        " WHERE rk <= 50"
    ),
)
def word_freq_topk(spark, sf_dir):
    """Corpus vocabulary head: top-50 words by frequency (tie-broken by the
    word itself). The classic two-phase count — map-side partial agg, one
    shuffle on the word, then a tiny global top-k."""
    from pyspark.sql import Window as _W

    docs = catalog.table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("w")
    )
    counts = words.groupBy("w").agg(F.count("*").alias("cnt"))
    rk = F.row_number().over(_W.orderBy(F.col("cnt").desc(), F.col("w")))
    return counts.withColumn("rk", rk).filter(F.col("rk") <= 50).select("w", "cnt")


@query(
    "text_levenshtein_pairs",
    oracle=(
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        " levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS dist"
        " FROM documents a JOIN documents b"
        " ON a.doc_id < b.doc_id AND a.doc_id < 15 AND b.doc_id < 15"
    ),
)
def text_levenshtein_pairs(spark, sf_dir):
    """Edit-distance similarity on a bounded candidate set (here: id-range;
    in production: LSH candidates) — exact integer distances, JVM-side.
    All-pairs Levenshtein is O(n²·m²), which is exactly why the LSH/minhash
    operators exist to bound the candidate set first."""
    docs = catalog.table(spark, sf_dir, "documents").filter(F.col("doc_id") < 15)
    a = docs.select(F.col("doc_id").alias("doc_a"), F.substring("text", 1, 40).alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.substring("text", 1, 40).alias("tb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.levenshtein("ta", "tb").alias("dist"))
    )


_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+"  # no backslashes: dialect-safe
_PHONE_RE = "555-[0-9]{4}"

_PII_ORACLE = f"""
WITH pii AS (
  SELECT doc_id,
    concat('contact user', doc_id, '@example.com or 555-',
           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' re: ',
           substr(text, 1, 40)) AS t
  FROM documents
)
SELECT doc_id,
  regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g') AS clean,
  CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones
FROM pii
"""


@query("text_redact_pii", oracle=_PII_ORACLE)
def text_redact_pii(spark, sf_dir):
    """PII scrubbing — the redaction pass every training-data pipeline runs
    before tokenization. The fixtures are synthetic and PII-free, so the
    query first APPENDS deterministic doc_id-derived PII, then scrubs it:
    the oracle proves both the match counts and the redacted strings, so a
    regex-dialect divergence (the patterns avoid backslash classes for
    exactly that reason) or replacement bug breaks the hash. Map-side only —
    zero shuffles at any scale."""
    docs = catalog.table(spark, sf_dir, "documents")
    t = F.concat(
        F.lit("contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" re: "), F.substring("text", 1, 40),
    )
    with_pii = docs.select("doc_id", t.alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE, "<PHONE>",
    )
    return with_pii.select(
        "doc_id",
        clean.alias("clean"),
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
    )


_FRAME_ORACLE = """
WITH f AS (
  SELECT doc_id, text,
         1 + octet_length(encode(text)) % 120 AS n_frames
  FROM documents
), s AS (
  SELECT DISTINCT doc_id, text, (i * n_frames) // 4 AS frame_idx
  FROM f, unnest(range(4)) t(i)
)
SELECT doc_id, frame_idx,
       substr(md5(text || ':' || CAST(frame_idx AS VARCHAR)), 1, 8) AS frame_sig
FROM s
"""


@query("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing: a 1→n ``mapInPandas`` over the opaque
    payload that emits k uniformly-spaced frame indices per document plus a
    per-frame digest (the stand-in for the extracted frame bytes — a real
    deployment swaps the digest for an ffmpeg/PIL crop on the SAME batch
    shape). The synthetic frame count derives from payload length, so the
    oracle can reproduce every row exactly."""
    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def sample_batches(batches: Iterator[pd.DataFrame]):
        import hashlib

        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = 1 + len(raw) % 120
                for frame in sorted({(i * n_frames) // 4 for i in range(4)}):
                    ids.append(doc_id)
                    idxs.append(frame)
                    sigs.append(
                        hashlib.md5(
                            raw + b":" + str(frame).encode()
                        ).hexdigest()[:8]
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_sig": sigs}
            )

    return docs.mapInPandas(
        sample_batches, schema="doc_id long, frame_idx long, frame_sig string"
    )


# ---------------------------------------------------------------------------
# Repetition signals (the Gopher-rules family): unique-word fraction and
# top-word dominance per document. Two grouped aggregations — (doc, word)
# then (doc) — both shuffling on doc_id, so the second reuses the first's
# partitioning; all ratios are single IEEE divisions over exact int counts.
# ---------------------------------------------------------------------------

_REP_KEEP = (
    "CASE WHEN CAST(n_unique AS DOUBLE) / n_words >= 0.2"
    " AND CAST(top_c AS DOUBLE) / n_words <= 0.2 THEN 1 ELSE 0 END"
)


def _repetition_sql(dialect: str) -> str:
    if dialect == "duckdb":
        toks = (
            "SELECT doc_id, unnest(regexp_extract_all(lower(text),"
            f" '{TOKEN_RE}')) AS w FROM documents"
        )
    else:
        toks = (
            "SELECT doc_id, explode(regexp_extract_all(lower(text),"
            f" '{TOKEN_RE}', 0)) AS w FROM documents"
        )
    return (
        "SELECT doc_id, n_words, n_unique,"
        " CAST(n_unique AS DOUBLE) / n_words AS uniq_frac,"
        " CAST(top_c AS DOUBLE) / n_words AS top_word_frac,"
        f" {_REP_KEEP} AS keep"
        " FROM ("
        " SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,"
        "  count(*) AS n_unique, max(c) AS top_c"
        " FROM (SELECT doc_id, w, count(*) AS c FROM"
        f" ({toks}) t GROUP BY doc_id, w) wc"
        " GROUP BY doc_id) agg"
    )


@query("text_repetition", oracle=_repetition_sql("duckdb"))
def text_repetition(spark, sf_dir):
    """Per-document repetition metrics: vocabulary richness (unique-word
    fraction) and most-frequent-word dominance, with a keep flag at the
    usual quality-filter thresholds."""
    return spark.sql(_repetition_sql("spark"))


# ---------------------------------------------------------------------------
# Text normalization: the standard pre-tokenization cleanup, entirely
# JVM-side expressions (zero shuffles, zero Python).
# ---------------------------------------------------------------------------


def _normalize_sql(dialect: str) -> str:
    # strip control chars -> collapse whitespace runs -> trim -> lowercase.
    # The fixture text is already clean, so the operator runs on a
    # deterministically dirtied copy (case flips, BEL/TAB injection, pad
    # whitespace) and must recover exactly ``text || ' endmark'`` — the
    # value hash proves every stage actually fired.
    # Spark SQL string literals process backslash escapes (the regex needs
    # \\x); DuckDB literals are verbatim and the replace takes a 'g' flag.
    bs = "\\\\" if dialect == "spark" else "\\"
    flags = "" if dialect == "spark" else ", 'g'"
    dirty = "concat('  ', upper(text), chr(9), chr(7), ' ENDMARK  ')"
    inner = (
        f"trim(regexp_replace(regexp_replace({dirty},"
        f" '[{bs}x00-{bs}x08{bs}x0b-{bs}x1f{bs}x7f]', ''{flags}),"
        f" '[ {bs}t{bs}r{bs}n]+', ' '{flags}))"
    )
    return (
        f"SELECT doc_id, lower({inner}) AS norm_text,"
        f" CASE WHEN lower({inner}) = concat(text, ' endmark')"
        "  THEN 1 ELSE 0 END AS recovered,"
        f" length(lower({inner})) AS norm_chars"
        " FROM documents"
    )


@query("text_normalize", oracle=_normalize_sql("duckdb"))
def text_normalize(spark, sf_dir):
    return spark.sql(_normalize_sql("spark"))


# ---------------------------------------------------------------------------
# BM25 retrieval: full-text ranking over the corpus for a fixed query set.
# Rational-idf BM25 (see llmops.bm25_topk) — every score is an exact
# integer ratio summed in micro-units, so even the ranking scores
# hash-match the oracle bit-for-bit.
# ---------------------------------------------------------------------------

_BM25_QUERIES = [
    (0, ("hash", "table", "scan")),
    (1, ("merge", "batch", "row")),
    (2, ("slow", "fast", "value")),
]
_BM25_K = 10


def _bm25_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
  FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_toks FROM dl
), q(query_id, term) AS (VALUES {vals}),
hits AS (
  SELECT query_id, term, doc_id, count(*) AS tf
  FROM toks JOIN q ON tok = term GROUP BY 1, 2, 3
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS dfreq FROM hits GROUP BY 1
), scored AS (
  SELECT query_id, doc_id,
    CAST(SUM(CAST((CAST(22 AS HUGEINT) * total_toks * tf
              * (2*n_docs - 2*dfreq + 1) * 1000000)
        // (CAST(2*dfreq + 1 AS HUGEINT)
            * (10*total_toks*tf + 3*total_toks + 9*dl.dl*n_docs))
        AS BIGINT)) AS BIGINT) AS score_e6
  FROM hits JOIN dl USING (doc_id) JOIN dfreq USING (term), stats
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score_e6, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score_e6 DESC, doc_id) AS rank
  FROM scored) r
WHERE rank <= {_BM25_K}
"""


_BPE_ORACLE = f"""
WITH vocab AS (
  SELECT w, count(*) AS wc FROM (
    SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS w
    FROM documents) t
  GROUP BY w HAVING length(w) >= 2
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)),
                i -> substring(w, i, 2))) AS pair, wc
  FROM vocab
)
SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt
FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair LIMIT 100
"""


@query("bpe_pair_counts", oracle=_BPE_ORACLE)
def bpe_pair_counts(spark, sf_dir):
    """Top adjacent-character merge candidates, vocabulary-weighted — the
    first BPE training iteration (llmops.bpe_pair_counts)."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    return llmops.bpe_pair_counts(docs, "text", top_k=100)


_BPE_MERGES = 5
# a word's tokenization, encoded boundary-safe for string rewriting: every
# symbol individually wrapped in '|' ("|a||b||c|"). The per-round merge is
# then a plain replace of '|l||r|' with '|lr|' — left-to-right and
# NON-overlapping exactly like the BPE fold, because each symbol owns its
# own delimiters (a shared single separator would let " a a a " consume
# its neighbor's boundary and under-merge). Symbols are [a-z0-9]+ so '|'
# can never occur inside one.
_BPE_SYMS = "string_split(trim(e, '|'), '||')"


def _bpe_merges_oracle(n_merges: int) -> str:
    """DuckDB oracle for ``llmops.bpe_train``: the training loop UNROLLED
    into ``n_merges`` chained CTE stages (pair recount → (cnt DESC, l, r)
    argmax → boundary-safe vocabulary rewrite). The full per-round recount
    is the semantics the Spark engine's incremental pair maintenance must
    be equivalent to, so this is the exact cross-engine check; validated
    symbol-for-symbol against an independent pure-Python BPE on the real
    fixture corpus."""
    parts = [
        f"""WITH words AS (
  SELECT w, count(*) AS wc FROM (
    SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS w
    FROM documents)
  GROUP BY w HAVING length(w) >= 2),
v0 AS (
  SELECT '|' || array_to_string(regexp_extract_all(w, '.'), '||') || '|'
           AS e,
         wc
  FROM words)"""
    ]
    for k in range(n_merges):
        parts.append(
            f"""p{k} AS (
  SELECT t.p[1] AS l, t.p[2] AS r, sum(wc) AS c
  FROM v{k}, unnest(list_filter(
    list_zip({_BPE_SYMS}, {_BPE_SYMS}[2:]),
    z -> z[2] IS NOT NULL)) AS t(p)
  GROUP BY 1, 2),
m{k} AS (SELECT l, r FROM p{k} ORDER BY c DESC, l, r LIMIT 1),
v{k + 1} AS (
  SELECT replace(e, '|' || m.l || '||' || m.r || '|',
                 '|' || m.l || m.r || '|') AS e, wc
  FROM v{k}, m{k} m)"""
        )
    sel = " UNION ALL ".join(
        f'SELECT {k} AS rank, l AS "left", r AS "right" FROM m{k}'
        for k in range(n_merges)
    )
    return ",\n".join(parts) + f"\nSELECT * FROM ({sel}) ORDER BY rank"


@query("bpe_train_merges", oracle=_bpe_merges_oracle(_BPE_MERGES))
def bpe_train_merges(spark, sf_dir):
    """Ordered BPE merge list (5 training iterations) as (rank, left,
    right). The iterative per-round argmax + vocabulary rewrite IS
    SQL-expressible for a fixed merge count — the oracle unrolls the loop
    into chained CTEs with a boundary-safe string rewrite — so the last
    rows-only driver check is now a full hash-checked oracle pair; exact
    engine correctness at depth is additionally pinned by byte-level
    agreement with a pure-Python reference BPE at 100 merges in
    test_llmops."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    merges = llmops.bpe_train(docs, "text", n_merges=_BPE_MERGES)
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string",
    )


_RARITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
  FROM documents
), counts AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY 1
), stats AS (
  SELECT sum(c) AS n_total, count(*) AS v FROM counts
)
SELECT doc_id, count(*) AS n_toks,
  CAST(SUM(CAST(n_total + v AS HUGEINT) * 1000000 // (c + 1))
       // count(*) AS BIGINT) AS rarity_e6
FROM toks JOIN counts USING (tok), stats
GROUP BY doc_id
"""


@query("text_rarity", oracle=_RARITY_ORACLE)
def text_rarity(spark, sf_dir):
    """Mean inverse-token-probability quality score (llmops.token_rarity):
    the CCNet-style corpus-LM rarity signal in log-free rational form."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    return llmops.token_rarity(docs, "doc_id", "text")


@query("text_bm25_topk", oracle=_bm25_oracle())
def text_bm25_topk(spark, sf_dir):
    """Top-10 documents per query by BM25 (llmops.bm25_topk): broadcast
    query terms, doc-keyed tf/dl shuffles, term-count-sized df/stats
    broadcasts — the retrieval shape that scales to the full corpus."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id int, term string",
    )
    return llmops.bm25_topk(docs, qdf, "doc_id", "text", k=_BM25_K)


# ---------------------------------------------------------------------------
# Composed quality-filter pipeline: Gopher/C4-style named rules evaluated
# in one map-side pass, each emitted as a flag plus the final keep decision
# (so a pipeline can audit WHY a document was dropped, not just that it
# was). All-expression, no UDFs — at 100 TB this is a pure scan+project.
# Rules follow Rae et al. 2021 (Gopher §A1.1) and Raffel et al. 2020 (C4):
# word-count bounds, mean-word-length band, symbol ratio, stopword floor.
# ---------------------------------------------------------------------------


def _quality_filter_sql(dialect: str) -> str:
    n_words = (
        f"size(regexp_extract_all(lower(text), '{TOKEN_RE}', 0))"
        if dialect == "spark"
        else f"len(regexp_extract_all(lower(text), '{TOKEN_RE}'))"
    )
    alpha = (
        "length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))"
        if dialect == "duckdb"
        else "length(regexp_replace(lower(text), '[^a-z0-9]', ''))"
    )
    # count of ' the ' occurrences as the stopword proxy (dialect-identical)
    stop_hits = (
        "CAST((length(concat(' ', lower(text), ' ')) -"
        " length(replace(concat(' ', lower(text), ' '), ' the ', ''))) / 5"
        " AS BIGINT)"
    )
    return f"""
SELECT doc_id,
  CASE WHEN n_words < 50 THEN 1 ELSE 0 END AS flag_too_short,
  CASE WHEN n_words > 10000 THEN 1 ELSE 0 END AS flag_too_long,
  CASE WHEN n_words > 0 AND (CAST(alpha_chars AS DOUBLE) / nullif(n_words, 0) < 3.0
         OR CAST(alpha_chars AS DOUBLE) / nullif(n_words, 0) > 10.0)
       THEN 1 ELSE 0 END AS flag_word_len,
  CASE WHEN CAST(alpha_chars AS DOUBLE) / nullif(n_chars, 0) < 0.60
       THEN 1 ELSE 0 END AS flag_symbol_ratio,
  CASE WHEN CAST(stop_hits AS DOUBLE) / nullif(n_words, 0) < 0.01
       THEN 1 ELSE 0 END AS flag_stopword_floor,
  CASE WHEN n_words BETWEEN 50 AND 10000
        AND CAST(alpha_chars AS DOUBLE) / nullif(n_words, 0) BETWEEN 3.0 AND 10.0
        AND CAST(alpha_chars AS DOUBLE) / nullif(n_chars, 0) >= 0.60
        AND CAST(stop_hits AS DOUBLE) / nullif(n_words, 0) >= 0.01
       THEN 1 ELSE 0 END AS kept
FROM (
  SELECT doc_id, length(text) AS n_chars, {n_words} AS n_words,
         {alpha} AS alpha_chars, {stop_hits} AS stop_hits
  FROM documents) t
"""


@query("quality_filter_pipeline", oracle=_quality_filter_sql("duckdb"))
def quality_filter_pipeline(spark, sf_dir):
    return spark.sql(_quality_filter_sql("spark"))


# ---------------------------------------------------------------------------
# Multimodal resize + feature-extract: completes the decode / resize /
# feature-extract / frame-sample family. Resize is metadata arithmetic —
# pure integer expressions (JVM-side, no UDF); feature-extract exercises the
# Arrow array<double> batch shape through mapInPandas. Decoders are
# deterministic stand-ins (no image libs in this container); the Spark-side
# plumbing — schema, batching, partitioning — is real.
# ---------------------------------------------------------------------------

_DIMS_DUCK = (
    "1 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 1024",
    "1 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 1024",
)
_DIMS_SPARK = (
    "1 + cast(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT) % 1024",
    "1 + cast(conv(substring(md5(text), 9, 8), 16, 10) AS BIGINT) % 1024",
)


@query(
    "multimodal_resize",
    oracle=f"""
WITH dims AS (
  SELECT doc_id, {_DIMS_DUCK[0]} AS w, {_DIMS_DUCK[1]} AS h FROM documents)
SELECT doc_id, w, h,
  CASE WHEN greatest(w, h) <= 256 THEN w
       ELSE greatest(1, (w * 256) // greatest(w, h)) END AS out_w,
  CASE WHEN greatest(w, h) <= 256 THEN h
       ELSE greatest(1, (h * 256) // greatest(w, h)) END AS out_h
FROM dims
""",
)
def multimodal_resize(spark, sf_dir):
    """Aspect-preserving fit into a 256×256 box in pure integer arithmetic
    (bit-identical across engines; no float scale factor). The CASE
    expression is the SQL mirror of ``multimodal.fit_box`` (pinned equal
    in test_multimodal.py); real pixel resampling on the fitted shape is
    ``multimodal.resize_pixels`` — pure-Python for PNG (exercised
    end-to-end by ``multimodal_pixel_resize``), Pillow for the rest."""
    docs = catalog.table(spark, sf_dir, "documents")
    dims = docs.select(
        "doc_id",
        F.expr(_DIMS_SPARK[0]).alias("w"),
        F.expr(_DIMS_SPARK[1]).alias("h"),
    )
    fit = lambda side: F.expr(
        f"CASE WHEN greatest(w, h) <= 256 THEN {side}"
        f" ELSE greatest(1, ({side} * 256) div greatest(w, h)) END"
    )
    return dims.select(
        "doc_id", "w", "h", fit("w").alias("out_w"), fit("h").alias("out_h")
    )


@query(
    "multimodal_embed",
    oracle=(
        "SELECT doc_id, "
        + " || ',' || ".join(
            "CAST(CAST(('0x' || substr(md5(text || '"
            f"{j}'), 1, 8)) AS BIGINT) % 1000 AS VARCHAR)"
            for j in range(8)
        )
        + " AS embedding_csv FROM documents"
    ),
)
def multimodal_embed(spark, sf_dir):
    """Feature extraction over a binary payload via mapInPandas returning
    array<double> — the Arrow batch shape a real vision/audio encoder would
    use (swap the md5 stand-in for the model forward pass). The CHECKED
    projection serializes the vector to integer-milli CSV: the driver
    canonicalizes results with a pandas sort over every column, where an
    array cell is unhashable and burns the slot with a harness TypeError
    (the CORRECTNESS_r06 failure mode) — engine APIs keep the typed
    array, the correctness row checks its exact content as a string."""
    docs = catalog.table_spread(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def embed_batches(batches: Iterator[pd.DataFrame]):
        import hashlib

        for pdf in batches:
            embs = [
                [
                    int(
                        hashlib.md5(
                            bytes(payload) + str(j).encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    % 1000
                    / 1000.0
                    for j in range(8)
                ]
                for payload in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": embs})

    typed = docs.mapInPandas(
        embed_batches, "doc_id long, embedding array<double>"
    )
    return typed.select(
        "doc_id",
        F.concat_ws(
            ",",
            F.transform(
                "embedding",
                lambda v: F.round(v * 1000).cast("long").cast("string"),
            ),
        ).alias("embedding_csv"),
    )


# ---------------------------------------------------------------------------
# Token-length distribution: fixed-width integer buckets — the
# length-histogram diagnostic behind truncation/packing decisions. One
# aggregation shuffle; integer division keeps buckets engine-exact.
# ---------------------------------------------------------------------------

_HIST_WIDTH = 32


def _length_hist_sql(dialect: str) -> str:
    ntok = (
        f"size(regexp_extract_all(lower(text), '{TOKEN_RE}', 0))"
        if dialect == "spark"
        else f"len(regexp_extract_all(lower(text), '{TOKEN_RE}'))"
    )
    intdiv = "div" if dialect == "spark" else "//"
    return (
        f"SELECT CAST(b AS BIGINT) AS bucket,"
        f" CAST(b * {_HIST_WIDTH} AS BIGINT) AS lo_tokens,"
        f" CAST((b + 1) * {_HIST_WIDTH} - 1 AS BIGINT) AS hi_tokens,"
        " count(*) AS n_docs FROM ("
        f" SELECT {ntok} {intdiv} {_HIST_WIDTH} AS b FROM documents) t"
        " GROUP BY b"
    )


@query("text_length_histogram", oracle=_length_hist_sql("duckdb"))
def text_length_histogram(spark, sf_dir):
    """Document token-count histogram in fixed 32-token buckets."""
    return spark.sql(_length_hist_sql("spark"))


def _langid_accuracy_sql() -> str:
    """Confusion matrix of the stopword-heuristic language ID against the
    corpus's ground-truth ``lang`` column — dialect-shared, like
    ``_langid_sql`` itself."""
    return (
        f"SELECT d.lang AS true_lang, p.lang_pred AS pred_lang,"
        f" count(*) AS n_docs"
        f" FROM documents d JOIN ({_langid_sql()}) p ON d.doc_id = p.doc_id"
        f" GROUP BY d.lang, p.lang_pred"
    )


@query("text_langid_accuracy", oracle=_langid_accuracy_sql())
def text_langid_accuracy(spark, sf_dir):
    """Language-ID quality evaluation: the (true_lang, pred_lang, n_docs)
    confusion matrix of ``text_lang_id``'s heuristic against the corpus's
    ground-truth ``lang`` column — the acceptance gate a pipeline runs
    before trusting a classifier to route 100 TB. Map-side prediction,
    one count aggregation; the join keys on doc_id (1:1, co-partitioned
    at scale)."""
    return spark.sql(_langid_accuracy_sql())


def _dup_ngram_sql(dialect: str) -> str:
    """Gopher-style duplicate n-gram dominance (Rae et al. 2021 §A1.1):
    per document, the fraction of characters covered by the MOST FREQUENT
    duplicated word 2-gram and 3-gram, in integer micro-units. Fractions
    use c * length(gram) over the space-joined token stream length — the
    log-free rational form, bit-identical across engines."""
    if dialect == "spark":
        toks = f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)"
        n_ws, joined = "size(ws)", "length(concat_ws(' ', ws))"
        g2 = ("explode(transform(sequence(0, size(ws) - 2),"
              " i -> concat(ws[i], ' ', ws[i + 1])))")
        g3 = ("explode(transform(sequence(0, size(ws) - 3),"
              " i -> concat(ws[i], ' ', ws[i + 1], ' ', ws[i + 2])))")
        intdiv = "div"
    else:
        toks = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
        n_ws, joined = "len(ws)", "length(array_to_string(ws, ' '))"
        g2 = ("unnest(list_transform(range(1, len(ws)),"
              " i -> ws[i] || ' ' || ws[i + 1]))")
        g3 = ("unnest(list_transform(range(1, len(ws) - 1),"
              " i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]))")
        intdiv = "//"

    def top_dup(gexpr: str, min_words: int) -> str:
        return f"""(
  SELECT doc_id, max(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dup
  FROM (
    SELECT doc_id, g, count(*) AS c FROM (
      SELECT doc_id, {gexpr} AS g FROM toks WHERE {n_ws} >= {min_words}) x
    GROUP BY doc_id, g) cnt
  GROUP BY doc_id)"""

    return f"""
WITH toks AS (SELECT doc_id, {toks} AS ws FROM documents),
base AS (
  SELECT doc_id, {n_ws} AS n_words, {joined} AS total_chars
  FROM toks WHERE {n_ws} >= 2),
d2 AS {top_dup(g2, 2)},
d3 AS {top_dup(g3, 3)}
SELECT b.doc_id, b.n_words,
  CAST(coalesce(d2.dup, 0) * 1000000 {intdiv} b.total_chars AS BIGINT)
    AS dup2_frac_e6,
  CAST(coalesce(d3.dup, 0) * 1000000 {intdiv} b.total_chars AS BIGINT)
    AS dup3_frac_e6,
  CASE WHEN coalesce(d2.dup, 0) * 1000000 {intdiv} b.total_chars <= 200000
        AND coalesce(d3.dup, 0) * 1000000 {intdiv} b.total_chars <= 180000
       THEN 1 ELSE 0 END AS keep
FROM base b
LEFT JOIN d2 ON d2.doc_id = b.doc_id
LEFT JOIN d3 ON d3.doc_id = b.doc_id
"""


@query("text_dup_ngram_stats", oracle=_dup_ngram_sql("duckdb"))
def text_dup_ngram_stats(spark, sf_dir):
    """Gopher duplicate-n-gram repetition filter: per-document top
    duplicated 2-/3-gram character coverage with the paper's 0.20/0.18
    keep thresholds — the within-document complement of the corpus-level
    dedup family. Scale shape: the n-gram relations shuffle on doc_id
    with map-side partial max; joins are 1:1 on doc_id (co-partitioned);
    no UDFs anywhere."""
    return spark.sql(_dup_ngram_sql("spark"))


# ---------------------------------------------------------------------------
# Overlapping chunking: the RAG/pretraining sequence-prep step. Engine API
# llmops.chunk_documents; oracle regenerates every chunk with
# generate_series + substr.
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = """
WITH ex AS (
  SELECT doc_id, text,
         unnest(generate_series(
           0, CAST(floor((length(text) - 1) / 150) AS BIGINT))) AS ci
  FROM documents WHERE length(text) > 0)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       substr(text, CAST(ci * 150 + 1 AS BIGINT), 200) AS chunk,
       CAST(length(substr(text, CAST(ci * 150 + 1 AS BIGINT), 200)) AS BIGINT)
         AS chunk_chars
FROM ex
"""


@query("text_chunk_overlap", oracle=_CHUNK_ORACLE)
def text_chunk_overlap(spark, sf_dir):
    """Overlapping fixed-window chunking (size 200, stride 150 — 50-char
    overlap): chunk i covers characters [i*150, i*150+200). Scale shape:
    map-only JVM expressions (sequence → explode → substring), zero
    shuffles, zero Python — at 100 TB a pure scan with ~1.33× output
    amplification. The oracle regenerates every chunk, so the value hash
    proves offsets, overlap, and tail handling byte-for-byte."""
    from bravo_spark import llmops as lo

    docs = catalog.table(spark, sf_dir, "documents")
    return lo.chunk_documents(docs, "doc_id", "text", size=200, stride=150)


# ---------------------------------------------------------------------------
# Markup stripping: the crawl→text step. Engine API llmops.strip_markup;
# the query wraps each document in a deterministic crawl-artifact template
# (script/style/comment noise, tags, escaped + numeric entities) so the
# value hash proves container removal, tag stripping, the numeric-ref
# decode ORDER (escaped refs must surface literally), and whitespace
# collapse. The oracle replays the exact replacement chain.
# ---------------------------------------------------------------------------

_MARKUP_PREFIX = (
    "<html><head><style>p{color:red}</style><script>var doc="
)
_MARKUP_MID = (
    ';</script></head><body><!-- crawl artifact --><p class="main">'
)
_MARKUP_SUFFIX = " &#8212; it&#8217;s &amp;#169; archived</p></body></html>"

# the strip chain, in llmops.strip_markup's order (containers, comments,
# tags; numeric punctuation decode; numeric removal; named entities with
# &amp; LAST; whitespace collapse)
_MARKUP_STEPS = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]+>", " "),
    (r"&#(?:39|x0*27);", "'"),
    (r"&#(?:34|x0*22);", '"'),
    (r"&#(?:8216|8217|x0*201[89]);", "'"),
    (r"&#(?:8220|8221|x0*201[cCdD]);", '"'),
    (r"&#(?:8211|8212|x0*201[34]);", "-"),
    (r"&#(?:160|x0*[aA]0);", " "),
    (r"&#x?[0-9a-fA-F]{1,6};", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&apos;", "'"),
    (r"&amp;", "&"),
    (r"\s+", " "),
]


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def _strip_chain_sql(expr: str) -> str:
    """``expr`` wrapped in llmops.strip_markup's exact replacement chain
    as DuckDB SQL — shared by every oracle that replays the strip
    (text_markup_strip here; warc_html_extract in formats.py)."""
    for pat, rep in _MARKUP_STEPS:
        expr = (f"regexp_replace({expr}, '{_sql_quote(pat)}',"
                f" '{_sql_quote(rep)}', 'g')")
    return expr


def _markup_strip_oracle() -> str:
    q = _sql_quote
    expr = _strip_chain_sql("t")
    html = (
        f"'{q(_MARKUP_PREFIX)}' || CAST(doc_id AS VARCHAR) || "
        f"'{q(_MARKUP_MID)}' || text || '{q(_MARKUP_SUFFIX)}'"
    )
    return (
        f"WITH h AS (SELECT doc_id, {html} AS t FROM documents)\n"
        f"SELECT doc_id, trim({expr}) AS clean_text FROM h"
    )


@query("text_markup_strip", oracle=_markup_strip_oracle())
def text_markup_strip(spark, sf_dir):
    """HTML→text over a deterministic crawl-artifact wrapping of every
    document. Scale shape: entirely JVM-side regexp_replace chains —
    map-only, zero Python, zero shuffles (the same class as the other
    text scans); at 100 TB this is a pure scan whose cost is the regex
    engine, which is why the chain stays in whole-stage codegen."""
    from bravo_spark import llmops as lo

    docs = catalog.table(spark, sf_dir, "documents")
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit(_MARKUP_PREFIX),
            F.col("doc_id").cast("string"),
            F.lit(_MARKUP_MID),
            F.col("text"),
            F.lit(_MARKUP_SUFFIX),
        ).alias("text"),
    )
    return lo.strip_markup(html, "text").select("doc_id", "clean_text")


# ---------------------------------------------------------------------------
# Token-level chunking (llmops.chunk_tokens): the post-tokenizer sibling
# of text_chunk_overlap — overlapping windows over the token ARRAY, not
# the character stream. Gate projection serializes the chunk (space-join)
# per the no-array-columns rule; the oracle regenerates every window.
# ---------------------------------------------------------------------------

_CHUNK_TOK_SIZE = 64
_CHUNK_TOK_STRIDE = 48

_CHUNK_TOKENS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '') AS ws
  FROM documents),
ex AS (
  SELECT doc_id, ws,
         unnest(generate_series(
           0, CAST(floor((len(ws) - 1) / {_CHUNK_TOK_STRIDE}.0) AS BIGINT)
         )) AS ci
  FROM toks WHERE len(ws) > 0)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
  array_to_string(
    ws[ci*{_CHUNK_TOK_STRIDE}+1 : ci*{_CHUNK_TOK_STRIDE}+{_CHUNK_TOK_SIZE}],
    ' ') AS chunk_text,
  CAST(len(
    ws[ci*{_CHUNK_TOK_STRIDE}+1 : ci*{_CHUNK_TOK_STRIDE}+{_CHUNK_TOK_SIZE}]
  ) AS BIGINT) AS n_tokens
FROM ex
"""


@query("text_chunk_tokens", oracle=_CHUNK_TOKENS_ORACLE)
def text_chunk_tokens(spark, sf_dir):
    """Overlapping token-window chunking (size 64, stride 48): window i
    covers tokens [i*48, i*48+64) of the whitespace token array. Scale
    shape: map-only JVM expressions (split → filter → sequence → explode
    → slice), zero shuffles, zero Python — the sequence(1,0)-descends
    guard means short documents cost one branch, not a bad window."""
    from bravo_spark import llmops as lo

    docs = catalog.table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")
        ).alias("toks"),
    )
    ch = lo.chunk_tokens(
        toks, "doc_id", "toks",
        size=_CHUNK_TOK_SIZE, stride=_CHUNK_TOK_STRIDE,
    )
    return ch.select(
        "doc_id", "chunk_idx",
        F.array_join("chunk_tokens", " ").alias("chunk_text"),
        F.col("chunk_tokens_len").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear classification (llmops.hash_ngram_features +
# linear_text_score): FastText-style quality scoring. Weights are a
# deterministic DYADIC vector (k/64 — exactly representable, so the
# double sum is order-independent and the hash check is exact on both
# engines). The oracle replays tokenization, bigram hashing, bucketing,
# and the normalized dot product.
# ---------------------------------------------------------------------------

_HASHFEAT_DIM = 64
_HASHFEAT_BIAS = 0.25

_HASHFEAT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ws
  FROM documents),
ix AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
  FROM toks WHERE len(ws) >= 2),
feats AS (
  SELECT doc_id,
    CAST(CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 8)) AS BIGINT)
         % {_HASHFEAT_DIM} AS INTEGER) AS bucket,
    CAST(count(*) AS BIGINT) AS cnt
  FROM ix GROUP BY doc_id, bucket)
SELECT doc_id,
  {_HASHFEAT_BIAS} + sum(CAST((bucket * 37) % 101 - 50 AS DOUBLE)
                         / {_HASHFEAT_DIM} * cnt) / sum(cnt) AS score
FROM feats GROUP BY doc_id
"""


@query("text_hash_features_classify", oracle=_HASHFEAT_ORACLE)
def text_hash_features_classify(spark, sf_dir):
    """Linear text-quality classifier over hashed bigram features:
    score(doc) = bias + Σ w[bucket]·count / Σ count. Scale shape: the
    feature extraction is one partial-aggregated shuffle on (doc_id,
    bucket); the weight vector is dim rows — genuinely fixed-size —
    and broadcasts; scoring is a second partial-aggregated shuffle on
    doc_id. No dense vectors anywhere, no Python."""
    from bravo_spark import llmops as lo

    docs = catalog.table(spark, sf_dir, "documents")
    feats = lo.hash_ngram_features(
        docs, "doc_id", "text", dim=_HASHFEAT_DIM, ngram=2
    )
    weights = [
        ((b * 37) % 101 - 50) / _HASHFEAT_DIM for b in range(_HASHFEAT_DIM)
    ]
    return lo.linear_text_score(
        feats, weights, id_col="doc_id", bias=_HASHFEAT_BIAS
    )


# ---------------------------------------------------------------------------
# n-gram LM quality filter (CCNet-shaped): train stupid-backoff trigram
# counts on a hash-split 80% of the corpus, score the held-out 20%, keep
# documents whose mean transition probability clears the threshold. The
# smoothing is Brants et al. 2007's stupid backoff — THE LM estimator
# designed for distributed count-based training — and the pipeline shape
# is CCNet's (Wenzek et al. 2020): LM-score crawl text, filter on the
# score. Exact integer micro-units end-to-end (lm_score_micro), so the
# oracle hashes bit-identically; the library twin (llmops.ngram_lm_score)
# additionally derives a float perplexity proxy for human inspection,
# which this gate projection drops.
# ---------------------------------------------------------------------------

_H32_SPARK_DOC = "cast(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
_H32_DUCK_DOC = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"

_NGRAM_LM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_concat(['<s>', '<s>'],
                     regexp_extract_all(lower(text), '{TOKEN_RE}')) AS t,
         ({_H32_DUCK_DOC} % 10) < 8 AS is_train
  FROM documents
  WHERE len(regexp_extract_all(lower(text), '{TOKEN_RE}')) >= 1
),
w3 AS (SELECT unnest(list_transform(range(3, len(t) + 1),
                                    i -> [t[i-2], t[i-1], t[i]])) AS p
       FROM toks WHERE is_train),
tri AS (SELECT p[1] AS w2, p[2] AS w1, p[3] AS w, count(*) AS c
        FROM w3 GROUP BY 1, 2, 3),
w2g AS (SELECT unnest(list_transform(range(2, len(t) + 1),
                                     i -> [t[i-1], t[i]])) AS p
        FROM toks WHERE is_train),
bi AS (SELECT p[1] AS w1, p[2] AS w, count(*) AS c FROM w2g GROUP BY 1, 2),
u AS (SELECT unnest(t) AS w FROM toks WHERE is_train),
uni AS (SELECT w, count(*) AS c FROM u GROUP BY 1),
tot AS (SELECT count(*) AS n FROM u),
sc AS (SELECT doc_id, p[1] AS w2, p[2] AS w1, p[3] AS w FROM (
         SELECT doc_id, unnest(list_transform(range(3, len(t) + 1),
                               i -> [t[i-2], t[i-1], t[i]])) AS p
         FROM toks WHERE NOT is_train)),
scored AS (
  SELECT sc.doc_id,
    CASE WHEN t3.c IS NOT NULL THEN t3.c * 1000000 // bc.c
         WHEN b2.c IS NOT NULL THEN b2.c * 400000 // uc.c
         WHEN u1.c IS NOT NULL THEN u1.c * 160000 // tot.n
         ELSE 160000 // tot.n END AS micro,
    CASE WHEN t3.c IS NOT NULL THEN 3 WHEN b2.c IS NOT NULL THEN 2
         WHEN u1.c IS NOT NULL THEN 1 ELSE 0 END AS o
  FROM sc
  LEFT JOIN tri t3 ON sc.w2 = t3.w2 AND sc.w1 = t3.w1 AND sc.w = t3.w
  LEFT JOIN bi bc ON sc.w2 = bc.w1 AND sc.w1 = bc.w
  LEFT JOIN bi b2 ON sc.w1 = b2.w1 AND sc.w = b2.w
  LEFT JOIN uni uc ON sc.w1 = uc.w
  LEFT JOIN uni u1 ON sc.w = u1.w
  CROSS JOIN tot
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN o = 3 THEN 1 ELSE 0 END) AS BIGINT) AS tri_hits,
  CAST(sum(CASE WHEN o = 2 THEN 1 ELSE 0 END) AS BIGINT) AS bi_hits,
  CAST(sum(CASE WHEN o = 1 THEN 1 ELSE 0 END) AS BIGINT) AS uni_hits,
  CAST(sum(CASE WHEN o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oov,
  CAST(CAST(sum(micro) AS BIGINT) // count(*) AS BIGINT) AS lm_score_micro,
  CAST(CASE WHEN CAST(sum(micro) AS BIGINT) // count(*) >= 50000
       THEN 1 ELSE 0 END AS INT) AS keep
FROM scored GROUP BY doc_id
"""


@query("text_lm_perplexity_filter", oracle=_NGRAM_LM_ORACLE)
def text_lm_perplexity_filter(spark, sf_dir):
    """CCNet-style LM quality gate over ``documents``: hash-split 80/20,
    train trigram stupid-backoff counts on the 80 (llmops.ngram_lm_counts),
    score the 20 (llmops.ngram_lm_score), keep at mean transition
    probability >= 5% (50_000 micro-units; splits the fixture ~12/105). Scale: three vocabulary-sized
    count shuffles + five token-level equi-joins + one broadcast 1-row
    total — the canonical distributed-LM-scoring shape; nothing is
    corpus-quadratic and nothing big is broadcast."""
    from bravo_spark import llmops

    docs = catalog.table(spark, sf_dir, "documents")
    is_train = F.expr(f"({_H32_SPARK_DOC} % 10) < 8")
    lm = llmops.ngram_lm_counts(docs.filter(is_train), "text",
                                token_re=TOKEN_RE)
    return llmops.ngram_lm_score(
        docs.filter(~is_train), lm, "text", "doc_id",
        token_re=TOKEN_RE, keep_micro=50_000,
    ).drop("ppl_proxy")


# ---------------------------------------------------------------------------
# persisted positional inverted index + exact phrase search: the
# text-retrieval twin of the persisted IVF row. Build posting lists
# (term, doc_id, pos) bucket-partitioned by term hash, then answer an
# exact phrase query by pruning to the phrase terms' buckets and
# chaining positional adjacency joins — nothing rescans text. The
# oracle recomputes ground truth directly from documents with a
# position-indexed adjacency scan.
# ---------------------------------------------------------------------------

_PHRASE = ("hash", "join")

_PHRASE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
  FROM documents
),
m AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> CASE WHEN t[i] = '{_PHRASE[0]}'
                           AND t[i+1] = '{_PHRASE[1]}'
                     THEN i ELSE NULL END)) AS pos
  FROM toks
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM m WHERE pos IS NOT NULL GROUP BY doc_id
"""


@query("phrase_search_index", oracle=_PHRASE_ORACLE)
def phrase_search_index(spark, sf_dir):
    """Persisted-inverted-index lifecycle: build posting lists over
    ``documents`` (llmops.build_inverted_index — bucket-partitioned
    parquet + Hadoop-FS manifest), then answer the exact 2-token phrase
    query via llmops.phrase_search: bucket partition pruning + term
    predicate pushdown + one positional adjacency join + one groupBy.
    Scale: the probe reads ~2/64 of the index in FILE terms; the
    adjacency join shuffles only the two single-term posting lists."""
    from bravo_spark import llmops
    from bravo_spark.inventory.scratch import scratch_dir

    docs = catalog.table(spark, sf_dir, "documents")
    path = scratch_dir("invidx")
    llmops.build_inverted_index(docs, path, token_re=TOKEN_RE)
    return llmops.phrase_search(spark, path, " ".join(_PHRASE))


# ---------------------------------------------------------------------------
# EXIF audit + redaction: the multimodal-pipeline metadata step. Every
# document becomes a pixel-real JPEG (our own encoder) tagged with a
# deterministic EXIF APP1 (orientation, and GPS for every third doc);
# the audit parses the tags back, REDACTS (strip_exif), and proves the
# redaction both removed the PII and left the pixel stream byte-
# identical. GPS coordinates use degree+minute rationals whose FLOOR is
# integer-exact, so every reported column is integer math the oracle
# reproduces closed-form.
# ---------------------------------------------------------------------------

_EXIF_ORACLE = """
SELECT doc_id,
  CAST(doc_id % 8 + 1 AS BIGINT) AS orientation,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS has_gps,
  CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 60 AS BIGINT)
       ELSE NULL END AS lat_floor,
  CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id * 7) % 120 + 30 AS BIGINT)
       ELSE NULL END AS lon_floor,
  CAST(1 AS BIGINT) AS redacted_clean,
  CAST(1 AS BIGINT) AS pixels_identical
FROM documents
"""


@query("multimodal_exif_audit", oracle=_EXIF_ORACLE)
def multimodal_exif_audit(spark, sf_dir):
    """Tag → audit → redact lifecycle over a JPEG column
    (inventory/exif.py): orientation = doc_id%8+1; every third document
    carries GPS at (doc_id%60)°15'N, ((doc_id*7)%120+30)°30'E (floors
    integer-exact by construction). The audit asserts strip_exif
    removes the Exif APP1 entirely AND that the redacted file's decoded
    pixels are byte-identical to the tagged file's — redaction must not
    re-encode. One shared base JPEG is encoded once per executor; the
    per-doc work is APP1 splice/parse — map-only mapInPandas, zero
    shuffles."""
    from bravo_spark.inventory import exif as ex
    from bravo_spark.inventory.jpeg import jpeg_decode_pixels, jpeg_encode

    docs = catalog.table(spark, sf_dir, "documents").select("doc_id")

    def audit(batches: Iterator[pd.DataFrame]):
        raw = bytes((x * 8 + y) % 256 for y in range(16) for x in range(16))
        base = jpeg_encode(16, 16, "L", raw)
        base_pix = jpeg_decode_pixels(base)[3]
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                gps = (
                    (doc_id % 60 + 15 / 60, (doc_id * 7) % 120 + 30 + 30 / 60)
                    if doc_id % 3 == 0
                    else None
                )
                tagged = ex.insert_exif(
                    base,
                    ex.build_exif_app1(
                        orientation=doc_id % 8 + 1,
                        datetime_str="2026:01:01 00:00:00",
                        gps=gps,
                        byte_order="II" if doc_id % 2 == 0 else "MM",
                    ),
                )
                meta = ex.parse_exif(tagged)
                red = ex.strip_exif(tagged)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "orientation": meta["orientation"],
                        "has_gps": int(meta["gps"] is not None),
                        "lat_floor": (
                            int(meta["gps"][0]) if meta["gps"] else None
                        ),
                        "lon_floor": (
                            int(meta["gps"][1]) if meta["gps"] else None
                        ),
                        "redacted_clean": int(ex.parse_exif(red) is None),
                        # byte identity implies pixel identity (strip is
                        # a segment splice, never a re-encode); the
                        # decode runs only as a fallback proof if the
                        # bytes ever diverge
                        "pixels_identical": int(
                            red == base
                            or jpeg_decode_pixels(red)[3] == base_pix
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        audit,
        schema="doc_id long, orientation long, has_gps long,"
        " lat_floor long, lon_floor long, redacted_clean long,"
        " pixels_identical long",
    )


# ---------------------------------------------------------------------------
# EXIF orientation normalization: the pixel half of the EXIF story — a
# camera-rotated image must be made upright BEFORE features/embeddings
# (a sideways image embeds as a different document). The kernel
# (exif.apply_orientation, all 8 EXIF 2.3 orientations) runs as real
# numpy on a deterministic per-doc image; the oracle replays the
# destination-coordinate arithmetic closed-form and sums the identical
# position-weighted checksum, so a single misplaced pixel hash-fails.
# In the real flow the orientation value comes from exif.parse_exif
# (the multimodal_exif_audit row); here it is pinned to doc_id so the
# oracle can replay it.
# ---------------------------------------------------------------------------

_ORIENT_W, _ORIENT_H = 24, 16

_ORIENT_ORACLE = f"""
WITH cells AS (
  SELECT d.doc_id, d.o, g.i % {_ORIENT_W} AS x, g.i // {_ORIENT_W} AS y
  FROM (SELECT doc_id, CAST(doc_id % 8 + 1 AS BIGINT) AS o
        FROM documents) d
  CROSS JOIN (SELECT unnest(range(0, {_ORIENT_W * _ORIENT_H})) AS i) g
),
mapped AS (
  SELECT doc_id, o,
    (3 * x + 7 * y + doc_id) % 256 AS px,
    CASE o
      WHEN 1 THEN x               WHEN 2 THEN {_ORIENT_W - 1} - x
      WHEN 3 THEN {_ORIENT_W - 1} - x  WHEN 4 THEN x
      WHEN 5 THEN y               WHEN 6 THEN {_ORIENT_H - 1} - y
      WHEN 7 THEN {_ORIENT_H - 1} - y  WHEN 8 THEN y
    END AS xd,
    CASE o
      WHEN 1 THEN y               WHEN 2 THEN y
      WHEN 3 THEN {_ORIENT_H - 1} - y  WHEN 4 THEN {_ORIENT_H - 1} - y
      WHEN 5 THEN x               WHEN 6 THEN x
      WHEN 7 THEN {_ORIENT_W - 1} - x  WHEN 8 THEN {_ORIENT_W - 1} - x
    END AS yd
  FROM cells
)
SELECT doc_id, min(o) AS orientation,
  CAST(CASE WHEN min(o) >= 5 THEN {_ORIENT_H} ELSE {_ORIENT_W} END
       AS BIGINT) AS out_w,
  CAST(CASE WHEN min(o) >= 5 THEN {_ORIENT_W} ELSE {_ORIENT_H} END
       AS BIGINT) AS out_h,
  CAST(sum(px * (1 + xd + 2 * yd)) AS BIGINT) AS checksum
FROM mapped GROUP BY doc_id
"""


@query("multimodal_orientation_normalize", oracle=_ORIENT_ORACLE)
def multimodal_orientation_normalize(spark, sf_dir):
    """Upright every image per its EXIF orientation
    (exif.apply_orientation — numpy rot/flip views, all 8 spec cases,
    dims swap for 5-8) and prove pixel placement with a
    position-weighted checksum the oracle recomputes closed-form.
    Map-only mapInPandas, zero shuffles; at 100 TB this pipelines with
    the payload scan exactly like the other decode tiers."""
    import numpy as np

    from bravo_spark.inventory import exif as ex

    docs = catalog.table(spark, sf_dir, "documents").select("doc_id")
    w, h = _ORIENT_W, _ORIENT_H
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]

    def normalize(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                img = ((3 * xs + 7 * ys + doc_id) % 256).astype(np.uint8)
                o = doc_id % 8 + 1
                raw, ow, oh = ex.apply_orientation(img.tobytes(), w, h, o)
                out = np.frombuffer(raw, np.uint8).reshape(oh, ow)
                weights = (
                    1 + np.arange(ow, dtype=np.int64)[None, :]
                    + 2 * np.arange(oh, dtype=np.int64)[:, None]
                )
                rows.append(
                    {
                        "doc_id": doc_id, "orientation": o,
                        "out_w": ow, "out_h": oh,
                        "checksum": int((out.astype(np.int64) * weights).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        normalize,
        schema="doc_id long, orientation long, out_w long, out_h long,"
        " checksum long",
    )


# ---------------------------------------------------------------------------
# persisted n-gram LM: the train-once/score-many half of the CCNet gate.
# Same 80/20 split, same counts, same integer micro-unit scoring as
# text_lm_perplexity_filter — but the count relations go THROUGH
# llmops.save_ngram_lm / load_ngram_lm (parquet + Hadoop-FS manifest)
# between training and scoring, so the oracle hash proves persistence
# is lossless end-to-end (schema, values, and the manifest round-trip).
# ---------------------------------------------------------------------------


@query("ngram_lm_persist_score", oracle=_NGRAM_LM_ORACLE)
def ngram_lm_persist_score(spark, sf_dir):
    """The persisted-LM lifecycle: train stupid-backoff counts on the
    hash-split 80% and save_ngram_lm ONCE per process behind a
    completeness marker (train-once/score-many is the entire point of
    the persistence surface; the train-cost is already measured by
    text_lm_perplexity_filter), then load_ngram_lm + score the held-out
    20% from the LOADED relations on every call. The oracle is the
    direct train+score replay (_NGRAM_LM_ORACLE) — any loss in
    persistence shows up as a hash mismatch. Scale: the four saved
    relations are vocabulary-sized parquet; scoring reads them back
    with column pruning and joins per token exactly like the direct
    path."""
    import hashlib
    import os
    import shutil

    from bravo_spark import llmops
    from bravo_spark.inventory.scratch import scratch_path

    docs = catalog.table(spark, sf_dir, "documents")
    is_train = F.expr(f"({_H32_SPARK_DOC} % 10) < 8")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = scratch_path(f"ngramlm_{tag}")
    marker = os.path.join(path, "_BRAVO_FIXTURE_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        lm = llmops.ngram_lm_counts(docs.filter(is_train), "text",
                                    token_re=TOKEN_RE)
        llmops.save_ngram_lm(lm, path)
        open(marker, "w").close()
    loaded = llmops.load_ngram_lm(spark, path)
    return llmops.ngram_lm_score(
        docs.filter(~is_train), loaded, "text", "doc_id",
        token_re=TOKEN_RE, keep_micro=50_000,
    ).drop("ppl_proxy")


# ---------------------------------------------------------------------------
# column-level EXIF redaction (llmops.redact_exif): the API a pipeline
# actually calls — multimodal_exif_audit proves the splice primitives,
# this row proves the COLUMN operator including its quarantine contract:
# every 7th document's JPEG is torn mid-marker-stream, and with
# quarantine=True those payloads null out with flag -1 while the rest
# redact losslessly (flag 1, bytes spliced back to the untagged base).
# ---------------------------------------------------------------------------

_EXIF_REDACT_ORACLE = """
SELECT doc_id,
  CAST(CASE WHEN doc_id % 7 = 0 THEN -1 ELSE 1 END AS BIGINT)
    AS exif_redacted,
  CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS BIGINT)
    AS splice_exact
FROM documents
"""


@query("multimodal_exif_redact", oracle=_EXIF_REDACT_ORACLE)
def multimodal_exif_redact(spark, sf_dir):
    """redact_exif over a mixed-health JPEG column: docs tag a shared
    pixel-real base JPEG with a deterministic Exif APP1 (GPS on every
    third doc — the PII that must not survive), every 7th doc's payload
    is TORN mid-stream, and quarantine=True isolates the torn ones
    (payload NULL, flag -1 — never passed through unredacted) while
    clean ones splice back to the byte-identical untagged base (flag 1,
    proven via md5 against the plan-time base digest). Map-only: two
    Arrow-batched mapInPandas stages (tag, redact) + a JVM-side md5
    projection, zero shuffles."""
    from bravo_spark import llmops
    from bravo_spark.inventory import exif as ex
    from bravo_spark.inventory.jpeg import jpeg_encode

    docs = catalog.table(spark, sf_dir, "documents").select("doc_id")
    raw = bytes((x * 8 + y) % 256 for y in range(16) for x in range(16))
    base = jpeg_encode(16, 16, "L", raw)
    import hashlib

    base_md5 = hashlib.md5(base).hexdigest()

    def tag(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                gps = (
                    (doc_id % 60 + 0.25, (doc_id * 7) % 120 + 30 + 0.5)
                    if doc_id % 3 == 0
                    else None
                )
                tagged = ex.insert_exif(
                    base,
                    ex.build_exif_app1(
                        orientation=doc_id % 8 + 1, gps=gps,
                        byte_order="II" if doc_id % 2 == 0 else "MM",
                    ),
                )
                if doc_id % 7 == 0:
                    # tear INSIDE the APP1 (the smallest possible Exif
                    # APP1 spans bytes 2..38), so the marker walk always
                    # hits the truncation
                    tagged = tagged[:20]
                rows.append({"doc_id": doc_id, "payload": tagged})
            yield pd.DataFrame(rows)

    tagged = docs.mapInPandas(tag, schema="doc_id long, payload binary")
    red = llmops.redact_exif(tagged, "payload", quarantine=True)
    return red.select(
        "doc_id",
        F.col("exif_redacted").cast("long").alias("exif_redacted"),
        F.when(F.md5(F.col("payload")) == base_md5, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("splice_exact"),
    )


# ---------------------------------------------------------------------------
# chat/SFT conversation prep — r19. The step that turns a chat corpus
# into model input: parse the JSON conversation column, validate the
# turn structure (each rule a NAMED quarantine reason), flatten valid
# conversations through the ChatML-shaped template. The conversations
# are built IN-PLAN from documents (to_json over structs — so the
# oracle can recompute everything closed-form, and the query proves
# the JSON escape/unescape roundtrip: content flows text -> to_json ->
# from_json -> template, and must md5-match the oracle's raw-text
# template). Ten deterministic variants by doc_id % 10 cover all three
# valid shapes and all seven named invalid reasons.
# ---------------------------------------------------------------------------

# P(role, content) = '<|im_start|>' || role || LF || content ||
# '<|im_end|>' || LF — the flatten_chat default template
_CHAT_ORACLE = """
WITH t AS (
  SELECT doc_id, doc_id % 10 AS m,
    'You are a concise assistant.' AS sys,
    'Please summarize: ' || substring(text, 1, 80) AS u1,
    'Summary: ' || substring(text, 1, 40) || ' ...' AS a1,
    'And how long is it?' AS u2,
    'It is ' || CAST(length(text) AS VARCHAR) || ' characters.' AS a2
  FROM documents
)
SELECT doc_id,
  CASE m WHEN 3 THEN 'broken_alternation' WHEN 4 THEN 'unknown_role'
         WHEN 5 THEN 'no_assistant_target' WHEN 6 THEN 'unparseable_json'
         WHEN 7 THEN 'system_not_first' WHEN 8 THEN 'empty_conversation'
         WHEN 9 THEN 'empty_content' END AS reason,
  CASE m WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 4 END AS n_turns,
  CASE m WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 END
    AS n_assistant_turns,
  CASE m WHEN 0 THEN length(a1) WHEN 1 THEN length(a1)
         WHEN 2 THEN length(a1) + length(a2) END AS assistant_chars,
  CASE m
    WHEN 0 THEN md5('<|im_start|>system' || chr(10) || sys
      || '<|im_end|>' || chr(10) || '<|im_start|>user' || chr(10) || u1
      || '<|im_end|>' || chr(10) || '<|im_start|>assistant' || chr(10)
      || a1 || '<|im_end|>' || chr(10))
    WHEN 1 THEN md5('<|im_start|>user' || chr(10) || u1
      || '<|im_end|>' || chr(10) || '<|im_start|>assistant' || chr(10)
      || a1 || '<|im_end|>' || chr(10))
    WHEN 2 THEN md5('<|im_start|>user' || chr(10) || u1
      || '<|im_end|>' || chr(10) || '<|im_start|>assistant' || chr(10)
      || a1 || '<|im_end|>' || chr(10) || '<|im_start|>user' || chr(10)
      || u2 || '<|im_end|>' || chr(10) || '<|im_start|>assistant'
      || chr(10) || a2 || '<|im_end|>' || chr(10))
  END AS flat_digest
FROM t
"""


@query("chat_sft_flatten", oracle=_CHAT_ORACLE)
def chat_sft_flatten(spark, sf_dir):
    """SFT conversation prep (``llmops.flatten_chat``): JSON
    conversation arrays → ``from_json`` parse → per-turn validation
    with named quarantine reasons (unparseable / empty / unknown role /
    empty content / system-not-first / broken alternation / no
    assistant target) → ChatML-shaped template flatten + turn stats.
    The conversations are built in-plan from ``documents`` via
    ``to_json`` over structs, so the oracle recomputes every column
    closed-form from the raw text — including the md5 of the flattened
    string, which proves the JSON escape/unescape roundtrip on real
    document content (quotes, newlines, non-ASCII).

    Scale shape: map-only JVM expressions end to end (``from_json`` +
    higher-order array functions — zero Python, zero joins, zero
    shuffles); validity is per-row, so the plan pipelines with the
    parquet scan at any corpus size."""
    from bravo_spark import llmops

    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", "text")
    t = F.col("text")
    m = F.col("doc_id") % 10
    sys_c = F.lit("You are a concise assistant.")
    u1 = F.concat(F.lit("Please summarize: "), F.substring(t, 1, 80))
    a1 = F.concat(F.lit("Summary: "), F.substring(t, 1, 40),
                  F.lit(" ..."))
    u2 = F.lit("And how long is it?")
    a2 = F.concat(F.lit("It is "), F.length(t).cast("string"),
                  F.lit(" characters."))

    def turn(role, content):
        return F.struct(F.lit(role).alias("role"),
                        content.alias("content"))

    two_turn = F.to_json(F.array(turn("user", u1), turn("assistant", a1)))
    conv = (
        F.when(m == 0, F.to_json(F.array(
            turn("system", sys_c), turn("user", u1),
            turn("assistant", a1))))
        .when(m == 1, two_turn)
        .when(m == 2, F.to_json(F.array(
            turn("user", u1), turn("assistant", a1),
            turn("user", u2), turn("assistant", a2))))
        .when(m == 3, F.to_json(F.array(
            turn("user", u1), turn("user", u2), turn("assistant", a1))))
        .when(m == 4, F.to_json(F.array(
            turn("narrator", u1), turn("assistant", a1))))
        .when(m == 5, F.to_json(F.array(
            turn("user", u1), turn("assistant", a1), turn("user", u2))))
        # torn JSON: the fixed 25-char prefix of the two-turn shape
        .when(m == 6, F.substring(two_turn, 1, 25))
        .when(m == 7, F.to_json(F.array(
            turn("user", u1), turn("system", sys_c),
            turn("assistant", a1))))
        .when(m == 8, F.lit("[]"))
        .otherwise(F.to_json(F.array(
            turn("user", F.lit("")), turn("assistant", a1))))
    )
    src = docs.select("doc_id", conv.alias("conversation"))
    out = llmops.flatten_chat(src, "conversation", quarantine=True)
    return out.select(
        "doc_id",
        F.col("chat_reason").alias("reason"),
        "n_turns",
        "n_assistant_turns",
        "assistant_chars",
        F.md5("chat_text").alias("flat_digest"),
    )


# ---------------------------------------------------------------------------
# preference-pair (DPO) prep — r19. The post-training companion of
# chat_sft_flatten: validate (prompt, chosen, rejected) triples with
# named reasons, render both completions through the same ChatML
# template, and expose the length-gap bias diagnostic. Triples are
# built IN-PLAN from documents (six deterministic variants by
# doc_id % 6: two valid shapes with opposite-sign length gaps + all
# four refusal reasons), so the oracle recomputes everything
# closed-form — including both rendered-text digests.
# ---------------------------------------------------------------------------

_DPO_ORACLE = """
WITH t AS (
  SELECT doc_id, doc_id % 6 AS m,
    'Please summarize: ' || substring(text, 1, 80) AS p,
    'Summary: ' || substring(text, 1, 60) AS good,
    'I cannot help with that.' AS bad
  FROM documents
)
SELECT doc_id,
  CASE m WHEN 2 THEN 'empty_prompt' WHEN 3 THEN 'empty_chosen'
         WHEN 4 THEN 'empty_rejected' WHEN 5 THEN 'identical_pair'
  END AS reason,
  CASE m
    WHEN 0 THEN md5('<|im_start|>user' || chr(10) || p || '<|im_end|>'
      || chr(10) || '<|im_start|>assistant' || chr(10) || good
      || '<|im_end|>' || chr(10))
    WHEN 1 THEN md5('<|im_start|>user' || chr(10) || p || '<|im_end|>'
      || chr(10) || '<|im_start|>assistant' || chr(10) || 'Yes.'
      || '<|im_end|>' || chr(10))
  END AS chosen_digest,
  CASE m
    WHEN 0 THEN md5('<|im_start|>user' || chr(10) || p || '<|im_end|>'
      || chr(10) || '<|im_start|>assistant' || chr(10) || bad
      || '<|im_end|>' || chr(10))
    WHEN 1 THEN md5('<|im_start|>user' || chr(10) || p || '<|im_end|>'
      || chr(10) || '<|im_start|>assistant' || chr(10) || good
      || '<|im_end|>' || chr(10))
  END AS rejected_digest,
  CASE m WHEN 0 THEN length(good) - length(bad)
         WHEN 1 THEN 4 - length(good) END AS length_gap
FROM t
"""


@query("dpo_pair_prep", oracle=_DPO_ORACLE)
def dpo_pair_prep(spark, sf_dir):
    """Preference-pair (DPO) prep (``llmops.prep_preference_pairs``):
    validate (prompt, chosen, rejected) triples — non-empty fields,
    distinct completions — with a named reason per rule, render both
    completions through the ChatML template chat_sft_flatten uses, and
    compute the length-gap bias diagnostic. Triples are built in-plan
    from ``documents`` (two valid variants with opposite-sign length
    gaps + all four refusal reasons by doc_id % 6), so the oracle
    recomputes both rendered digests and the gap closed-form.

    Scale shape: pure JVM string expressions over the parquet scan —
    map-only, zero Python, zero joins, zero shuffles."""
    from bravo_spark import llmops

    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", "text")
    m = F.col("doc_id") % 6
    p = F.concat(F.lit("Please summarize: "),
                 F.substring(F.col("text"), 1, 80))
    good = F.concat(F.lit("Summary: "), F.substring(F.col("text"), 1, 60))
    bad = F.lit("I cannot help with that.")
    src = docs.select(
        "doc_id",
        F.when(m == 2, F.lit("")).otherwise(p).alias("prompt"),
        (F.when(m == 1, F.lit("Yes."))
         .when(m == 3, F.lit(""))
         .when(m == 5, bad)
         .otherwise(good)).alias("chosen"),
        (F.when(m == 1, good)
         .when(m == 4, F.lit(""))
         .when(m == 5, bad)
         .otherwise(bad)).alias("rejected"),
    )
    out = llmops.prep_preference_pairs(
        src, "prompt", "chosen", "rejected", quarantine=True)
    return out.select(
        "doc_id",
        F.col("pair_reason").alias("reason"),
        F.md5("chosen_text").alias("chosen_digest"),
        F.md5("rejected_text").alias("rejected_digest"),
        "length_gap",
    )
