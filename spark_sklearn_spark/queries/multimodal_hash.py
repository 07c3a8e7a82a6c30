"""Hash-verified multimodal decode: the Arrow raster path vs pure SQL.

q_multimodal_decode is rows-only because its features (float mean,
Shannon entropy) aren't portable. This twin recomputes the SAME
decode — payload bytes tiled to a 64x64 raster (multimodal/columns.py
_decode_stub, i.e. np.resize's cyclic repeat) — but reports
INTEGER-EXACT statistics, so the whole mapInPandas/Arrow decode
pipeline is differential-checked against a DuckDB oracle that rebuilds
the raster positionally in SQL:

  mean_micro  = (sum of tiled bytes * 1e6) div 4096
  gini_num    = 4096^2 - sum(count_b^2)   (Gini impurity numerator —
                the integer-friendly histogram-concentration stat;
                Shannon entropy would drag in libm)
  ahash_lo/hi = the classic 8x8 average-hash, bit b set iff
                64 * block_sum > raster_sum (integer cross-multiply,
                no division), packed into two BIGINT halves

A hash mismatch here would catch ANY drift in the decode plumbing:
byte order, tiling, block indexing, Arrow batch boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load

MMH_SIDE = 64
MMH_PX = MMH_SIDE * MMH_SIDE  # 4096

_MMH_ORACLE = f"""
    WITH docs AS (
      -- byte semantics made explicit: the Spark side tiles UTF-8 BYTES,
      -- this rebuild indexes CHARACTERS — they agree only for ASCII-only
      -- docs, so both sides filter to length == bytelength (a no-op on
      -- the current all-ASCII fixture, structural parity if that changes)
      SELECT doc_id, text, length(text) AS L
      FROM documents
      WHERE length(text) > 0 AND length(text) = strlen(text)
    ),
    pos AS (
      SELECT doc_id, k,
             ascii(substr(text, (k % L) + 1, 1)) AS b,
             ((k // {MMH_SIDE}) // 8) * 8 + ((k % {MMH_SIDE}) // 8)
                 AS block
      FROM docs,
           LATERAL (SELECT unnest(generate_series(0, {MMH_PX} - 1)) AS k)
    ),
    totals AS (
      SELECT doc_id, CAST(SUM(b) AS BIGINT) AS total FROM pos
      GROUP BY doc_id
    ),
    hist AS (
      SELECT doc_id, b, COUNT(*) AS c FROM pos GROUP BY doc_id, b
    ),
    gini AS (
      SELECT doc_id,
             CAST({MMH_PX} * {MMH_PX} - SUM(c * c) AS BIGINT) AS gini_num
      FROM hist GROUP BY doc_id
    ),
    blocks AS (
      SELECT doc_id, block, CAST(SUM(b) AS BIGINT) AS bs FROM pos
      GROUP BY doc_id, block
    ),
    bits AS (
      SELECT bl.doc_id,
             CAST(SUM(CASE WHEN bl.block < 32 AND bl.bs * 64 > t.total
                           THEN (CAST(1 AS BIGINT) << bl.block)
                           ELSE 0 END) AS BIGINT) AS ahash_lo,
             CAST(SUM(CASE WHEN bl.block >= 32 AND bl.bs * 64 > t.total
                           THEN (CAST(1 AS BIGINT) << (bl.block - 32))
                           ELSE 0 END) AS BIGINT) AS ahash_hi
      FROM blocks bl JOIN totals t ON t.doc_id = bl.doc_id
      GROUP BY bl.doc_id
    )
    SELECT d.doc_id, CAST(d.L AS BIGINT) AS n_bytes,
           CAST(t.total * 1000000 // {MMH_PX} AS BIGINT) AS mean_micro,
           g.gini_num, b.ahash_lo, b.ahash_hi
    FROM docs d
    JOIN totals t ON t.doc_id = d.doc_id
    JOIN gini g ON g.doc_id = d.doc_id
    JOIN bits b ON b.doc_id = d.doc_id
    ORDER BY d.doc_id
"""

_OUT_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mean_micro bigint,"
    " gini_num bigint, ahash_lo bigint, ahash_hi bigint"
)


@query("q_multimodal_hash", oracle=_MMH_ORACLE)
def q_multimodal_hash(spark, d):
    """DECLARED multimodal decode (module docstring): the real
    mapInPandas/Arrow decode path — payload wrap, stub raster decode,
    per-image stats — reduced to integer-exact features and
    hash-checked against a positional SQL rebuild of the raster.
    Plan: binary wrap projection -> mapInPandas (Arrow batches, one
    output row per payload — identical shape to a PIL featurizer) ->
    sort. Per-row work is O(raster); no shuffle until the final
    order."""
    from ..multimodal.columns import as_media, decode_image

    media = as_media(
        load(spark, d, "documents")
        .filter(F.col("n_chars") > 0)
        # ASCII-only gate mirroring the oracle's length = strlen filter:
        # the raster tiles UTF-8 bytes, the SQL rebuild indexes chars
        .filter(F.length("text") == F.octet_length("text")),
        "doc_id",
        "text",
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_bytes", "mean_micro", "gini_num",
                "ahash_lo", "ahash_hi",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                img = decode_image(raw).astype(np.int64)
                total = int(img.sum())
                counts = np.bincount(
                    img.ravel().astype(np.uint8), minlength=256
                ).astype(np.int64)
                gini_num = MMH_PX * MMH_PX - int((counts * counts).sum())
                blocks = img.reshape(8, 8, 8, 8).sum(axis=(1, 3)).ravel()
                lo = hi = 0
                for i, bs in enumerate(blocks):
                    if int(bs) * 64 > total:
                        if i < 32:
                            lo |= 1 << i
                        else:
                            hi |= 1 << (i - 32)
                out["doc_id"].append(int(doc_id))
                out["n_bytes"].append(len(raw))
                out["mean_micro"].append(total * 1_000_000 // MMH_PX)
                out["gini_num"].append(gini_num)
                out["ahash_lo"].append(lo)
                out["ahash_hi"].append(hi)
            yield pd.DataFrame(out)

    return media.mapInPandas(featurize, _OUT_SCHEMA).orderBy("doc_id")
