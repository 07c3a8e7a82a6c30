"""Sign-random-projection (SRP) LSH for embedding near-duplicates.

The sublinear candidate path for *vector* similarity that
``operators/minhash.py`` provides for *set* similarity — same banded
shape (SURVEY.md §2B, LLM-pipeline; fills the gap named in
operators/similarity.py and VERDICT r2 item 2):

1. signatures: ``planes = bands·rows_per_band`` fixed random
   hyperplanes (seeded Gaussian); each vector's bit i is
   ``sign(v · h_i)``. One ``(n×d) @ (d×planes)`` float64 BLAS matmul
   per Arrow batch — never a per-row JVM fold.
2. banding: bits are packed ``rows_per_band`` at a time into an int
   band hash; only ``(vid, band_idx, band_hash)`` triples leave the
   map — ``bands·n`` rows, the only shuffle of the candidate phase.
3. candidate pairs: self-equi-join on ``(band_idx, band_hash)`` — a
   plain shuffled hash join on a compound key; never all-pairs.
4. verify: candidates re-join the vectors and exact cosine (JVM-side
   O(d) folds, rounded-before-compare) filters false positives.

Why signs: ``P[sign(a·h) = sign(b·h)] = 1 − θ(a,b)/π`` (Goemans–
Williamson / Charikar SimHash bound), and signs are invariant to
positive scaling, so no normalization is needed before hashing.

Recall at the defaults (bands=64, rows=16, 1024 planes): cos 0.95 →
p=0.899, miss prob (1−p¹⁶)⁶⁴ ≈ 2e-6; cos 0.9 → p=0.856, miss ≈ 0.4%.
A random orthogonal pair (p=0.5) expects 64·2⁻¹⁶ ≈ 1e-3 candidate
bands, so candidate volume stays ~linear in n at production τ ≥ 0.9.
Exact duplicates (and positive scalings) share the full signature and
are caught with probability 1. The exact block-matmul
(operators/similarity.py cosine_pairs) remains the verifier and the
low-τ recall oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.vectors import as_double_array, cosine, sq_norm


def srp_band_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bands: int = 64,
    rows_per_band: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Long-form ``(vid, band_idx, band_hash)`` SRP band signatures.

    The hyperplane matrix is regenerated inside every task from the
    fixed seed (legacy RandomState stream — stable across numpy
    versions and workers), so nothing but the seed is captured in the
    closure; for d=64, planes=1024 that is a 512 KB local matrix and
    one BLAS matmul per batch.
    """
    import numpy as np
    import pandas as pd

    planes = bands * rows_per_band
    pow2 = (2 ** np.arange(rows_per_band, dtype=np.uint64)).astype(np.uint64)

    def to_bands(batches):
        R = None
        for pdf in batches:
            vids_out, band_idx_out, band_hash_out = [], [], []
            if len(pdf):
                V = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
                if R is None:
                    rng = np.random.RandomState(seed)
                    R = rng.standard_normal((V.shape[1], planes))
                bits = (V @ R) >= 0.0  # (n, planes) — sign bits
                packed = (
                    bits.reshape(len(pdf), bands, rows_per_band).astype(np.uint64)
                    @ pow2
                )  # (n, bands) — int band hashes
                vids = pdf["vid"].to_numpy()
                vids_out = np.repeat(vids, bands)
                band_idx_out = np.tile(np.arange(bands, dtype=np.int32), len(pdf))
                band_hash_out = packed.reshape(-1).view(np.int64)
            yield pd.DataFrame(
                {"vid": vids_out, "band_idx": band_idx_out, "band_hash": band_hash_out}
            )

    base = df.select(
        F.col(id_col).cast("long").alias("vid"),
        as_double_array(F.col(vec_col)).alias("vec"),
    )
    return base.mapInPandas(to_bands, "vid long, band_idx int, band_hash long")


def srp_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    bands: int = 64,
    rows_per_band: int = 16,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Verified near-dup pairs ``(id_a < id_b, cos ≥ threshold)``.

    SRP band join proposes candidates; exact cosine (rounded to
    ``round_to`` BEFORE the threshold compare, the repo-wide
    determinism rule) verifies them. The three O(d) folds per
    candidate run JVM-side — candidates are ~linear at τ ≥ 0.9, so
    no Arrow stage is needed in the verify.
    """
    banded = srp_band_signatures(df, id_col, vec_col, bands, rows_per_band, seed)
    # The band self-join consumes ``banded`` on BOTH sides, and the
    # per-side aliasing sits below the exchange so ReuseExchange cannot
    # dedupe the subtrees — without staging, the whole Arrow signature
    # pass runs twice. Persist the (vid, band_idx, band_hash) triples
    # (3 longs/row — far smaller than the vectors); same staging rule
    # as operators/minhash.py, released by the caller's clearCache.
    banded = banded.persist()
    a = banded.select(F.col("vid").alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col("vid").alias("id_b"), "band_idx", "band_hash")
    cand = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = df.select(
        F.col(id_col).cast("long").alias("vid"),
        as_double_array(F.col(vec_col)).alias("vec"),
    )
    va = vecs.select(F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"))
    vb = vecs.select(F.col("vid").alias("id_b"), F.col("vec").alias("vec_b"))
    cos = cosine("vec_a", "vec_b") / F.sqrt(
        sq_norm("vec_a") * sq_norm("vec_b")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(cos, round_to).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
