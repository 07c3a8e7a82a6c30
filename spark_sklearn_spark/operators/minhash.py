"""MinHash-LSH near-duplicate detection (SURVEY.md §2B q_dedup_minhash).

Hand-rolled, fully JVM-side (no Python in the hot path, no ml.feature
dependency), deterministic:

1. shingle: word-level n-grams, distinct per doc — higher-order array
   expressions, no explode.
2. minhash signature: k hash functions simulated as
   ``min(xxhash64(shingle, perm_index))`` — computed as one nested
   transform/aggregate expression, again no explode, so a document row
   never leaves its partition for signature computation.
3. banding: k = bands·rows_per_band; each band hashed to one long.
   Only the (doc_id, band_idx, band_hash) triples are exploded —
   bands·N rows, the only shuffle of the candidate phase.
4. candidate pairs: self-equi-join on (band_idx, band_hash) — a plain
   shuffled hash join on a compound key; never an all-pairs product.
5. verify: candidates re-join the shingle sets and exact Jaccard
   filters false positives.

Recall: a true pair with Jaccard J matches one band with probability
1-(1-J^r)^b. At the defaults (b=32, r=4) a J=0.9 pair is missed with
probability (1-0.9⁴)^32 ≈ 1.4e-15 — effectively exact for near-dup
thresholds — while a random J≈0.05 pair has ~2e-4 expected candidate
bands, so candidate volume stays ~linear. This is the sublinear scale
path for 100 TB dedup; the exact O(n²) verifier only ever sees
candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shingle_words(text_col, n: int = 3):
    """Distinct word-level n-gram shingles of a whitespace-tokenized
    text column (array<string>). Empty when the doc has < n words."""
    w = F.split(text_col, " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            "_", *[F.element_at(w, i + off) for off in range(n)]
        ),
    )
    return F.array_distinct(grams)


def minhash_signature(shingles_col, num_hashes: int = 128):
    """k-minhash signature (array<long>) of a shingle-set column.

    Hash function family: xxhash64(shingle, i) for i in [0, k) — the
    permutation index rides along as a second hashed column, which is
    equivalent to k independent seeds and stays deterministic across
    runs and partitionings.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles_col, lambda s: F.xxhash64(s, i))
        ),
    )


def band_hashes(shingles_col, bands: int, rows_per_band: int):
    """``bands`` LSH band hashes, each over its own ``rows_per_band``
    minhashes, computed directly from the shingle set.

    Deliberately fused: building this as band_hashes(signature(...))
    would embed a copy of the FULL k-hash signature expression inside
    every band's slice — higher-order functions run interpreted with
    no common-subexpression elimination, so that shape does bands×
    redundant work (measured 32× ≈ 230 s vs ~8 s at sf0.1). Here band
    b evaluates exactly its own rows_per_band array-mins.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                ":",
                F.transform(
                    F.sequence(
                        b * rows_per_band, b * rows_per_band + (rows_per_band - 1)
                    ),
                    lambda i: F.array_min(
                        F.transform(shingles_col, lambda s: F.xxhash64(s, i))
                    ).cast("string"),
                ),
            )
        ),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    bands: int = 32,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from the LSH band join,
    carrying both shingle sets for exact verification downstream."""
    sh = df.select(
        F.col(id_col).cast("long").alias("doc"),
        shingle_words(F.col(text_col), shingle_n).alias("sh"),
    ).filter(F.size("sh") > 0)
    # Only (doc, band_idx, band_hash) triples shuffle through the band
    # join — the heavy shingle arrays stay out of the candidate phase
    # and are re-joined once per *surviving* pair side below.
    banded = sh.select(
        "doc",
        F.posexplode(band_hashes(F.col("sh"), bands, rows_per_band)).alias(
            "band_idx", "band_hash"
        ),
    )
    a = banded.select(F.col("doc").alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col("doc").alias("id_b"), "band_idx", "band_hash")
    pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh_a = sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    return pairs.join(sh_a, "id_a").join(sh_b, "id_b").select(
        "id_a", "id_b", "sh_a", "sh_b"
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float,
    shingle_n: int = 3,
    bands: int = 32,
    rows_per_band: int = 4,
) -> DataFrame:
    """Verified near-duplicate pairs: LSH candidates → exact Jaccard.

    Output: (id_a, id_b, jaccard) with id_a < id_b, J ≥ threshold.
    Jaccard is an exact rational (|A∩B| / |A∪B| on distinct shingle
    sets) so it hash-matches an exact SQL oracle.
    """
    cand = minhash_candidate_pairs(df, id_col, text_col, shingle_n, bands, rows_per_band)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
