"""MinHash-LSH near-duplicate detection (SURVEY.md §2B q_dedup_minhash).

Hand-rolled (no ml.feature dependency), deterministic:

1. shingle + hash: word-level n-grams hashed ONCE (blake2b, 8 bytes)
   inside a single Arrow batch pass — Spark's higher-order array
   functions run interpreted with no CSE, so an all-JVM expression
   pipeline here measured ~8× slower than the numpy path.
2. minhash signature + banding: the k-permutation family
   ((a·h+b) mod 2⁶⁴ multiply-shift) and per-band FNV compression as
   one broadcasted numpy expression per doc. Only the
   (doc_id, band_idx, band_hash) triples leave the map — bands·N
   rows, the only shuffle of the candidate phase.
3. candidate pairs: self-equi-join on (band_idx, band_hash) — a plain
   shuffled hash join on a compound key; never an all-pairs product.
4. verify: candidates re-join the shingle-hash sets and exact Jaccard
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
    text column (array<string>). Empty when the doc has < n words —
    guarded explicitly, because sequence(1, 0) would generate a
    DESCENDING [1, 0] (not an empty array) and index out of bounds."""
    w = F.split(text_col, " ")
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            "_", *[F.element_at(w, i + off) for off in range(n)]
        ),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(empty)


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    bands: int = 32,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from the LSH band join,
    carrying both shingle-hash sets for exact verification downstream.

    The (doc, shingle-hashes) relation is computed ONCE and persisted:
    it feeds the banding pass and both sides of the verify join, and
    re-deriving it costs a full interpreted shingling pass each time
    (measured: 3 recomputes ≈ 19 s vs ~7 s persisted at sf0.1). At
    cluster scale the same staging would be a checkpoint/exchange
    reuse; the persisted relation is just (long, array<long>) — far
    smaller than the texts."""
    import numpy as np
    import pandas as pd

    # Shingling + shingle hashing runs inside ONE Arrow batch pass:
    # Spark's higher-order array functions are interpreted (no
    # codegen, no CSE), so a JVM-expression shingle pipeline costs
    # more than the Python split + blake2b path over the same Arrow
    # batches (measured 13.5 s vs ~4 s at sf0.1). blake2b(8 bytes) is
    # a keyless, platform-stable hash — deterministic across runs,
    # workers, and partitionings.
    n = shingle_n

    def shingle_hash(batches):
        from hashlib import blake2b

        for pdf in batches:
            docs_out, hs_out = [], []
            for doc, text in zip(pdf["doc"], pdf["text"]):
                w = text.split(" ")
                if len(w) < n:
                    continue
                sh = {"_".join(w[i : i + n]) for i in range(len(w) - n + 1)}
                hs = np.fromiter(
                    (
                        int.from_bytes(
                            blake2b(s.encode(), digest_size=8).digest(), "big"
                        )
                        for s in sh
                    ),
                    dtype=np.uint64,
                    count=len(sh),
                )
                docs_out.append(doc)
                hs_out.append(hs.view(np.int64))
            yield pd.DataFrame({"doc": docs_out, "hs": hs_out})

    # k minhash permutations as (a_i·h + b_i) mod 2^64 multiply-shift
    # with odd a_i, then per-band FNV compression — all one broadcasted
    # numpy expression per doc. Deterministic: fixed RandomState seed,
    # uint64 wraparound is well-defined.
    k = bands * rows_per_band
    rng = np.random.RandomState(42)
    A = (rng.randint(1, 2**62, size=k, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    Bc = rng.randint(0, 2**63, size=k, dtype=np.uint64)
    FNV = np.uint64(1099511628211)

    def to_bands(batches):
        for pdf in batches:
            docs_out, band_idx_out, band_hash_out = [], [], []
            for doc, hs in zip(pdf["doc"], pdf["hs"]):
                h = np.asarray(hs, dtype=np.int64).view(np.uint64)
                sig = (A[:, None] * h[None, :] + Bc[:, None]).min(axis=1)
                bh = np.full(bands, np.uint64(14695981039346656037), dtype=np.uint64)
                for r in range(rows_per_band):
                    bh = (bh * FNV) ^ sig[r::rows_per_band][:bands]
                docs_out.extend([doc] * bands)
                band_idx_out.extend(range(bands))
                band_hash_out.extend(bh.view(np.int64))
            yield pd.DataFrame(
                {"doc": docs_out, "band_idx": band_idx_out, "band_hash": band_hash_out}
            )

    hashed = (
        df.select(F.col(id_col).cast("long").alias("doc"), F.col(text_col).alias("text"))
        .mapInPandas(shingle_hash, "doc long, hs array<long>")
        .persist()
    )
    # Only (doc, band_idx, band_hash) triples shuffle through the band
    # join — the heavy hash arrays stay out of the candidate phase and
    # are re-joined once per *surviving* pair side below. Persisted:
    # the self-join reads banded on BOTH sides and the aliased selects
    # sit below the exchange, so without this the k-permutation
    # signature pass runs twice per invocation (the staging rule
    # operators/srp.py:111 cites from this module but this module
    # didn't apply to its own banding stage until r6).
    banded = hashed.mapInPandas(
        to_bands, "doc long, band_idx int, band_hash long"
    ).persist()
    a = banded.select(F.col("doc").alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col("doc").alias("id_b"), "band_idx", "band_hash")
    pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    hs_a = hashed.select(F.col("doc").alias("id_a"), F.col("hs").alias("hs_a"))
    hs_b = hashed.select(F.col("doc").alias("id_b"), F.col("hs").alias("hs_b"))
    return pairs.join(hs_a, "id_a").join(hs_b, "id_b").select(
        "id_a", "id_b", "hs_a", "hs_b"
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
    Jaccard is computed on the distinct shingle-HASH sets — an exact
    rational, identical to shingle-set Jaccard unless blake2b-64
    collides within one pair's union (~n²/2⁶⁴ ≈ 1e-15 for 100-shingle
    docs) — so it hash-matches an exact SQL oracle over the shingle
    sets themselves.
    """
    cand = minhash_candidate_pairs(df, id_col, text_col, shingle_n, bands, rows_per_band)
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size(F.array_union("hs_a", "hs_b"))
    return (
        cand.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
