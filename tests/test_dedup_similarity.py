"""Dedup / similarity property tests: planted duplicates must be
recovered (SURVEY.md §5.2.3), similarity operators must match a local
numpy oracle, and LSH candidate generation must be deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from spark_sklearn_spark.operators.minhash import near_dup_pairs, shingle_words
from spark_sklearn_spark.operators.similarity import cosine_pairs, cosine_topk

VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon"
).split()


def _random_doc(rng, n):
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def test_planted_near_dups_recovered(spark):
    """40 random docs + 5 planted near-identical copies (one word
    changed): exactly the planted pairs come back at J >= 0.8."""
    rng = np.random.RandomState(3)
    docs = [_random_doc(rng, 60) for _ in range(40)]
    planted = []
    for i in range(5):
        words = docs[i].split()
        words[17] = "CHANGED"
        docs.append(" ".join(words))
        planted.append((i, 40 + i))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    pairs = near_dup_pairs(df, "doc_id", "text", jaccard_threshold=0.8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == set(planted)


def test_minhash_deterministic_across_runs(spark):
    rng = np.random.RandomState(5)
    docs = [_random_doc(rng, 40) for _ in range(20)]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(20), "text": docs}))
    a = sorted(map(tuple, near_dup_pairs(df, "doc_id", "text", 0.1).collect()))
    b = sorted(
        map(tuple, near_dup_pairs(df.repartition(7), "doc_id", "text", 0.1).collect())
    )
    assert a == b


def test_shingles_short_docs_are_empty(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["one two", "a b c d"]})
    )
    out = df.select(F.size(shingle_words(F.col("text"), 3)).alias("n")).collect()
    assert [r["n"] for r in out] == [0, 2]


def _random_embeddings(rng, n, dim=16):
    return pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [rng.rand(dim).astype("float32").tolist() for _ in range(n)],
        }
    )


def test_cosine_pairs_matches_numpy(spark):
    rng = np.random.RandomState(17)
    pdf = _random_embeddings(rng, 60)
    df = spark.createDataFrame(pdf)
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs(df, "vec_id", "embedding", 0.8, buckets=4).collect()
    }
    m = np.vstack([np.asarray(v, dtype="float64") for v in pdf["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    want = {
        (i, j)
        for i in range(60)
        for j in range(i + 1, 60)
        if sims[i, j] >= 0.8
    }
    assert got == want and len(want) > 0


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.RandomState(19)
    pdf = _random_embeddings(rng, 50)
    df = spark.createDataFrame(pdf)
    got = [
        r["vec_id"]
        for r in cosine_topk(
            df, df.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=5
        ).collect()
    ]
    m = np.vstack([np.asarray(v, dtype="float64") for v in pdf["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m[0], 6)
    want = sorted(range(50), key=lambda i: (-sims[i], i))[:5]
    assert got == want


def test_multimodal_resize_and_frames(spark):
    """Resize + frame-sample stages keep the binary contract: fixed
    raster size out of resize, bounded frame fan-out from sampling."""
    import pandas as pd

    from spark_sklearn_spark.multimodal import (
        as_media,
        resize_images,
        sample_frames,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["x" * 9000, "word soup here"]})
    )
    media = as_media(df, "doc_id", "text")
    small = resize_images(media, 8, 8).collect()
    assert all(len(bytes(r["pixels"])) == 64 for r in small)
    frames = sample_frames(media, every_n_bytes=4096, max_frames=4).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert sorted(per_doc[0]) == [0, 1]   # 9000 bytes -> 2 frames
    assert sorted(per_doc[1]) == [0]      # short payload -> 1 frame
