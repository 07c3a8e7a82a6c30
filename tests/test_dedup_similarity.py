"""Dedup / similarity property tests: planted duplicates must be
recovered (SURVEY.md §5.2.3), similarity operators must match a local
numpy oracle, and LSH candidate generation must be deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

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


def test_decode_image_stub_parity():
    """Non-codec bytes must hit the stub raster whether or not PIL is
    installed (VERDICT r2 item 8): the fixture-driven queries may not
    change results when the real decoder library appears."""
    from spark_sklearn_spark.multimodal.columns import _decode_stub, decode_image

    payload = b"definitely not a PNG stream" * 40
    np.testing.assert_array_equal(decode_image(payload), _decode_stub(payload))
    with pytest.raises(NotImplementedError):
        decode_image(b"")


def test_decode_image_real_path_when_pil_present():
    """When PIL exists, a genuine PNG decodes for real at native size
    and featurization normalizes it to the 64x64 thumbnail."""
    from spark_sklearn_spark.multimodal.columns import _HAS_PIL, decode_image

    if not _HAS_PIL:
        pytest.skip("PIL not installed in this container; stub path covered above")
    import io

    from PIL import Image

    raster = np.arange(96 * 96, dtype=np.uint8).reshape(96, 96)
    buf = io.BytesIO()
    Image.fromarray(raster, mode="L").save(buf, format="PNG")
    got = decode_image(buf.getvalue())
    np.testing.assert_array_equal(got, raster)


def test_srp_planted_copies_recovered_exactly(spark):
    """Isotropic vectors + scaled copies: SRP-LSH at tau=0.98 returns
    exactly the planted (source, copy) pairs — sign signatures are
    scale-invariant, so recall on exact-direction dups is 1.0, and the
    exact-cosine verify kills every band false positive."""
    from spark_sklearn_spark.operators.srp import srp_near_dup_pairs

    rng = np.random.RandomState(23)
    n, dim = 50, 16
    vecs = [rng.standard_normal(dim).astype("float32").tolist() for _ in range(n)]
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": vecs})
    copies = pd.DataFrame(
        {
            "vec_id": [1000 + i for i in range(5)],
            "embedding": [[3.0 * x for x in vecs[i]] for i in range(5)],
        }
    )
    df = spark.createDataFrame(pd.concat([pdf, copies], ignore_index=True))
    got = {
        (r["id_a"], r["id_b"])
        for r in srp_near_dup_pairs(df, "vec_id", "embedding", 0.98).collect()
    }
    assert got == {(i, 1000 + i) for i in range(5)}


def test_srp_recall_vs_exact_at_high_tau(spark):
    """Near-identical (noised) copies at cos ~0.99: the SRP pair set
    must equal the exact block-matmul pair set at tau=0.95 — the
    banded path loses nothing the exact verifier would keep (fixed
    seeds make this deterministic; analytic miss prob ~2e-6/pair)."""
    from spark_sklearn_spark.operators.srp import srp_near_dup_pairs

    rng = np.random.RandomState(29)
    n, dim = 40, 16
    base = [rng.standard_normal(dim) for _ in range(n)]
    rows = [(i, v.astype("float32").tolist()) for i, v in enumerate(base)]
    for i in range(6):
        noisy = base[i] + 0.05 * rng.standard_normal(dim)
        rows.append((2000 + i, noisy.astype("float32").tolist()))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]})
    )
    srp = {
        (r["id_a"], r["id_b"])
        for r in srp_near_dup_pairs(df, "vec_id", "embedding", 0.95).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs(df, "vec_id", "embedding", 0.95, buckets=4).collect()
    }
    assert srp == exact and len(exact) >= 5


def test_mmr_rerank_is_more_diverse_than_topk(spark, sf_dir):
    """MMR's selected set must (a) keep the most-relevant candidate at
    rank 1, and (b) have strictly lower average pairwise cosine than
    the plain top-k prefix — otherwise the diversity term did nothing."""
    import numpy as np
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from spark_sklearn_spark.functions.vectors import as_double_array
    from spark_sklearn_spark.operators.similarity import cosine_topk
    from spark_sklearn_spark.queries.pipeline5 import (
        MMR_CAND,
        MMR_K,
        MMR_QUERY_ID,
    )
    from spark_sklearn_spark.sources.io import load

    mmr = entry.queries()["q_sim_mmr_rerank"](spark, sf_dir).collect()
    assert len(mmr) == MMR_K
    assert [r["rank"] for r in mmr] == list(range(1, MMR_K + 1))

    emb = load(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == MMR_QUERY_ID).select("embedding")
    top = cosine_topk(
        emb.filter(F.col("vec_id") != MMR_QUERY_ID),
        qrow,
        "vec_id",
        "embedding",
        MMR_CAND,
    ).collect()
    # rank 1 = the globally most relevant candidate
    assert mmr[0]["vec_id"] == top[0]["vec_id"]

    vecs = {
        r["vec_id"]: np.array(r["vec"], dtype=np.float64)
        for r in emb.select(
            "vec_id", as_double_array(F.col("embedding")).alias("vec")
        ).collect()
    }

    def avg_pairwise(ids):
        X = np.vstack([vecs[i] for i in ids])
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        S = X @ X.T
        n = len(ids)
        return (S.sum() - n) / (n * (n - 1))

    mmr_div = avg_pairwise([r["vec_id"] for r in mmr])
    topk_div = avg_pairwise([r[0] for r in top[:MMR_K]])
    assert mmr_div < topk_div, (mmr_div, topk_div)


def test_ivf_probe_is_exact_within_probed_lists(spark, sf_dir):
    """q_sim_ann_ivf is rows-only; pin the probe machinery here: the
    ANN result must EQUAL the exact cosine top-k computed over the
    members of the probed inverted lists (approximation comes ONLY
    from restricting to nprobe lists, never from the scoring/ranking
    inside them), and every returned id must belong to a probed
    cluster."""
    import numpy as np

    from pyspark.sql import functions as F

    from spark_sklearn_spark.operators.ivf import ivf_build, ivf_probe
    from spark_sklearn_spark.sources.io import load

    emb = load(spark, sf_dir, "embeddings")
    assigned, centers = ivf_build(
        spark, emb, "vec_id", "embedding", cache_key=sf_dir, k=16
    )
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    q = np.asarray(qrow["embedding"], dtype="float64")
    q /= np.linalg.norm(q)
    got = ivf_probe(assigned, centers, qrow["embedding"], nprobe=4, topk=10).collect()

    probe = set(int(i) for i in np.argsort(-(centers @ q))[:4])
    members = assigned.filter(F.col("cluster").isin(list(probe))).collect()
    member_ids = {r["vid"] for r in members}
    assert all(r["vec_id"] in member_ids for r in got)
    # exact within-candidate ranking, same (cos desc, id) rule
    exact = sorted(
        (
            (round(float(np.dot(np.asarray(r["u"]), q)), 6), -r["vid"])
            for r in members
        ),
        reverse=True,
    )[:10]
    want = [(-vid_neg, cos) for cos, vid_neg in exact]
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (vid, cos) for vid, cos in want
    ]
