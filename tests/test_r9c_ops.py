"""Unit tests for the round-9 third-wave operators: SQ8 scalar
quantization (codes + quantized ANN) and per-source boilerplate
removal.

The SQ8 parity test follows the array-HOF rule recorded in the verify
skill: every new HOF-based kernel is checked against a PURE-PYTHON
model (the DuckDB oracle check runs separately via driver_sim), so a
Spark HOF miscompilation cannot hide behind an oracle that happens to
share it.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from datapipeline_scraping_spark.operators.similarity import (
    sq8_codes,
    sq8_params,
    sq8_topk,
)
from datapipeline_scraping_spark.operators.text import boilerplate_strip

# ---------------------------------------------------------------------------
# SQ8 quantization
# ---------------------------------------------------------------------------


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _py_sq8(vecs):
    """Pure-Python model of sq8_params + sq8_codes (float32 ingest
    mirrored via struct-level float cast is unnecessary here: the test
    vectors are exactly representable)."""
    dim = len(vecs[0])
    mins = [min(v[d] for v in vecs) for d in range(dim)]
    maxs = [max(v[d] for v in vecs) for d in range(dim)]
    steps = [(maxs[d] - mins[d]) / 255.0 for d in range(dim)]

    def code(x, d):
        if steps[d] == 0.0:
            return 0
        return int(min(255.0, max(0.0, math.floor((x - mins[d]) / steps[d]))))

    return mins, steps, [[code(v[d], d) for d in range(dim)] for v in vecs]


def test_sq8_codes_match_pure_python(spark):
    vecs = [
        [0.0, 1.0, -2.0, 7.0],
        [1.0, 1.0, 3.0, -1.5],
        [0.25, 1.0, 0.5, 2.0],
        [-0.75, 1.0, 2.25, 0.125],
    ]
    emb = _emb(spark, vecs)
    params = sq8_params(emb, "embedding")
    got_params = params.collect()[0]
    mins, steps, codes = _py_sq8(vecs)
    assert got_params["mins"] == mins
    assert got_params["steps"] == steps
    got = {
        r["vec_id"]: r["codes"]
        for r in sq8_codes(emb, "vec_id", "embedding", params).collect()
    }
    assert got == {i: c for i, c in enumerate(codes)}
    # constant dimension (index 1) encodes to 0 everywhere
    assert all(c[1] == 0 for c in got.values())
    # corpus max encodes to 255 via the least() clamp
    assert got[0][3] == 255


@pytest.mark.slow  # >60s (r15 tiering; measured 75-163s)
def test_sq8_topk_exact_on_separable_corpus(spark):
    # three tight clusters along different axes: quantized candidate
    # generation must place same-cluster vectors first, and the exact
    # rerank must order them by true cosine.
    vecs = []
    for c in range(3):
        for j in range(4):
            v = [0.0, 0.0, 0.0]
            v[c] = 10.0 + j
            v[(c + 1) % 3] = 0.1 * j
            vecs.append(v)
    emb = _emb(spark, vecs)
    queries = emb.filter(F.col("vec_id").isin(0, 4, 8))
    out = sq8_topk(emb, queries, "vec_id", "embedding", k=3, candidates=6)
    rows = out.collect()
    assert len(rows) == 9
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, cluster in ((0, range(0, 4)), (4, range(4, 8)), (8, range(8, 12))):
        mine = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["rank"] for r in mine] == [1, 2, 3]
        # top-3 neighbors are the query's own cluster (exact cosine ~1)
        assert all(r["neighbor_id"] in cluster for r in mine)
        assert all(r["neighbor_id"] != qid for r in mine)
        assert all(r["cosine"] > 0.99 for r in mine)


@pytest.mark.slow  # >60s (r15 tiering; measured 75-163s)
def test_sq8_topk_matches_bruteforce_cosine_ranks(spark):
    # with candidates == corpus size the SQ8 path degenerates to the
    # exact brute force: final ranking must equal cosine_topk's.
    from datapipeline_scraping_spark.operators.similarity import cosine_topk

    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(30)]
    emb = _emb(spark, vecs)
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(emb, queries, k=4).collect()
    }
    sq8 = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sq8_topk(
            emb, queries, k=4, candidates=30
        ).collect()
    }
    assert sq8 == exact


# ---------------------------------------------------------------------------
# boilerplate removal
# ---------------------------------------------------------------------------


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_boilerplate_strip_drops_all_copies(spark):
    boiler = "cookie banner accept all"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} alpha beta gamma delta", "a"),
            (2, f"{boiler} epsilon zeta eta theta", "a"),
            (3, f"{boiler} iota kappa lambda mu", "a"),
            # same chunk in another source below threshold: kept
            (4, f"{boiler} nu xi omicron pi", "b"),
            (5, "rho sigma tau upsilon", "b"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_strip(
            docs, chunk_tokens=4, min_df=2, df_frac=0.05
        ).collect()
    }
    assert len(out) == 5
    # source a: the shared 4-token chunk is dropped from EVERY doc
    for d, tail in ((1, "alpha beta gamma delta"),
                    (2, "epsilon zeta eta theta"),
                    (3, "iota kappa lambda mu")):
        assert out[d]["n_chunks"] == 2 and out[d]["n_kept"] == 1
        assert out[d]["clean_hash"] == _md5(tail)
    # source b: df=1 < threshold, so doc 4 keeps the same chunk
    assert out[4]["n_kept"] == 2
    assert out[4]["clean_hash"] == _md5(f"{boiler} nu xi omicron pi")
    assert out[5]["n_kept"] == 1


def test_boilerplate_strip_all_boilerplate_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "nav bar home", "a"),
            (2, "nav bar home", "a"),
            (3, "nav bar home body text here", "a"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_strip(
            docs, chunk_tokens=3, min_df=2, df_frac=0.05
        ).collect()
    }
    # docs 1/2 are ONLY boilerplate: zero kept chunks, md5 of empty
    for d in (1, 2):
        assert out[d]["n_kept"] == 0
        assert out[d]["clean_hash"] == _md5("")
    assert out[3]["n_kept"] == 1
    assert out[3]["clean_hash"] == _md5("body text here")


def test_boilerplate_frac_threshold_scales_with_group_size(spark):
    # 40-doc source: ceil(0.05*40)=2, so df=2 still trips; raising
    # df_frac to 0.2 demands df>=8 and the pair survives.
    rows = [(i, f"unique{i} words here", "a") for i in range(38)]
    rows += [(100, "shared chunk pair", "a"), (101, "shared chunk pair", "a")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    strict = {
        r["doc_id"]: r["n_kept"]
        for r in boilerplate_strip(
            docs, chunk_tokens=3, min_df=2, df_frac=0.05
        ).collect()
    }
    assert strict[100] == 0 and strict[101] == 0
    lax = {
        r["doc_id"]: r["n_kept"]
        for r in boilerplate_strip(
            docs, chunk_tokens=3, min_df=8, df_frac=0.2
        ).collect()
    }
    assert lax[100] == 1 and lax[101] == 1


def test_ivf_sq8_topk_probes_own_cluster(spark):
    from datapipeline_scraping_spark.operators.similarity import ivf_sq8_topk

    # same separable corpus as the SQ8 test; centroids at ids 0/4/8 are
    # the cluster anchors, so nprobe=1 scans exactly the query's list
    vecs = []
    for c in range(3):
        for j in range(4):
            v = [0.0, 0.0, 0.0]
            v[c] = 10.0 + j
            v[(c + 1) % 3] = 0.1 * j
            vecs.append(v)
    emb = _emb(spark, vecs)
    queries = emb.filter(F.col("vec_id").isin(0, 4, 8))
    out = ivf_sq8_topk(
        emb, queries, k=3, nprobe=1, centroid_every=4, candidates=4
    ).collect()
    assert len(out) == 9
    for r in out:
        assert r["neighbor_id"] // 4 == r["query_id"] // 4  # own list only
        assert r["neighbor_id"] != r["query_id"]
        assert r["cosine"] > 0.99


@pytest.mark.slow  # >60s (r15 tiering; measured 75-163s)
def test_ivf_sq8_topk_degenerates_to_bruteforce(spark):
    from datapipeline_scraping_spark.operators.similarity import (
        cosine_topk,
        ivf_sq8_topk,
    )

    import random

    rng = random.Random(11)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(30)]
    emb = _emb(spark, vecs)
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(emb, queries, k=4).collect()
    }
    # every list probed + candidates == corpus => identical final ranks
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_sq8_topk(
            emb, queries, k=4, nprobe=30, centroid_every=1, candidates=30
        ).collect()
    }
    assert got == exact


def test_semantic_decontaminate_flags_exact_leaks(spark):
    from datapipeline_scraping_spark.operators.similarity import (
        semantic_decontaminate,
    )

    import random

    rng = random.Random(3)
    vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(40)]
    emb = _emb(spark, vecs)
    evalset = emb.filter(F.col("vec_id") < 4)
    # leak eval rows 0/1 into train under new ids; rows 2/3 stay clean
    leaked = evalset.filter(F.col("vec_id") < 2).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    train = emb.filter(F.col("vec_id") >= 4).unionByName(leaked)
    got = {
        r["train_id"]: (r["eval_id"], r["cosine"])
        for r in semantic_decontaminate(
            train, evalset, threshold=0.99
        ).collect()
    }
    # exactly the two leaks, each matched to its source at cosine 1.0
    assert got == {1000: (0, 1.0), 1001: (1, 1.0)}
