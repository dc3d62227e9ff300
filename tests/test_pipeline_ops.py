"""Training-data pipeline ops: MinHash/LSH, SimHash, language-ID,
embedding near-dup, multimodal plumbing — verified against brute-force
oracles computed driver-side.
"""

import hashlib
import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from nexlt_spark.ops import dedup, minhash, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def corpus(spark):
    """Docs with planted exact dups, near-dups, and distinct content."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("delta", "xdelta")),  # near-dup of 0
        (3, "completely different words about spark query engines here"),
        (4, "the quick brown fox jumps over the lazy dog again and again"),
        (5, "the quick brown fox jumps over the lazy cat again and again"),  # near-dup of 4
        (6, "unrelated singleton text with unique vocabulary tokens"),
        (7, base + " extra tail words appended here"),  # moderate overlap w/ 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def _shingles(text, n=3):
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a, b):
    return len(a & b) / len(a | b) if a | b else 0.0


def test_minhash_exact_dups_always_found(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash.near_duplicate_pairs(corpus, threshold=0.99).collect()
    }
    assert (0, 1) in pairs  # identical signatures share every band


def test_minhash_verified_jaccard_is_exact(corpus):
    got = minhash.near_duplicate_pairs(corpus, threshold=0.5).collect()
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for r in got:
        expected = _jaccard(_shingles(texts[r["doc_a"]]), _shingles(texts[r["doc_b"]]))
        assert r["jaccard"] == pytest.approx(round(expected, 6), abs=1e-9)
        assert r["jaccard"] >= 0.5


def test_minhash_finds_planted_near_dups(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash.near_duplicate_pairs(
            corpus, threshold=0.5, n_hashes=16, n_bands=16
        ).collect()
    }
    # one-token change, J=7/13 on 3-shingles; r=1 bands -> recall
    # 1-(1-J)^16 ≈ 0.9999 over the fixed deterministic hash family
    assert (4, 5) in pairs


def test_ngram_jaccard_pairs_equal_bruteforce(corpus):
    """The exact inverted-shingle-index path ≡ exhaustive all-pairs scan
    (full recall — unlike MinHash there is no probabilistic candidate loss)."""
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for threshold in (0.3, 0.5, 0.9):
        want = {}
        for a, b in itertools.combinations(sorted(texts), 2):
            j = round(_jaccard(_shingles(texts[a]), _shingles(texts[b])), 6)
            if j >= threshold:
                want[(a, b)] = j
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in minhash.ngram_jaccard_pairs(corpus, threshold=threshold).collect()
        }
        assert got.keys() == want.keys(), threshold
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_simhash_identical_texts_equal(corpus):
    sigs = {r["doc_id"]: r["simhash"] for r in minhash.simhash_signatures(corpus).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]


def test_simhash_banded_equals_bruteforce(corpus):
    """Pigeonhole: with 4 bands every pair at hamming ≤ 3 must surface;
    verify the banded join is exactly the brute-force result."""
    sigs = {r["doc_id"]: r["simhash"] for r in minhash.simhash_signatures(corpus).collect()}
    brute = {
        (a, b, bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1"))
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in minhash.simhash_near_pairs(corpus, max_hamming=3, n_bands=4).collect()
    }
    assert got == brute


def test_simhash_md5_60_duckdb_parity(corpus):
    """The md5_60 token hash and the full signature are bit-identical to
    the DuckDB SQL the oracle uses (('0x'||substr(md5,1,15))::bigint +
    per-bit majority vote) — the contract behind dedup_simhash_pairs
    being value-checked rather than rows-only."""
    import duckdb

    rows = corpus.select("doc_id", "text").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ",".join(["(?, ?)"] * len(rows)) + ") t(doc_id, text)",
                [x for r in rows for x in (r["doc_id"], r["text"])])
    want = dict(
        con.execute(
            "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
            " '[a-z0-9]+')) AS tok FROM documents),"
            " h AS (SELECT doc_id, CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) AS hv FROM toks),"
            " votes AS (SELECT doc_id, b, SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v"
            "   FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) GROUP BY doc_id, b),"
            " sig0 AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)"
            "   AS BIGINT) AS simhash FROM votes GROUP BY doc_id)"
            " SELECT d.doc_id, COALESCE(s.simhash, 0) FROM documents d"
            " LEFT JOIN sig0 s ON d.doc_id = s.doc_id"
        ).fetchall()
    )
    got = {
        r["doc_id"]: r["simhash"]
        for r in minhash.simhash_signatures(corpus, hash="md5_60").collect()
    }
    assert got == want


def test_simhash_md5_60_banded_equals_bruteforce(corpus):
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in minhash.simhash_signatures(corpus, hash="md5_60").collect()
    }
    brute = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in minhash.simhash_near_pairs(
            corpus, max_hamming=3, n_bands=4, hash="md5_60"
        ).collect()
    }
    assert got == brute


def test_language_id(spark):
    rows = [
        (0, "the cat is on the mat and it is happy with this"),
        (1, "le chat est dans la maison avec le chien et les oiseaux"),
        (2, "der hund ist in dem haus mit der katze und den kindern"),
        (3, "qqq www zzz xxy"),  # no stopwords at all
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in textstats.language_id(docs).collect()}
    assert got == {0: "en", 1: "fr", 2: "de", 3: "und"}


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype(np.float64)
    vecs[1] = vecs[0] + 0.01 * rng.randn(8)  # near-dup of 0
    vecs[5] = vecs[4] * 2.0  # exact cosine-dup of 4 (scaled)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        vecs,
    )


def test_embedding_near_dup_exact_vs_numpy(vectors):
    df, vecs = vectors
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = norm @ norm.T
    want = {
        (a, b)
        for a, b in itertools.combinations(range(len(vecs)), 2)
        if round(cos[a, b], 6) >= 0.95
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(df, dim=8, threshold=0.95).collect()
    }
    assert got == want
    assert (0, 1) in got and (4, 5) in got


def test_embedding_near_dup_lsh_is_subset_with_exact_precision(vectors):
    df, vecs = vectors
    rng = np.random.RandomState(11)
    planes = [[float(x) for x in rng.randn(8)] for _ in range(4)]
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.embedding_near_dup_pairs(df, dim=8, threshold=0.95).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.embedding_near_dup_pairs(
            df, dim=8, threshold=0.95, planes=planes
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # near-identical vectors land in the same bucket for any plane set
    assert (0, 1) in lsh


def test_cosine_topk_matches_numpy(vectors):
    df, vecs = vectors
    q = vecs[0]
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = norm @ qn
    want = sorted(range(len(vecs)), key=lambda i: (-round(cos[i], 9), i))[:5]
    got = [r["vec_id"] for r in similarity.cosine_topk(df, [float(x) for x in q], k=5).collect()]
    assert got == want


def test_ivf_full_probe_equals_brute_force(vectors):
    """nprobe == n_cells ⇒ IVF scans everything ⇒ ≡ exact cosine_topk
    (the contract-checked configuration, mirroring the minhash-banded
    full-recall entry pattern)."""
    df, vecs = vectors
    cents = similarity.train_ivf_centroids(df, n_cells=4, dim=8, iters=5)
    assigned = similarity.ivf_assign(df, cents).persist()
    q = [float(x) for x in vecs[3]]
    got = [
        (r["vec_id"], round(r["cos"], 9))
        for r in similarity.ivf_cosine_topk(assigned, q, cents, nprobe=4, k=7).collect()
    ]
    want = [
        (r["vec_id"], round(r["cos"], 9))
        for r in similarity.cosine_topk(df, q, k=7).collect()
    ]
    assert got == want


def test_ivf_centroids_deterministic_and_unit(vectors):
    df, _ = vectors
    a = similarity.train_ivf_centroids(df, n_cells=3, dim=8, iters=4)
    b = similarity.train_ivf_centroids(df, n_cells=3, dim=8, iters=4)
    assert a == b
    for c in a:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9


def test_ivf_planted_clusters_recall_at_nprobe_1(spark):
    """Three well-separated planted clusters: a query at a cluster center
    with nprobe=1 must retrieve only (and all of) that cluster's top-k —
    the scale path's recall argument on data where cells are real."""
    rng = np.random.RandomState(5)
    centers = np.stack([np.eye(12)[0], np.eye(12)[5], np.eye(12)[9]])
    rows = []
    for i in range(60):
        c = i % 3
        v = centers[c] + 0.05 * rng.randn(12)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.train_ivf_centroids(df, n_cells=3, dim=12, iters=8)
    assigned = similarity.ivf_assign(df, cents).persist()
    q = [float(x) for x in centers[1]]
    got = {r["vec_id"] for r in similarity.ivf_cosine_topk(assigned, q, cents, nprobe=1, k=10).collect()}
    exact = {r["vec_id"] for r in similarity.cosine_topk(df, q, k=10).collect()}
    assert got == exact  # full recall: the probed cell IS the cluster
    assert all(i % 3 == 1 for i in got)


def test_ivf_store_pruned_probe_recall(spark, tmp_path):
    """On-disk IVF store (partitionBy("cell") + centroid sidecar): an
    nprobe=1 probe over the store (a) returns the exact planted-cluster
    top-k and (b) carries the probed cells as PartitionFilters — the
    unprobed cell directories are pruned at planning time, never
    scanned."""
    rng = np.random.RandomState(7)
    centers = np.stack([np.eye(12)[0], np.eye(12)[5], np.eye(12)[9]])
    rows = []
    for i in range(60):
        v = centers[i % 3] + 0.05 * rng.randn(12)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.train_ivf_centroids(df, n_cells=3, dim=12, iters=8)
    path = str(tmp_path / "ivf_store")
    similarity.write_ivf_store(similarity.ivf_assign(df, cents), cents, path)

    assert similarity.read_ivf_centroids(path) == cents  # sidecar round-trips

    q = [float(x) for x in centers[2]]
    res = similarity.ivf_store_topk(spark, path, q, nprobe=1, k=10)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters:")[1][:200]

    got = {r["vec_id"] for r in res.collect()}
    exact = {r["vec_id"] for r in similarity.cosine_topk(df, q, k=10).collect()}
    assert got == exact
    assert all(i % 3 == 2 for i in got)


def test_ivf_train_default_sample_is_bounded(vectors):
    """sample_every=None derives a bounded driver sample from the table
    size (never a corpus collect) and still trains usable unit centroids;
    a tiny target_sample forces sample_every > 1 on even this small
    table, exercising the derivation arithmetic."""
    df, _ = vectors
    cents = similarity.train_ivf_centroids(
        df, n_cells=2, dim=8, iters=3, target_sample=8
    )
    assert len(cents) == 2
    for c in cents:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9
    # max_sample hard-caps the driver set regardless of sample_every
    capped = similarity.train_ivf_centroids(
        df, n_cells=2, dim=8, iters=3, sample_every=1, max_sample=10
    )
    assert len(capped) == 2


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_multimodal_decode_deterministic(spark):
    media = multimodal.synth_media(spark, n=24).persist()
    feats = multimodal.decode_media(media).collect()
    assert len(feats) == 24
    by_id = {r["media_id"]: r for r in feats}
    # feature is a pure function of payload bytes — recompute driver-side
    for r in media.collect():
        f = multimodal.fake_feature(bytes(r["payload"]))
        assert list(by_id[r["media_id"]]["feature"]) == pytest.approx(list(f))
        assert by_id[r["media_id"]]["n_bytes"] == len(bytes(r["payload"]))


def test_multimodal_real_decode_is_marked_stub(spark):
    media = multimodal.synth_media(spark, n=4)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        multimodal.decode_media(media, fake=False).collect()


def test_multimodal_metadata_profile_prunes_payload(spark, tmp_path):
    media = multimodal.synth_media(spark, n=24)
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    on_disk = spark.read.parquet(p)
    prof = multimodal.metadata_profile(on_disk)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # column pruning: binary never read
    assert {r["kind"] for r in prof.collect()} == {"image", "audio", "video"}


def test_frame_sample_plan(spark):
    media = multimodal.synth_media(spark, n=12)
    plan = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    vids = {r["media_id"] for r in media.where(F.col("kind") == "video").collect()}
    assert {r["media_id"] for r in plan} == vids
    durs = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect() if r["media_id"] in vids}
    from collections import Counter

    per = Counter(r["media_id"] for r in plan)
    for mid, n in per.items():
        assert n == max(1, durs[mid] // 1000)


def test_exact_dedup_keeps_min_doc_id(corpus):
    kept = {r["doc_id"] for r in dedup.dedup_exact(corpus).collect()}
    assert 0 in kept and 1 not in kept
    assert kept == {0, 2, 3, 4, 5, 6, 7}


# ---------------------------------------------------------------------------
# scale paths: shingle-df cap, banded minhash, projection near-dup join
# ---------------------------------------------------------------------------


def test_ngram_jaccard_df_cap_preserves_high_j_pairs(corpus):
    """With the hot-shingle cap engaged, J>=0.9 pairs still surface (they
    share many rare shingles); precision stays exact."""
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash.ngram_jaccard_pairs(corpus, threshold=0.9).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash.ngram_jaccard_pairs(corpus, threshold=0.9, max_shingle_df=3).collect()
    }
    assert capped == full


def test_ngram_jaccard_df_cap_bounds_candidates(spark):
    """A corpus that is ONE ubiquitous shingle repeated: the cap drops it
    from candidate generation entirely (no quadratic pair set)."""
    rows = [(i, f"common shared boilerplate unique{i} tail{i} end{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash.ngram_jaccard_pairs(docs, threshold=0.1, max_shingle_df=5)
    # the only shared shingle ('common shared boilerplate') has df=20 > 5:
    # no candidates at all; without the cap there are 190 candidate pairs
    assert out.count() == 0
    uncapped = minhash.ngram_jaccard_pairs(docs, threshold=0.1)
    assert uncapped.count() > 0


def test_banded_minhash_finds_planted_near_dups(corpus):
    """b=4/r=4 scale banding: J>=0.9 planted pairs collide in >=1 band
    here (recall 1-(1-J^4)^4 >= 0.986/pair); precision exact as always."""
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash.near_duplicate_pairs(
            corpus, threshold=0.9, n_hashes=16, n_bands=4
        ).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash.ngram_jaccard_pairs(corpus, threshold=0.9).collect()
    }
    assert got == want and (0, 1) in got


@pytest.fixture(scope="module")
def vec_table(spark):
    rng = np.random.RandomState(7)
    base = rng.standard_normal((40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # planted near-dups: slightly perturbed copies of vectors 0..4
    for j in range(5):
        v = base[j] + 0.05 * rng.standard_normal(16)
        rows.append((100 + j, [float(x) for x in v / np.linalg.norm(v)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()


@pytest.mark.parametrize("threshold", [0.45, 0.9, 0.99])
def test_projection_near_dup_equals_all_pairs(vec_table, threshold):
    """The projection-bucketed join is EXACT at any threshold: identical
    pair set and cosines to the brute-force cross join."""
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.embedding_near_dup_pairs(
            vec_table, dim=16, threshold=threshold
        ).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.projection_near_dup_pairs(
            vec_table, dim=16, threshold=threshold
        ).collect()
    }
    assert bucketed == exact
    if threshold == 0.9:
        assert len(exact) >= 5  # the planted perturbed copies qualify


def test_projection_near_dup_plan_has_no_cartesian(vec_table):
    out = similarity.projection_near_dup_pairs(vec_table, dim=16, threshold=0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
