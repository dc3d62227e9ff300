"""MinHash + LSH near-duplicate detection — pure Column algebra.

The scale path for content dedup over a 100 TB corpus (the reference
only dedups by uniqueKey upsert, schema.xml:1030-1033; this is the
training-data-pipeline extension):

1. shingles: token n-grams per doc (`F.transform` over a sequence —
   JVM-side, no UDF);
2. MinHash signature: for each of k hash functions, min over shingles of
   ``xxhash64(shingle, seed_i)`` — `F.array_min(F.transform(...))`;
   P[minhash_i(A)=minhash_i(B)] = J(A,B), the classic estimator;
3. LSH banding: signature split into b bands of r rows; band key =
   ``xxhash64(band values…)``. Docs sharing any band key become
   candidate pairs — a groupBy/self-join on (band_idx, band_key), which
   at scale is a hash-partitioned shuffle of 16-byte keys, never of
   documents;
4. verification: exact token-set Jaccard via array_intersect/array_union
   on the candidates only.

Everything is deterministic (xxhash64 with fixed integer seeds), so
results are reproducible across runs/parallelism — and step 4's output
is exact w.r.t. the threshold: LSH only affects recall of candidate
generation, never precision of the verified pairs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexlt_spark.ops.textstats import tokens_col


def shingles_col(tokens, n: int = 3):
    """Token n-gram shingles of a tokens array Column (JVM transform).

    size < n → a single shingle of all tokens (short docs still compare).
    """
    joined_short = F.array(F.concat_ws(" ", tokens))
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    return F.when(F.size(tokens) >= n, grams).otherwise(joined_short)


def minhash_signature(
    docs: DataFrame,
    n_hashes: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, shingles, sig: array<long> of length n_hashes)."""
    toks = tokens_col() if text_col == "text" else F.split(F.lower(F.col(text_col)), r"\s+")
    # token-less docs are excluded BEFORE shingling (a doc with zero
    # tokens must not contribute an empty-string shingle); the tokenizer
    # is materialized behind a projection boundary BEFORE shingling —
    # referencing the regex expression inside the shingle transform's
    # lambda re-evaluates it per GRAM (no CSE across HOF lambda scopes)
    toked = docs.where(F.size(toks) > 0).select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    )
    sh = shingles_col(F.col("_toks"), shingle_n)
    def _seeded(i):
        # NB: a plain `lambda s, i=i:` would be read by pyspark as the
        # (element, index) two-arg form — the closure factory keeps arity 1
        return lambda s: F.xxhash64(s, F.lit(i))

    sig = F.array(
        *[F.array_min(F.transform(F.col("_shingles"), _seeded(i))) for i in range(n_hashes)]
    )
    return (
        toked.select("doc_id", sh.alias("_shingles"))
        .where(F.size("_shingles") > 0)
        .select("doc_id", F.col("_shingles").alias("shingles"), sig.alias("sig"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_bands: int = 4,
) -> DataFrame:
    """Distinct (doc_a, doc_b) pairs sharing ≥1 LSH band (doc_a < doc_b).

    One explode to (doc, band_idx, band_key) rows + one self-join keyed
    on the 8-byte band hash — the shuffle moves keys, not documents.
    """
    rows = signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("sig"),
                                b * (F.size("sig") / n_bands).cast("int") + 1,
                                (F.size("sig") / n_bands).cast("int"),
                            ),
                            lambda x: x.cast("string"),
                        ),
                    ),
                    b,
                ),
            )
        ).alias("band_idx", "band_key"),
    )
    a = rows.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band_key"
    )
    b = rows.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_col(sh_a, sh_b):
    """Exact Jaccard of two shingle-array Columns (JVM set ops)."""
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = F.size(F.array_union(sh_a, sh_b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def near_duplicate_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Verified near-dup pairs: (doc_a, doc_b, jaccard ≥ threshold).

    MinHash→LSH candidates → exact Jaccard verify. Output precision is
    exact; LSH bounds recall (a pair missed by every band is skipped —
    the standard S-curve trade; n_bands bands of n_hashes/n_bands rows
    each: recall at similarity J is 1-(1-J^r)^b).

    Persistence contract: the intermediate signatures DataFrame is
    persisted for the duration of the call (it feeds candidate generation
    and both sides of the verify join); the verified pairs are
    materialized eagerly and the signature cache is released before
    returning — callers never hold a hidden persisted handle.
    """
    sigs = minhash_signature(docs, n_hashes, shingle_n, id_col, text_col).persist()
    cands = lsh_candidate_pairs(sigs, n_bands)
    sh = sigs.select("doc_id", "shingles")
    pairs = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(jaccard_col(F.array_distinct("sh_a"), F.array_distinct("sh_b")), 6).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    # materialize the (small) verified-pair set, then release the big
    # signature cache — the returned handle is the only thing persisted,
    # and the caller owns it (may .unpersist() when done)
    pairs = pairs.persist()
    pairs.count()
    sigs.unpersist()
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: Optional[int] = None,
) -> DataFrame:
    """EXACT n-gram-Jaccard near-dup pairs (full recall, no hashing loss).

    Candidate generation is an inverted shingle index: explode distinct
    shingles to (xxhash64(shingle), doc_id) postings and self-join on the
    8-byte key — the shuffle carries hashes, never documents. Exact for
    any threshold > 0 because J(A,B) > 0 ⟺ the pair shares a shingle
    (a hash collision can only ADD a candidate; the exact-Jaccard verify
    removes it). Complement to the MinHash path: full recall at the cost
    of quadratic blowup on ultra-common shingles.

    max_shingle_df bounds that blowup (the 100-TB setting): shingles whose
    document frequency exceeds the cap are dropped from CANDIDATE
    GENERATION only (one extra groupBy over the 8-byte keys + a
    left_anti). The verify step stays exact, so precision is unchanged;
    recall is lost only for a pair whose EVERY shared shingle exceeds the
    cap — at J ≥ 0.9 a pair shares |A∩B| ≥ J/(1+J)·|A∪B| distinct
    shingles, so missing it requires documents made almost entirely of
    corpus-hot n-grams (boilerplate — which exact/fingerprint dedup
    catches first). Unbounded, one million-df 3-gram alone yields 10^12
    candidate pairs.
    """
    toks = tokens_col() if text_col == "text" else F.split(F.lower(F.col(text_col)), r"\s+")
    # tokenizer materialized behind a projection boundary before the
    # shingle transform (see minhash_signature — per-gram re-evaluation)
    base = (
        docs.where(F.size(toks) > 0)
        .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select(
            "doc_id",
            F.array_distinct(shingles_col(F.col("_toks"), shingle_n)).alias("shingles"),
        )
        .where(F.size("shingles") > 0)
    )
    posting = base.select(
        "doc_id", F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("shk")
    )
    if max_shingle_df is not None:
        hot = (
            posting.groupBy("shk")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("shk")
        )
        posting = posting.join(hot, "shk", "left_anti")
    a = posting.select(F.col("doc_id").alias("doc_a"), "shk")
    b = posting.select(F.col("doc_id").alias("doc_b"), "shk")
    cands = (
        a.join(b, "shk").where(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b").distinct()
    )
    sh = base.select("doc_id", "shingles")
    return (
        cands.join(
            sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a"
        )
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .select("doc_a", "doc_b", F.round(jaccard_col(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# SimHash: 64-bit tf-weighted fingerprint + banded Hamming near-dup
# --------------------------------------------------------------------------


# token-hash choices for SimHash: xxhash64 (default JVM fast path) and a
# 60-bit md5 prefix — bit-identical to DuckDB's
# cast(('0x'||substr(md5(tok),1,15)) as bigint), so the md5_60 variant is
# value-checkable against a pure-SQL oracle (parity asserted in tests)
SIMHASH_BITS = {"xxh64": 64, "md5_60": 60}


def _token_hash(t, hash: str):
    if hash == "md5_60":
        return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    return F.xxhash64(t)


def simhash_col(hashes, hash: str = "xxh64"):
    """SimHash over a PRE-MATERIALIZED token-hash array Column, as a long
    (64 bits for xxh64, 60 for md5_60).

    bit b of simhash = 1 iff Σ_tokens (2*((h(tok)>>b)&1) - 1) > 0.
    Pure JVM expression: one array-fold vote per bit. Ties (vote sum 0)
    resolve to 0, deterministically.

    ``hashes`` must be a cheap Column reference (an aliased column from a
    prior projection, as simhash_signatures does), NOT an inline
    transform over the tokenizer: each of the 60-64 per-bit folds
    references it, and Spark performs no CSE across HOF lambda scopes —
    an inline expression would re-tokenize and re-hash every token once
    per bit.
    """

    def _vote_merge(b):
        return lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)

    out = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS[hash]):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote_merge(b))
        out = out + F.when(
            vote > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return out


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", hash: str = "xxh64") -> DataFrame:
    """(doc_id, simhash) over the shared tokenizer's token stream."""
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokens_col(), lambda t: _token_hash(t, hash)).alias("_h"),
    )
    out = simhash_col(F.col("_h"), hash)
    return hashed.select("doc_id", out.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, n_bands: int = 4, hash: str = "xxh64"
) -> DataFrame:
    """(doc_a, doc_b, hamming ≤ max_hamming) via banded keys.

    Two signatures within Hamming distance d < n_bands must agree on at
    least one of n_bands disjoint bands (pigeonhole) — candidates from a
    band-key self-join, exact popcount(xor) verify.
    """
    width = SIMHASH_BITS[hash] // n_bands
    sig = simhash_signatures(docs, hash=hash)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "band_idx", "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
