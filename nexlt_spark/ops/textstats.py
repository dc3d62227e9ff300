"""Text analysis ops for training-data pipelines: token counts, quality
scores, language-ID heuristic, rolling-hash fingerprints.

All pure Column algebra where possible; the documents-table analogs of
the reference's ingest-side projections (F10 length cap, F15 lowercase,
SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ASCII-regexp token expression — identical to the engine tokenizer
# (nexlt_spark.analysis) on ASCII corpora and to the DuckDB oracle form
# regexp_extract_all(lower(text), '[a-z0-9]+'). Pure JVM regexp, no UDF.
def tokens_col():
    return F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)


def token_count_col():
    return F.size(tokens_col())


def token_stats_by(docs: DataFrame, group_col: str) -> DataFrame:
    """(group, n_docs, total_tokens, avg_tokens) — corpus shape profile."""
    t = docs.withColumn("n_tokens", token_count_col())
    return (
        t.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy(group_col)
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features per doc: token count, mean token length,
    unique-token ratio — the standard cheap pre-filters before expensive
    model-based scoring."""
    toks = tokens_col()
    n = token_count_col()
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(F.length(F.trim(F.col("text"))).cast("double") / n),
            4,
        ).alias("avg_token_len"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(F.size(F.array_distinct(toks)).cast("double") / n),
            4,
        ).alias("unique_ratio"),
    )


def char_ngram_fingerprint(docs: DataFrame, n: int = 16) -> DataFrame:
    """Rolling fingerprint: md5 of the first/last n chars + length —
    order-free near-identity probe used for fast candidate blocking."""
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                "|", F.substring(t, 1, n), F.substring(t, -n, n), F.length(t).cast("string")
            )
        ).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# Language identification (stopword-overlap heuristic)
# --------------------------------------------------------------------------

# Minimal public stopword cores (top function words per language). A
# production pipeline swaps in bigger lists or a model; the operator's
# dataflow (array_intersect scoring, argmax with deterministic tiebreak)
# is what matters at 100 TB — one JVM-side pass, no UDF, no shuffle.
STOPWORDS = {
    "en": "the of and to in a is that it for on with as are this be at or".split(),
    "fr": "le la les de des du et en un une est que pour dans sur au avec ne pas".split(),
    "de": "der die das und in den von zu mit ist des im für auf nicht ein eine als".split(),
    "es": "el la los las de y en un una es que por para con del se no al como".split(),
}


def language_scores(docs: DataFrame, languages=None) -> DataFrame:
    """Per-doc stopword-hit counts per language: (doc_id, score_<lang>…)."""
    langs = languages or sorted(STOPWORDS)
    toks = F.array_distinct(tokens_col())
    cols = [
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
        ).alias(f"score_{lang}")
        for lang in langs
    ]
    return docs.select("doc_id", *cols)


def language_id(docs: DataFrame, languages=None, min_hits: int = 1) -> DataFrame:
    """(doc_id, lang_pred, hits): argmax language by stopword overlap,
    ties broken by language-code order, 'und' (undetermined) below
    min_hits — the greatest(..)/CASE form keeps it one codegen stage."""
    langs = languages or sorted(STOPWORDS)
    scored = language_scores(docs, langs)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties (reversed fold)
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best >= min_hits, pred).otherwise(F.lit("und"))
    return scored.select("doc_id", pred.alias("lang_pred"), best.alias("hits"))


# --------------------------------------------------------------------------
# Repetition signals (Gopher-style quality rules)
# --------------------------------------------------------------------------

def _gram_run_stats(grams_sorted):
    """Fold a SORTED array of gram strings into struct(bc, bm, dm):

    - ``bc``/``bm``: count and char mass (count x gram length) of the top
      gram — most frequent first, ties broken by larger mass (the same
      (cnt, mass) ordering the shuffle path's max_by uses);
    - ``dm``: total char mass of grams occurring more than once.

    Sorting groups equal grams into adjacent runs, so one linear
    F.aggregate pass computes all three — entirely row-local (a doc's
    grams never leave its row), the shape that makes the whole repetition
    operator a map-only job at 10^12 turns. Exact string comparison, no
    hashing: two distinct grams can never merge.
    """
    zero = F.struct(
        F.lit(None).cast("string").alias("pg"),
        F.lit(0).alias("run"),
        F.lit(0).alias("bc"),
        F.lit(0).cast("bigint").alias("bm"),
        F.lit(0).cast("bigint").alias("dm"),
    )

    def _finalize(acc):
        # close the run held in acc: fold it into best/dup accumulators
        mass = acc["run"].cast("bigint") * F.coalesce(
            F.length(acc["pg"]).cast("bigint"), F.lit(0)
        )
        better = (acc["run"] > acc["bc"]) | (
            (acc["run"] == acc["bc"]) & (mass > acc["bm"])
        )
        return (
            F.when(better, acc["run"]).otherwise(acc["bc"]),
            F.when(better, mass).otherwise(acc["bm"]),
            acc["dm"]
            + F.when(acc["run"] > 1, mass).otherwise(F.lit(0).cast("bigint")),
        )

    def step(acc, g):
        same = acc["pg"].isNotNull() & (g == acc["pg"])
        bc, bm, dm = _finalize(acc)
        return F.when(
            same,
            F.struct(
                acc["pg"].alias("pg"),
                (acc["run"] + 1).alias("run"),
                acc["bc"].alias("bc"),
                acc["bm"].alias("bm"),
                acc["dm"].alias("dm"),
            ),
        ).otherwise(
            F.struct(
                g.alias("pg"),
                F.lit(1).alias("run"),
                bc.alias("bc"),
                bm.alias("bm"),
                dm.alias("dm"),
            )
        )

    def finish(acc):
        bc, bm, dm = _finalize(acc)
        return F.struct(bc.alias("bc"), bm.alias("bm"), dm.alias("dm"))

    return F.aggregate(grams_sorted, zero, step, finish)


def repetition_scores(
    docs: DataFrame,
    top_ns: tuple = (2, 3),
    dup_ns: tuple = (5,),
    impl: str = "local",
) -> DataFrame:
    """Per-doc repetition signals, the Gopher report's "repetitious text"
    quality rules (Rae et al. 2021 §A1.1) — the standard pre-filter that
    catches keyword-stuffed / template-generated pages near-dup Jaccard
    and ``quality_scores`` both miss:

    - ``dup_line_frac``: fraction of the doc's lines that occur more than
      once within it; ``dup_line_char_frac``: fraction of the doc's line
      characters held in those repeated lines. (Gopher counts every
      occurrence of a repeated line, as here.)
    - ``top_{n}gram_char_frac`` for n in ``top_ns``: character mass of
      the single most frequent token n-gram (occurrences x gram length /
      text length, capped at 1.0) — high values mean one phrase dominates.
    - ``dup_{n}gram_char_frac`` for n in ``dup_ns``: character mass of
      ALL token n-grams occurring more than once.

    Scale shape (``impl="local"``, the default): every signal is
    row-local — a doc's lines and grams never leave its row, so the whole
    operator is a MAP-ONLY job (zero shuffle, zero joins) at any corpus
    size. Line signals are higher-order Column functions (the per-row
    count-of-equals scan is O(L^2) on L = lines per doc, tens not
    thousands); gram signals sort each doc's n-gram array and fold the
    adjacent runs in one linear F.aggregate pass (``_gram_run_stats`` —
    O(G log G) per doc on G = tokens per doc). Ties on the top gram
    resolve to the larger char mass (count x length), exactly as the
    shuffle path's (cnt, mass) max_by ordering.

    ``impl="shuffle"`` keeps the explode + groupBy(doc_id, n, gram)
    formulation (cross-row state per (doc, gram), map-side partial
    aggregation) as the independent reference implementation — the two
    are asserted identical in tests/test_quality_repetition.py.
    """
    # the lines array is materialized behind a projection boundary: the
    # count-of-equals scan references it inside a NESTED lambda, and an
    # inline split+filter expression would re-run per line comparison
    # (no CSE across HOF lambda scopes)
    lines_expr = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), "\n"),
        lambda x: F.length(x) > 0,
    )

    def _line_sig_cols():
        lines = F.col("_lines")
        n_lines = F.size(lines)
        line_counts = F.transform(
            lines, lambda x: F.size(F.filter(lines, lambda y: y == x))
        )
        dup_mask = F.transform(line_counts, lambda c: (c > 1).cast("int"))
        dup_lines = F.aggregate(dup_mask, F.lit(0), lambda a, x: a + x)
        line_chars = F.transform(lines, lambda x: F.length(x))
        total_line_chars = F.aggregate(line_chars, F.lit(0), lambda a, x: a + x)
        dup_line_chars = F.aggregate(
            F.zip_with(line_chars, dup_mask, lambda c, m: c * m),
            F.lit(0),
            lambda a, x: a + x,
        )
        return [
            F.round(
                F.when(n_lines == 0, F.lit(0.0)).otherwise(
                    dup_lines.cast("double") / n_lines
                ),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.when(total_line_chars == 0, F.lit(0.0)).otherwise(
                    dup_line_chars.cast("double") / total_line_chars
                ),
                6,
            ).alias("dup_line_char_frac"),
        ]

    all_ns = sorted(set(top_ns) | set(dup_ns))
    from nexlt_spark.ops.minhash import shingles_col

    if impl not in ("local", "shuffle"):
        # a typo'd impl must not silently fall through to the full
        # corpus-wide shuffle the caller opted out of
        raise ValueError(f"impl must be 'local' or 'shuffle', got {impl!r}")
    if impl == "local":
        # map-only: three chained narrow projections, one stage, no
        # exchange anywhere in the plan
        toks = F.col("_toks")
        base = docs.select(
            "doc_id",
            F.length(F.coalesce(F.col("text"), F.lit(""))).alias("text_len"),
            lines_expr.alias("_lines"),
            tokens_col().alias("_toks"),
        )
        statted = base.select(
            "doc_id",
            "text_len",
            *_line_sig_cols(),
            *[
                _gram_run_stats(
                    F.array_sort(
                        # a doc shorter than n tokens has NO n-grams (no
                        # whole-doc shingle fallback — whole-doc repetition
                        # is the line signal's job)
                        F.when(F.size(toks) >= n, shingles_col(toks, n)).otherwise(
                            F.array().cast("array<string>")
                        )
                    )
                ).alias(f"_st_{n}")
                for n in all_ns
            ],
        )
        frac = lambda c: F.when(F.col("text_len") == 0, F.lit(0.0)).otherwise(
            F.round(F.least(c.cast("double") / F.col("text_len"), F.lit(1.0)), 6)
        )
        return statted.select(
            "doc_id",
            "dup_line_frac",
            "dup_line_char_frac",
            *[
                frac(F.col(f"_st_{n}")["bm"]).alias(f"top_{n}gram_char_frac")
                for n in top_ns
            ],
            *[
                frac(F.col(f"_st_{n}")["dm"]).alias(f"dup_{n}gram_char_frac")
                for n in dup_ns
            ],
        )

    lined = docs.select("doc_id", lines_expr.alias("_lines"))
    line_sig = lined.select("doc_id", *_line_sig_cols())

    def _tag(n):
        # NB: must be a UNARY lambda built in a factory — `lambda g, n=n:`
        # would be introspected by pyspark as the (value, index) binary
        # transform form, silently binding n to the array INDEX
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    # tokenize ONCE behind a projection boundary: referencing tokens_col()
    # directly inside the shingle transform's lambda re-evaluates the
    # tokenizing regex per GRAM (no common-subexpression elimination
    # across HOF lambda scopes — measured 10x slower at sf0.1)
    toked = docs.select(
        "doc_id", F.length("text").alias("text_len"), tokens_col().alias("_toks")
    )
    toks = F.col("_toks")
    gram_arrays = F.array(
        *[
            F.transform(
                # unlike the shingle form, a doc shorter than n tokens has
                # NO n-grams (no whole-doc fallback — repetition of the
                # whole doc is the line signal's job)
                F.when(F.size(toks) >= n, shingles_col(toks, n)).otherwise(
                    F.array().cast("array<string>")
                ),
                _tag(n),
            )
            for n in all_ns
        ]
    )
    grams = toked.select(
        "doc_id",
        "text_len",
        F.explode(F.flatten(gram_arrays)).alias("g"),
    ).select("doc_id", "text_len", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    per_gram = grams.groupBy("doc_id", "text_len", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mass = F.col("cnt") * F.length("gram")
    # one groupBy on doc_id ALONE, so its hash partitioning satisfies
    # the doc_id join below (no re-exchange of this side; text_len is
    # functionally dependent, carried with first()). Top gram = the
    # MOST FREQUENT n-gram (the Gopher statistic), ties on count
    # resolved to the larger char mass via a (cnt, mass) ordering
    # struct — not max(mass), which would let a rarer-but-longer gram
    # win over the most frequent one.
    raw = per_gram.groupBy("doc_id").agg(
        F.first("text_len").alias("_tl"),
        *[
            F.max_by(
                mass, F.when(F.col("n") == n, F.struct(F.col("cnt"), mass.alias("m")))
            ).alias(f"_top_{n}")
            for n in top_ns
        ],
        *[
            F.sum(
                F.when((F.col("n") == n) & (F.col("cnt") > 1), mass).otherwise(F.lit(0))
            ).alias(f"_dup_{n}")
            for n in dup_ns
        ],
    )
    frac = lambda c: F.round(
        F.least(F.coalesce(c, F.lit(0)).cast("double") / F.col("_tl"), F.lit(1.0)), 6
    )
    wide = raw.select(
        "doc_id",
        *[frac(F.col(f"_top_{n}")).alias(f"top_{n}gram_char_frac") for n in top_ns],
        *[frac(F.col(f"_dup_{n}")).alias(f"dup_{n}gram_char_frac") for n in dup_ns],
    )
    out = line_sig.join(wide, "doc_id", "left")
    fills = {f"top_{n}gram_char_frac": 0.0 for n in top_ns}
    fills.update({f"dup_{n}gram_char_frac": 0.0 for n in dup_ns})
    return out.fillna(fills)
