"""Text analysis chain — the single tokenizer shared by engine and oracle.

Models the reference's ``text_general`` analyzer
(solr/NeXLT/solr/collection1/conf/schema.xml:198-213): StandardTokenizer +
LowerCaseFilter, with the StopFilter commented out in the reference (and
stopwords.txt empty), so: **no stopwords**. We normalize NFKC first so
width/compatibility variants compare equal (the CJKWidthFilter analog used
by the reference's CJK chains, schema.xml:501-510).

Rank-identity (BASELINE.json north_rule) requires the Spark path and the
pure-Python oracle to tokenize bit-for-bit identically, so both import
:func:`tokenize` / the same compiled regex. The pandas_udf variant uses
vectorized ``pd.Series.str`` ops only (input_hint: no per-row Python).

Token = maximal run of Unicode letters/digits (underscore excluded), on the
NFKC-normalized, lowercased text. On ASCII inputs this is exactly
``regexp_extract_all(lower(text), '[a-z0-9]+')`` — the DuckDB oracle SQL
used by the driver's correctness gate.
"""

import re
import unicodedata
from typing import List, Optional

from nexlt_spark.stemmer import porter_stem

# Pluggable analyzer chains (SURVEY.md §1.5). "standard" models the
# reference's text_general (StandardTokenizer+LowerCase, no stopwords —
# schema.xml:198-213); "en_porter" models text_en_splitting's stemming
# step (PorterStemFilter at index AND query time, schema.xml:293,303).
# The value is the per-token post-map applied after tokenization.
ANALYZERS = {"standard": None, "en_porter": porter_stem}

# [^\W_] == word char minus underscore == Unicode letter or digit.
TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# The same tokenizer expressed as an ANSI-SQL expression for the DuckDB
# oracle (valid because the driver's testdata text is ASCII).
SQL_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z0-9]+')"


def normalize(text: str) -> str:
    """NFKC-normalize + lowercase (order: normalize first, then lower)."""
    return unicodedata.normalize("NFKC", text).lower()


def tokenize(text: Optional[str], analyzer: str = "standard") -> List[str]:
    """Pure-Python tokenizer — the oracle-side ground truth."""
    if text is None:
        return []
    toks = TOKEN_RE.findall(normalize(text))
    stem = ANALYZERS[analyzer]
    if stem is not None:
        toks = [stem(t) for t in toks]
    return toks


def _lazy_spark(analyzer: str):
    from pyspark.sql import types as T

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    stem = ANALYZERS[analyzer]

    @pandas_udf(T.ArrayType(T.StringType()))
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        # Vectorized pandas string ops — identical semantics to tokenize():
        # str.normalize("NFKC") + str.lower() + str.findall(TOKEN_RE).
        filled = texts.fillna("")
        found = filled.str.normalize("NFKC").str.lower().str.findall(TOKEN_RE)
        if stem is None:
            return found
        # vocab-level stemming: each distinct token is stemmed ONCE per
        # Arrow batch (Zipf: vocab << token count), then mapped back
        from itertools import chain

        table = {t: stem(t) for t in set(chain.from_iterable(found))}
        return found.map(lambda ts: [table[t] for t in ts])

    return tokenize_udf


_TOKENIZE_UDFS = {}


def tokenize_udf_col(col, analyzer: str = "standard"):
    """Apply the tokenizer pandas_udf to a Column → ArrayType(StringType).

    Lazy so that oracle.py can import this module without a Spark runtime.
    """
    if analyzer not in _TOKENIZE_UDFS:
        _TOKENIZE_UDFS[analyzer] = _lazy_spark(analyzer)
    return _TOKENIZE_UDFS[analyzer](col)
