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

# [^\W_] == word char minus underscore == Unicode letter or digit.
TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# The same tokenizer expressed as an ANSI-SQL expression for the DuckDB
# oracle (valid because the driver's testdata text is ASCII).
SQL_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z0-9]+')"


def normalize(text: str) -> str:
    """NFKC-normalize + lowercase (order: normalize first, then lower)."""
    return unicodedata.normalize("NFKC", text).lower()


def tokenize(text: Optional[str]) -> List[str]:
    """Pure-Python tokenizer — the oracle-side ground truth."""
    if text is None:
        return []
    return TOKEN_RE.findall(normalize(text))


def _lazy_spark():
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql import types as T

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.StringType()))
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        # Vectorized pandas string ops — identical semantics to tokenize():
        # str.normalize("NFKC") + str.lower() + str.findall(TOKEN_RE).
        filled = texts.fillna("")
        return filled.str.normalize("NFKC").str.lower().str.findall(TOKEN_RE)

    return tokenize_udf


_TOKENIZE_UDF = None


def tokenize_udf_col(col):
    """Apply the tokenizer pandas_udf to a Column → ArrayType(StringType).

    Lazy so that oracle.py can import this module without a Spark runtime.
    """
    global _TOKENIZE_UDF
    if _TOKENIZE_UDF is None:
        _TOKENIZE_UDF = _lazy_spark()
    return _TOKENIZE_UDF(col)
