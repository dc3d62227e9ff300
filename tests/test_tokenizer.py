"""Tokenizer: oracle function ≡ pandas_udf, on nasty unicode (SURVEY.md §5.2 #3)."""

import random
import string

from pyspark.sql import functions as F

from nexlt_spark.analysis import tokenize, tokenize_udf_col


CASES = [
    None,
    "",
    "   ",
    "Hello, World!",
    "CamelCaseWord under_score hyphen-ated",
    "Café Über naïve ﬁnal ＦＵＬＬＷＩＤＴＨ",  # NFKC: ﬁ→fi, fullwidth→ascii
    "日本語のテキスト 中文 text mixed 123",
    "tabs\tand\nnewlines\r\nmixed",
    "punct!!! ... (parens) [brackets] {braces} 'quotes' \"dq\"",
    "numbers 123 45.67 1e9 0xff",
    "emoji 🎉 mixed ☂ text",
    "a" * 6000,
]


def _rand_text(rng):
    alphabet = string.ascii_letters + string.digits + " .,;!?\t\n-_ÄöüßéçЯб語ヨ한"
    return "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200)))


def test_udf_matches_pure_python(spark):
    rng = random.Random(42)
    texts = CASES + [_rand_text(rng) for _ in range(200)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["toks"]
        for r in df.select(tokenize_udf_col(F.col("text")).alias("toks")).collect()
    ]
    want = [tokenize(t) for t in texts]
    assert got == want


def test_tokenizer_properties():
    assert tokenize(None) == []
    assert tokenize("") == []
    assert tokenize("The QUICK brown_fox") == ["the", "quick", "brown", "fox"]
    # no stopwords removed (reference's stopwords.txt is empty)
    assert "the" in tokenize("the a of")
    # NFKC folding
    assert tokenize("ﬁne") == ["fine"]
    assert tokenize("ＡＢＣ") == ["abc"]
