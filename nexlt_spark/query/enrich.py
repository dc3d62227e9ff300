"""Query-surface enrichments: synonym expansion (Q6) and highlighting (Q9).

Synonyms — the reference enables SynonymFilterFactory(expand=true) on
every query-side analyzer chain (schema.xml:210,245,297; synonyms.txt is
the 12-line stock demo file). Expansion happens at query time only: a
query term becomes the OR of its equivalence class; index-side terms are
untouched. We reproduce exactly that: parse the Solr synonyms.txt format,
expand the analyzed query terms, and score the union in OR mode (each
expanded term keeps its own idf — the Lucene 4 boolean-expansion
behavior, not the later SynonymQuery blending).

Highlighting — the reference's /select configures the regex fragmenter
with fragsize 100 and <em> wrappers (solrconfig.xml:1144-1244). Here:
pure Column ops over the ALREADY-SELECTED top-k rows (never the corpus):
first matching term position → ±fragsize/2 window → wrap every term
occurrence. The k-row DataFrame makes per-row cost irrelevant at any
corpus scale.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexlt_spark.analysis import tokenize


def parse_synonyms(lines: Iterable[str], analyzer: str = "standard") -> Dict[str, List[str]]:
    """Parse Solr synonyms.txt lines into term -> expansion-list.

    Supports both formats (the stock file uses each once):
      ``a, b, c``      equivalence class — each member expands to all
      ``a, b => x, y`` explicit mapping — each LHS expands to the RHS
    Terms are run through the shared analyzer so lookup keys match the
    indexed token forms.
    """
    out: Dict[str, List[str]] = {}

    def norm(s: str) -> List[str]:
        return tokenize(s.strip(), analyzer)

    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line:
            # explicit mapping: the LHS token is REPLACED by the RHS
            # (SynonymFilterFactory semantics — the LHS itself does not
            # survive expansion unless it also appears on the RHS or in
            # an equivalence-class line)
            lhs, rhs = line.split("=>", 1)
            targets = [t for part in rhs.split(",") for t in norm(part)]
            for part in lhs.split(","):
                for t in norm(part):
                    out.setdefault(t, [])
                    out[t] = sorted(set(out[t]) | set(targets))
        else:
            members = [t for part in line.split(",") for t in norm(part)]
            for t in members:
                out.setdefault(t, [])
                out[t] = sorted(set(out[t]) | set(members))
    return out


def expand_synonyms(terms: Sequence[str], mapping: Dict[str, List[str]]) -> List[str]:
    """Expand analyzed query terms through the synonym map (expand=true:
    an equivalence-class member contributes its whole class — which
    includes itself; an explicit '=>' LHS is replaced by its RHS only;
    unmapped terms pass through). Deduplicated, sorted — deterministic
    OR-union."""
    out = set()
    for t in terms:
        exp = mapping.get(t)
        out.update(exp if exp else [t])
    return sorted(out)


def highlight(
    topk: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    fragsize: int = 100,
    pre: str = "<em>",
    post: str = "</em>",
    out_col: str = "snippet",
) -> DataFrame:
    """Add a highlighted fragment column to a top-k result DataFrame.

    Fragment = fragsize chars centred on the first term occurrence
    (case-insensitive word-boundary match, the regex fragmenter analog);
    docs with no occurrence (e.g. matched via a synonym not passed here)
    get the text head. All Column ops — applied to k rows, not the corpus.
    """
    if not terms:
        return topk.withColumn(out_col, F.substring(F.col(text_col), 1, fragsize))
    alt = "|".join(sorted({re.escape(t) for t in terms}))
    find_re = f"(?i)\\b({alt})\\b"
    # first match position on the raw text (regexp_instr: 0 = no match)
    pos = F.coalesce(
        F.nullif(F.regexp_instr(F.col(text_col), F.lit(find_re)), F.lit(0)), F.lit(1)
    )
    start = F.greatest(F.lit(1), pos - F.lit(fragsize // 2))
    frag = F.substring(F.col(text_col), start, fragsize)
    wrapped = F.regexp_replace(frag, find_re, pre + "$1" + post)
    return topk.withColumn(out_col, wrapped)
