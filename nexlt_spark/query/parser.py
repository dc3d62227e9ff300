"""Raw query-string parser → Query dataclass.

Both legacy reference surfaces pass raw Lucene syntax strings:
CGI/parallel.cgi:135-157 forwards a free-form ``q`` (advertising fields
to users), and CGI/corpus.cgi:326-339 assembles ``enu:x AND deu:y``
conjunctions. This module parses that surface — the subset the reference
actually uses plus the standard operators — into the engine's flat
:class:`~nexlt_spark.query.model.Query`:

- bare terms                 ``spark join``            (default field)
- field-prefixed terms       ``text:spark role:user``
- quoted phrases             ``"big table"``/``text:"big table"``
- boolean operators          ``AND`` / ``OR`` / ``NOT`` (and ``-term``)
- same-field disjunction     ``role:(user OR assistant)``
  (the ajax-solr product:("A" OR "B") shape, solrTestLib_v2.js:58-72)
- ranges                     ``ts:[2024-01-01 TO 2024-02-01]``,
  open ends with ``*``; ``field:[* TO *]`` = existence (corpus.cgi:330)
- match-all                  ``*:*``
- query-time boosts          ``term^2.5`` / ``"a b"^2`` (Lucene boost;
  scales the clause's BM25 contribution — Query.boosts)
- phrase slop                ``"a b"~2`` (ordered window —
  Query.phrase_slop; see model.py for the Lucene-divergence note)
- fuzzy ``term~N`` is refused loudly (unsupported), never silently
  treated as a literal
- ``maxBooleanClauses`` cap  (solrconfig.xml:500)

The flat Query model is deliberate (SURVEY.md §3): every reference query
reduces to scored terms/phrase + conjunctive filters. Mixed AND/OR
between *scored* clauses (which would need a boolean tree) raises
rather than silently mis-ranking.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from nexlt_spark.query.model import Query, QueryFilters

MAX_BOOLEAN_CLAUSES = 1024  # solrconfig.xml:500

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<matchall>\*\s*:\s*\*)
  | (?P<field>[A-Za-z_][A-Za-z0-9_]*)\s*:\s*
  | (?P<quoted>"(?P<qbody>[^"]*)")
  | (?P<range>\[(?P<rbody>[^\]]*)\])
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<star>\*)
  | (?P<minus>-)
  | (?P<caret>\^)
  | (?P<tilde>~)
  | (?P<word>[^\s()\[\]":^~]+)
    """,
    re.VERBOSE,
)

# query-surface field → QueryFilters slot (the transcripts schema;
# anything else becomes a generic equality filter)
DEFAULT_FILTER_SLOTS = {"role": "roles", "tool": "tools", "conv_id": "conv_ids", "conv": "conv_ids"}
RANGE_FIELDS = {"ts"}


class QueryParseError(ValueError):
    pass


_TS_PARSE_RE = re.compile(
    r"^(?P<y>\d{4})-(?P<mo>\d{1,2})-(?P<d>\d{1,2})"
    r"(?:[ T](?P<h>\d{1,2}):(?P<mi>\d{1,2})"
    r"(?::(?P<s>\d{1,2})(?:\.(?P<f>\d+))?)?)?"
    r"(?P<tz>Z|[+-]\d{2}:?\d{2})?$"
)


def normalize_ts(v: str) -> str:
    """Canonicalize an ISO-ish timestamp to the fixed-width form
    ``YYYY-MM-DDTHH:MM:SS.ffffff`` so lexicographic max/min ==
    chronological max/min when intersecting repeated range bounds
    (ADVICE r2: '2026-1-2' vs '2026-01-02T00:00:00' miscompared as
    strings). Timezone offsets (``+02:00``, ``-0500``, ``Z``) are
    converted to UTC — the engine pins spark.sql.session.timeZone=UTC
    (session.py:41), so this matches what ``to_timestamp`` would do with
    the raw string. Fractional seconds beyond microseconds truncate, as
    Spark's TimestampType does. Raises QueryParseError on unparseable
    values."""
    m = _TS_PARSE_RE.match(v.strip())
    if not m:
        raise QueryParseError(f"unparseable timestamp {v!r}")
    from datetime import datetime, timedelta

    try:
        dt = datetime(
            int(m["y"]),
            int(m["mo"]),
            int(m["d"]),
            int(m["h"] or 0),
            int(m["mi"] or 0),
            int(m["s"] or 0),
            int((m["f"] or "")[:6].ljust(6, "0") or 0),
        )
    except ValueError as e:
        raise QueryParseError(f"invalid timestamp {v!r}: {e}") from e
    tz = m["tz"]
    if tz and tz != "Z":
        sign = 1 if tz[0] == "+" else -1
        hh, mm = int(tz[1:3]), int(tz.replace(":", "")[3:5])
        dt -= sign * timedelta(hours=hh, minutes=mm)  # to UTC
    return dt.isoformat(sep="T", timespec="microseconds")


@dataclass
class _Clause:
    field: str
    kind: str  # "term" | "phrase" | "range" | "exists" | "matchall" | "disj"
    value: object = None
    prohibited: bool = False
    conn_before: Optional[str] = None  # connective linking to previous clause
    boost: Optional[float] = None  # term^2.5
    slop: Optional[int] = None  # "a b"~2


def _scan(s: str) -> List[dict]:
    toks, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise QueryParseError(f"cannot tokenize at {s[i:i+20]!r}")
        i = m.end()
        if m.lastgroup != "ws" and m.group("ws") is None:
            toks.append({k: v for k, v in m.groupdict().items() if v is not None})
    return toks


def _parse_clauses(s: str, default_field: str) -> List[_Clause]:
    toks = _scan(s)
    out: List[_Clause] = []
    pending_conn: Optional[str] = None
    prohibited = False
    i = 0

    def value_clause(fld: str, t: dict) -> _Clause:
        if "quoted" in t:
            return _Clause(fld, "phrase", t["qbody"])
        if "range" in t:
            lo_hi = re.split(r"\s+TO\s+", t["rbody"].strip())
            if len(lo_hi) != 2:
                raise QueryParseError(f"bad range {t['range']!r}")
            lo = None if lo_hi[0].strip() in ("*", "") else lo_hi[0].strip()
            hi = None if lo_hi[1].strip() in ("*", "") else lo_hi[1].strip()
            if lo is None and hi is None:
                return _Clause(fld, "exists")
            return _Clause(fld, "range", (lo, hi))
        if "star" in t or "matchall" in t:
            return _Clause(fld, "matchall")
        if "word" in t:
            return _Clause(fld, "term", t["word"])
        raise QueryParseError(f"expected a value, got {t}")

    def consume_suffix(c: _Clause, i: int) -> int:
        # Lucene value suffixes: term^2.5 / "a b"^2.5 (boost) and
        # "a b"~2 (phrase slop). term~N is FUZZY — out of scope, refused
        # loudly rather than silently treated as a literal.
        while i < len(toks) and ("caret" in toks[i] or "tilde" in toks[i]):
            t = toks[i]
            if i + 1 >= len(toks) or "word" not in toks[i + 1]:
                op = "^" if "caret" in t else "~"
                raise QueryParseError(f"{op!r} must be followed by a number")
            num = toks[i + 1]["word"]
            if "caret" in t:
                if c.kind not in ("term", "phrase"):
                    raise QueryParseError(f"boost on a {c.kind} clause is not supported")
                try:
                    c.boost = float(num)
                except ValueError as e:
                    raise QueryParseError(f"bad boost value {num!r}") from e
                if c.boost < 0:
                    raise QueryParseError(f"negative boost {num!r}")
            else:
                if c.kind != "phrase":
                    raise QueryParseError(
                        "fuzzy term queries (term~N) are not supported; "
                        "~N applies to quoted phrases only"
                    )
                try:
                    c.slop = int(num)
                except ValueError as e:
                    raise QueryParseError(f"bad slop value {num!r} (integer required)") from e
                if c.slop < 0:
                    raise QueryParseError(f"negative slop {num!r}")
            i += 2
        return i

    while i < len(toks):
        t = toks[i]
        if "word" in t and t["word"] in ("AND", "OR", "NOT"):
            if t["word"] == "NOT":
                prohibited = True
            elif pending_conn is not None or not out:
                raise QueryParseError(f"dangling operator {t['word']}")
            else:
                pending_conn = t["word"]
            i += 1
            continue
        if "minus" in t:
            prohibited = True
            i += 1
            continue
        if "field" in t:
            fld = t["field"]
            i += 1
            if i >= len(toks):
                raise QueryParseError(f"field {fld!r} with no value")
            nxt = toks[i]
            if "lparen" in nxt:  # field:(a OR b OR c)
                i += 1
                vals: List[str] = []
                expect_val = True
                while i < len(toks) and "rparen" not in toks[i]:
                    u = toks[i]
                    if "word" in u and u["word"] == "OR":
                        expect_val = True
                    elif ("word" in u or "quoted" in u) and expect_val:
                        vals.append(u.get("word") or u.get("qbody"))
                        expect_val = False
                    else:
                        raise QueryParseError(f"bad disjunction member {u}")
                    i += 1
                if i >= len(toks):
                    raise QueryParseError("unclosed '('")
                i += 1  # consume ')'
                c = _Clause(fld, "disj", vals, prohibited, pending_conn)
            else:
                c = value_clause(fld, nxt)
                c.prohibited = prohibited
                c.conn_before = pending_conn
                i += 1
                i = consume_suffix(c, i)
        else:
            c = value_clause(default_field, t)
            c.prohibited = prohibited
            c.conn_before = pending_conn
            i += 1
            i = consume_suffix(c, i)
        out.append(c)
        pending_conn = None
        prohibited = False
    if pending_conn is not None:
        raise QueryParseError(f"dangling operator {pending_conn}")
    return out


def parse_query(
    s: str,
    default_field: str = "text",
    k: int = 10,
    start: int = 0,
    count_only: bool = False,
    sort=None,
    fl=None,
    filter_slots: Optional[Dict[str, str]] = None,
    max_clauses: int = MAX_BOOLEAN_CLAUSES,
) -> Query:
    """Parse a raw query string into a Query.

    Raises QueryParseError on syntax errors, on more than ``max_clauses``
    boolean clauses (the solrconfig.xml:500 cap — counted at the term
    level, disjunction members included), and on shapes outside the flat
    model (mixed AND/OR between scored clauses, prohibited phrases).
    """
    slots = DEFAULT_FILTER_SLOTS if filter_slots is None else filter_slots
    clauses = _parse_clauses(s, default_field)

    n_bool = sum(len(c.value) if c.kind == "disj" else 1 for c in clauses)
    if n_bool > max_clauses:
        raise QueryParseError(f"too many boolean clauses: {n_bool} > {max_clauses}")

    terms: List[str] = []
    not_terms: List[str] = []
    phrase: Optional[str] = None
    phrase_slop = 0
    boosts: Dict[str, float] = {}
    exists = False
    mode: Optional[str] = None
    roles: List[str] = []
    tools: List[str] = []
    conv_ids: List[str] = []
    fields: Dict[str, List[str]] = {}
    ts_from = ts_to = None
    slot_lists = {"roles": roles, "tools": tools, "conv_ids": conv_ids}

    for c in clauses:
        scored = c.field == default_field and c.kind in ("term", "phrase")
        if scored and not c.prohibited and c.conn_before in ("AND", "OR"):
            want = "and" if c.conn_before == "AND" else "or"
            if mode is not None and mode != want:
                raise QueryParseError("mixed AND/OR between scored clauses is not supported")
            mode = want
        if c.kind == "matchall":
            continue  # *:* — no constraint
        if c.field == default_field:
            if c.kind == "exists":
                exists = True
            elif c.kind == "phrase":
                if c.prohibited:
                    raise QueryParseError("prohibited phrases are not supported")
                if phrase is not None:
                    raise QueryParseError("multiple phrases are not supported")
                phrase = c.value
                phrase_slop = c.slop or 0
                if c.boost is not None:
                    # phrase boost scales each phrase token's contribution
                    # (keys are tokenized at score time, so the raw phrase
                    # text is a valid boost key)
                    boosts[c.value] = boosts.get(c.value, 1.0) * c.boost
            elif c.kind == "term":
                if c.prohibited:
                    not_terms.append(c.value)  # NOT is non-scoring; boost ignored
                else:
                    terms.append(c.value)
                    if c.boost is not None:
                        boosts[c.value] = boosts.get(c.value, 1.0) * c.boost
            elif c.kind == "disj":
                if c.prohibited:
                    not_terms.extend(c.value)
                else:
                    if mode == "and":
                        raise QueryParseError("mixed AND/OR between scored clauses is not supported")
                    mode = "or"
                    terms.extend(c.value)
            else:
                raise QueryParseError(f"unsupported {c.kind} on the scored field")
            continue
        # filter fields (non-scoring, conjunctive — fq semantics)
        if c.prohibited:
            raise QueryParseError(f"prohibited filter {c.field!r} is not supported")
        if c.slop is not None:
            raise QueryParseError(f"slop on filter field {c.field!r} is not supported")
        # c.boost on a filter clause is accepted and ignored: filters never
        # score (Solr fq semantics)
        if c.kind == "range":
            if c.field not in RANGE_FIELDS:
                raise QueryParseError(f"range on non-range field {c.field!r}")
            # repeated range clauses INTERSECT (fq semantics), on
            # canonical fixed-width bounds — never overwrite (ADVICE r2)
            lo, hi = c.value
            if lo is not None:
                lo = normalize_ts(lo)
                ts_from = lo if ts_from is None else max(ts_from, lo)
            if hi is not None:
                hi = normalize_ts(hi)
                ts_to = hi if ts_to is None else min(ts_to, hi)
        elif c.kind in ("term", "phrase", "disj"):
            vals = list(c.value) if c.kind == "disj" else [c.value]
            slot = slots.get(c.field)
            if slot is not None:
                slot_lists[slot].extend(vals)
            else:
                fields.setdefault(c.field, []).extend(vals)
        elif c.kind == "exists":
            raise QueryParseError(f"existence filter on {c.field!r} is not supported")

    filters = QueryFilters(
        roles=roles or None,
        tools=tools or None,
        ts_from=ts_from,
        ts_to=ts_to,
        conv_ids=conv_ids or None,
        fields=fields or None,
    )
    return Query(
        terms=terms,
        mode=mode or "or",
        not_terms=not_terms or None,
        phrase=phrase,
        phrase_slop=phrase_slop,
        boosts={k: v for k, v in boosts.items() if v != 1.0} or None,
        filters=filters,
        sort=sort,
        start=start,
        k=k,
        count_only=count_only,
        exists=exists,
        fl=fl,
    )
