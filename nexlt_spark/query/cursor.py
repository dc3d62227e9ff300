"""cursorMark deep paging — Solr's keyset pagination (CursorMark).

The reference's clients page with ``start=N`` (PagerWidget.js:153,
CGI/parallel.cgi:135-157), which Solr itself documents as the deep-paging
scale-killer: page N costs collect-and-skip of N+k ranked rows on every
shard, so exporting a big result set is O(N²). Solr's answer is
``cursorMark`` (the CursorMark API every SolrCloud export loop uses):
the response carries an opaque ``nextCursorMark`` encoding the last
row's sort values, and the next request filters to rows sorting
STRICTLY AFTER that tuple — every page is a fresh top-k, never a skip.

This module is that mechanism over DataFrames:

- :func:`after_cursor_col` — the lexicographic "sorts strictly after the
  cursor tuple" boolean Column, null-aware under Spark's default sort
  null placement (asc = nulls FIRST, desc = nulls LAST), so a filter +
  ``orderBy().limit(k)`` plan (TakeOrderedAndProject — one reduced
  shuffle of k rows per partition) replaces offset pagination. Page
  latency is flat in depth: page 1,000,000 costs the same one top-k job
  as page 1.
- :func:`encode_cursor` / :func:`decode_cursor` — the opaque mark:
  url-safe base64 of a JSON object of tagged sort values (timestamps as
  exact epoch microseconds — never naive local-time strings, which shift
  by the session-vs-driver timezone delta and collapse DST-ambiguous
  instants — and round-trip-exact floats) plus the sort spec it was
  minted under, so replaying a mark against a different sort raises
  :class:`CursorError` instead of silently casting values to NULL and
  reporting a false end-of-results. ``*`` is the start-of-results mark,
  as in Solr.

Correctness requires the sort order to be TOTAL (a unique, non-null
tiebreak column last — Solr mandates the uniqueKey field in cursor
sorts for exactly this reason); the select facade appends ``doc_id
asc`` to every sort, so its cursor sorts always qualify.
"""

from __future__ import annotations

import base64
import datetime as _dt
import json
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CURSOR_START = "*"


class CursorError(ValueError):
    """Malformed or type-incompatible cursor mark."""


_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _tag(v):
    if v is None or isinstance(v, (bool, int, str)):
        return ["v", v]
    if isinstance(v, float):
        return ["v", v]  # json round-trips python floats exactly (repr)
    if isinstance(v, _dt.datetime):
        # collect() hands the driver NAIVE local-time datetimes
        # (datetime.fromtimestamp); astimezone() on a naive value attaches
        # the driver-local zone — the exact inverse — and integer division
        # against the epoch gives exact microseconds with no float
        # rounding and no dependence on spark.sql.session.timeZone at
        # replay time (an ISO string would be re-read under the SESSION
        # zone, shifting every boundary by the zone delta)
        if v.tzinfo is None:
            v = v.astimezone()
        return ["tsu", (v - _EPOCH) // _dt.timedelta(microseconds=1)]
    if isinstance(v, _dt.date):
        return ["d", v.isoformat()]
    raise CursorError(f"unsupported cursor sort value type {type(v).__name__}")


def encode_cursor(values: Sequence, sort_spec: Optional[Sequence] = None) -> str:
    """Sort-value tuple of the page's LAST row → opaque mark. Pass the
    sort spec to stamp the mark with it; replay under a different sort
    then raises instead of mis-casting values."""
    payload = {"v": [_tag(v) for v in values]}
    if sort_spec is not None:
        payload["s"] = [[c, d] for c, d in sort_spec]
    return base64.urlsafe_b64encode(
        json.dumps(payload, separators=(",", ":")).encode()
    ).decode()


def decode_cursor(mark: str, expect_spec: Optional[Sequence] = None) -> Optional[List]:
    """Opaque mark → sort-value list; ``*`` → None (start of results).
    If the mark was stamped with a sort spec and ``expect_spec`` is
    given, a mismatch raises CursorError (a mark replayed against a
    different sort would otherwise cast to NULL literals, filter every
    row, and read as a false end-of-results)."""
    if mark == CURSOR_START:
        return None
    try:
        payload = json.loads(base64.urlsafe_b64decode(mark.encode()))
        if isinstance(payload, list):  # pre-stamp mark shape
            tagged, minted = payload, None
        else:
            tagged, minted = payload["v"], payload.get("s")
        vals = [v for _, v in tagged]
    except Exception as e:  # malformed b64/json/shape
        raise CursorError(f"malformed cursorMark {mark!r}") from e
    if (
        minted is not None
        and expect_spec is not None
        and [[c, d] for c, d in expect_spec] != minted
    ):
        raise CursorError(
            f"cursorMark was minted under sort {minted} but replayed "
            f"against {[[c, d] for c, d in expect_spec]}"
        )
    return vals


def _lit_as(df: DataFrame, col: str, v):
    """Literal comparable to df[col]: timestamps travel as exact epoch
    micros (session-timezone-proof); everything else casts through the
    column's own type (ISO date strings → date, ints → long, …)."""
    dtype = df.schema[col].dataType
    from pyspark.sql.types import TimestampType

    if isinstance(dtype, TimestampType) and isinstance(v, int) and not isinstance(v, bool):
        return F.timestamp_micros(F.lit(v))
    return F.lit(v).cast(dtype)


def after_cursor_col(
    df: DataFrame, sort_spec: Sequence[Tuple[str, str]], values: Sequence
) -> Column:
    """Boolean Column: row sorts STRICTLY AFTER the cursor tuple under
    ``sort_spec`` ([(column, "asc"|"desc"), …], Spark default null
    placement). Lexicographic: OR over positions i of (equal on all
    j < i) AND (strictly after at i).

    Null placement (Spark defaults, which orderBy uses):
      asc  — nulls first: after a null cursor value ⇔ x IS NOT NULL;
             after a non-null v ⇔ x > v (a null x is NOT after).
      desc — nulls last:  after a null cursor value ⇔ nothing (ties
             fall through to later columns); after a non-null v ⇔
             x IS NULL OR x < v.
    """
    if len(sort_spec) != len(values):
        raise CursorError(
            f"cursorMark carries {len(values)} sort values but the sort "
            f"has {len(sort_spec)} columns — cursor from a different sort?"
        )
    pred = F.lit(False)
    eq_prefix = F.lit(True)
    for (name, direction), v in zip(sort_spec, values):
        x = F.col(name)
        lit = _lit_as(df, name, v)
        if direction == "asc":
            after = x.isNotNull() if v is None else (x > lit)
        elif direction == "desc":
            after = F.lit(False) if v is None else (x.isNull() | (x < lit))
        else:
            raise CursorError(f"bad sort direction {direction!r}")
        pred = pred | (eq_prefix & after)
        # null-safe equality so a null cursor value ties with null cells
        eq_prefix = eq_prefix & x.eqNullSafe(lit)
    return pred


def cursor_page(
    df: DataFrame,
    sort_spec: Sequence[Tuple[str, str]],
    mark: str,
    k: int,
) -> DataFrame:
    """One cursor page: filter strictly-after ``mark``, then top-k in
    ``sort_spec`` order — compiles to Filter + TakeOrderedAndProject
    regardless of how deep the cursor is."""
    vals = decode_cursor(mark, expect_spec=sort_spec)
    out = df if vals is None else df.where(after_cursor_col(df, sort_spec, vals))
    order = [
        F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in sort_spec
    ]
    return out.orderBy(*order).limit(k)
