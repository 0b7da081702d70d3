"""URL canonicalization: the crawl-side exact-dedup key, as a PURE
Catalyst column expression — no UDF, no Arrow, whole-stage codegen.

Crawls see the same page under many spellings (uppercase hosts,
fragments, tracking parameters, default ports, shuffled query order,
trailing slashes); URL-level dedup — the cheapest dedup an LLM
pipeline runs, before any content hash — needs ONE canonical spelling
per page. :func:`canonical_url` applies the standard normalization
rules entirely with built-in functions, so at 100 TB the whole
operator stays inside whole-stage codegen (the contrast to the Arrow
codec lanes, which need per-byte Python):

1. trim; strip the ``#fragment``.
2. lowercase the scheme and the authority (never the path/query).
3. drop the scheme's default port (``:80`` http, ``:443`` https).
4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``) via a higher-order ``filter`` over the
   split query.
5. SORT the surviving query parameters (``array_sort``) — parameter
   order is transport noise.
6. drop a trailing path slash (except the bare root) and the ``?``
   of an emptied query; an empty path becomes ``/``.

The rules are deliberately conservative (no percent-decoding, no case
folding of the path, no dot-segment resolution) — each of those can
CHANGE which resource a URL names on some servers; everything above
is identity-preserving per RFC 3986 §6.2.2-6.2.3.

Scale shape: an expression, not a pass — composes into any scan with
predicate pushdown intact; the dedup itself is one hash aggregation
on the canonical column.

Reference parallel: none; training-data extension surface (SURVEY §2
X11 family, with `operators/warc.py` / `operators/htmltext.py`).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query-parameter prefixes that never change the addressed resource
TRACKING_PARAMS = ("utm_", "fbclid=", "gclid=", "msclkid=", "ref=")


def _is_tracking(p: Column) -> Column:
    return reduce(
        lambda a, b: a | b,
        (p.startswith(pat) for pat in TRACKING_PARAMS),
    )


def canonical_url(col: Column | str) -> Column:
    """The canonical spelling of a URL column (see the module rules).
    Malformed values degrade gracefully: no ``://`` means no authority
    to lowercase, and the fragment/tracking/sort rules still apply to
    whatever is there."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(F.trim(u), "#.*$", "")

    # split off the query once; every later rule works on the halves.
    # instr finds the FIRST '?' — a '?' inside the query (legal per
    # RFC 3986) stays inside the query half.
    qpos = F.instr(u, "?")
    base = F.when(qpos > 0, F.substr(u, F.lit(1), qpos - 1)).otherwise(u)
    query = F.when(qpos > 0, F.substr(u, qpos + 1)).otherwise(F.lit(""))

    # lowercase scheme://authority, keep the path's case
    apos = F.instr(base, "://")
    has_auth = apos > 0
    scheme = F.lower(F.substr(base, F.lit(1), apos - 1))
    after = F.substr(base, apos + 3)
    slash = F.instr(after, "/")
    authority = F.lower(
        F.when(slash > 0, F.substr(after, F.lit(1), slash - 1))
        .otherwise(after)
    )
    path = F.when(slash > 0, F.substr(after, slash)).otherwise(F.lit(""))

    # default ports are transport noise
    authority = (
        F.when((scheme == "http") & authority.endswith(":80"),
               F.substr(authority, F.lit(1), F.length(authority) - 3))
        .when((scheme == "https") & authority.endswith(":443"),
              F.substr(authority, F.lit(1), F.length(authority) - 4))
        .otherwise(authority)
    )

    # path: empty -> '/', strip one trailing slash except the root
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substr(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)

    # query: drop empties + tracking params, sort the survivors
    clean_q = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~_is_tracking(p),
            )
        ),
        "&",
    )
    q_suffix = (
        F.when(clean_q != "", F.concat(F.lit("?"), clean_q))
        .otherwise(F.lit(""))
    )

    rebuilt = F.concat(scheme, F.lit("://"), authority, path, q_suffix)
    # no authority: still strip fragment/tracking/sort, rewrite nothing
    return F.when(has_auth, rebuilt).otherwise(F.concat(base, q_suffix))


__all__ = ["TRACKING_PARAMS", "canonical_url"]
