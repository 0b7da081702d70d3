"""URL canonicalization: the crawl-side exact-dedup key, as a PURE
Catalyst column expression — no UDF, no Arrow, no Python evaluation
node anywhere in the plan.

Crawls see the same page under many spellings (uppercase hosts,
fragments, tracking parameters, default ports, shuffled query order,
trailing slashes); URL-level dedup — the cheapest dedup an LLM
pipeline runs, before any content hash — needs ONE canonical spelling
per page. :func:`canonical_url` applies the standard normalization
rules entirely with built-in functions (the contrast to the Arrow
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
on the canonical column. The intermediates (the fragment-stripped
string, the base/query halves, authority, path, the cleaned query)
are **let-bound** via single-element higher-order ``transform``
lambdas (:func:`_let`) so each is evaluated ONCE per row and appears
ONCE in the plan. The naive nested-``when`` form duplicates every
intermediate into each of its consumers, which compounds: the
expression tree (and the per-row work — ``regexp_replace`` included)
grows exponentially with rule depth. Measured r14 at sf0.1: the
naive form's single-column projection printed as ~280 KB of explain
text and evaluated ~45 s for 50 k rows; the let-bound form is ~3 KB
and sub-second — same values, bit for bit (pinned by
``test_canonical_url_let_form_matches_naive``).

Reference parallel: none; training-data extension surface (SURVEY §2
X11 family, with `operators/warc.py` / `operators/htmltext.py`).
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query-parameter prefixes that never change the addressed resource
TRACKING_PARAMS = ("utm_", "fbclid=", "gclid=", "msclkid=", "ref=")


def _let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``value`` to a lambda variable and evaluate ``body`` over it
    — a per-row let-binding built from public API only:
    ``element_at(transform(array(v), x -> body(x)), 1)``. The array has
    exactly one element, so ``v`` is computed once per row and ``body``
    references it as a leaf variable instead of re-embedding (and
    re-evaluating) the whole subtree at every use site. NULL propagates
    exactly as in the inlined form: ``array(v)`` holds the NULL element
    and the lambda body sees it."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _is_tracking(p: Column) -> Column:
    return reduce(
        lambda a, b: a | b,
        (p.startswith(pat) for pat in TRACKING_PARAMS),
    )


def canonical_url(col: Column | str) -> Column:
    """The canonical spelling of a URL column (see the module rules).
    Malformed values degrade gracefully: no ``://`` means no authority
    to lowercase, and the fragment/tracking/sort rules still apply to
    whatever is there.

    Every intermediate below is introduced with :func:`_let`, never by
    re-embedding its defining expression at each use site — the rules
    and their order are byte-identical to the naive inlined form (the
    lambda variables evaluate the very same subtrees, once), only the
    tree SIZE changes (linear instead of exponential in rule depth).
    Nested-lambda safety comes from Spark itself: the JVM side renames
    every lambda variable with ``UnresolvedNamedLambdaVariable.
    freshVarName`` (``x_1``, ``x_2``, ...) independently of the Python
    parameter names (PySpark 4.x hardcodes ``argnames=['x','y','z']``
    and ignores them), so inner-scope shadowing across the nested
    lambdas cannot occur. The unique ``with_*`` parameter names below
    are purely for readability."""
    u0 = F.col(col) if isinstance(col, str) else col

    def with_u(u: Column) -> Column:
        # split off the query once; every later rule works on the
        # halves. instr finds the FIRST '?' — a '?' inside the query
        # (legal per RFC 3986) stays inside the query half.
        def with_qpos(qpos: Column) -> Column:
            base_v = (
                F.when(qpos > 0, F.substr(u, F.lit(1), qpos - 1)).otherwise(u)
            )
            query_v = F.when(qpos > 0, F.substr(u, qpos + 1)).otherwise(F.lit(""))

            def with_base(base: Column) -> Column:
                def with_query(query: Column) -> Column:
                    # query: drop empties + tracking params, sort the
                    # survivors
                    clean_q_v = F.array_join(
                        F.array_sort(
                            F.filter(
                                F.split(query, "&"),
                                lambda p: (p != "") & ~_is_tracking(p),
                            )
                        ),
                        "&",
                    )

                    def with_cleanq(clean_q: Column) -> Column:
                        q_suffix_v = (
                            F.when(clean_q != "", F.concat(F.lit("?"), clean_q))
                            .otherwise(F.lit(""))
                        )

                        def with_qsuffix(q_suffix: Column) -> Column:
                            # lowercase scheme://authority, keep the
                            # path's case
                            def with_apos(apos: Column) -> Column:
                                scheme_v = F.lower(
                                    F.substr(base, F.lit(1), apos - 1)
                                )
                                after_v = F.substr(base, apos + 3)

                                def with_scheme(scheme: Column) -> Column:
                                    def with_after(after: Column) -> Column:
                                        def with_slash(slash: Column) -> Column:
                                            auth_v = F.lower(
                                                F.when(
                                                    slash > 0,
                                                    F.substr(
                                                        after, F.lit(1), slash - 1
                                                    ),
                                                ).otherwise(after)
                                            )
                                            path_v = (
                                                F.when(
                                                    slash > 0, F.substr(after, slash)
                                                ).otherwise(F.lit(""))
                                            )

                                            def with_auth(authority: Column) -> Column:
                                                # default ports are
                                                # transport noise
                                                auth2 = (
                                                    F.when(
                                                        (scheme == "http")
                                                        & authority.endswith(":80"),
                                                        F.substr(
                                                            authority,
                                                            F.lit(1),
                                                            F.length(authority) - 3,
                                                        ),
                                                    )
                                                    .when(
                                                        (scheme == "https")
                                                        & authority.endswith(":443"),
                                                        F.substr(
                                                            authority,
                                                            F.lit(1),
                                                            F.length(authority) - 4,
                                                        ),
                                                    )
                                                    .otherwise(authority)
                                                )

                                                def with_path(path: Column) -> Column:
                                                    # strip one trailing
                                                    # slash except the root
                                                    path2 = F.when(
                                                        (F.length(path) > 1)
                                                        & path.endswith("/"),
                                                        F.substr(
                                                            path,
                                                            F.lit(1),
                                                            F.length(path) - 1,
                                                        ),
                                                    ).otherwise(path)
                                                    return F.concat(
                                                        scheme,
                                                        F.lit("://"),
                                                        auth2,
                                                        path2,
                                                        q_suffix,
                                                    )

                                                # path: empty -> '/'
                                                return _let(
                                                    F.when(path_v == "", F.lit("/"))
                                                    .otherwise(path_v),
                                                    with_path,
                                                )

                                            return _let(auth_v, with_auth)

                                        return _let(F.instr(after, "/"), with_slash)

                                    return _let(after_v, with_after)

                                # no authority: still strip fragment/
                                # tracking/sort, rewrite nothing
                                return F.when(
                                    apos > 0, _let(scheme_v, with_scheme)
                                ).otherwise(F.concat(base, q_suffix))

                            return _let(F.instr(base, "://"), with_apos)

                        return _let(q_suffix_v, with_qsuffix)

                    return _let(clean_q_v, with_cleanq)

                return _let(query_v, with_query)

            return _let(base_v, with_base)

        return _let(F.instr(u, "?"), with_qpos)

    return _let(F.regexp_replace(F.trim(u0), "#.*$", ""), with_u)


__all__ = ["TRACKING_PARAMS", "canonical_url"]
