"""URL canonicalization (r14): the rule matrix, graceful degradation
on non-URLs, and the no-Python plan shape. The dedup composition sits
under the x11_url_dedup oracle (tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from wwwision_importservice_spark.operators.urls import canonical_url

CASES = [
    # case folding scheme+authority only, default port, trailing
    # slash, tracking filter, parameter sort, fragment strip
    ("HTTP://WWW.Example.COM:80/Path/Sub/?b=2&utm_source=x&a=1#frag",
     "http://www.example.com/Path/Sub?a=1&b=2"),
    ("https://Host.com:443/", "https://host.com/"),
    ("https://host.com", "https://host.com/"),          # empty path
    ("http://h.com/p?utm_a=1&utm_b=2", "http://h.com/p"),  # emptied ?
    ("http://h.com/p/?", "http://h.com/p"),
    ("  http://h.com/a//b/  ", "http://h.com/a//b"),    # no // collapse
    ("http://h.com:8080/p", "http://h.com:8080/p"),     # non-default port
    ("http://h.com/p?x=?&a=1", "http://h.com/p?a=1&x=?"),  # ? in query
    ("http://h.com/p?ref=tw&z=9&a", "http://h.com/p?a&z=9"),
    # no authority: fragment/tracking/sort still apply, nothing lowered
    ("mailto:x@y.z?subject=hi", "mailto:x@y.z?subject=hi"),
    ("not a url #tag", "not a url "),
]


@pytest.mark.parametrize("src,want", CASES)
def test_canonical_url_rule_matrix(spark, src, want):
    df = spark.createDataFrame([(src,)], "url string")
    got = df.select(canonical_url("url").alias("c")).first()["c"]
    assert got == want


def test_canonical_url_collapses_variants(spark):
    """The point of the operator: messy spellings of one page become
    ONE dedup key."""
    variants = [
        "http://WWW.site7.COM:80/p/9/?b=2&a=1",
        "http://www.Site7.com/p/9?b=2&utm_source=feed&a=1#frag",
        "HTTP://www.site7.com/p/9?a=1&b=2&gclid=xyz#x",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    canons = {r["c"] for r in
              df.select(canonical_url("url").alias("c")).collect()}
    assert canons == {"http://www.site7.com/p/9?a=1&b=2"}


def test_canonical_url_plan_is_pure_expression(spark):
    """Scale contract: the operator is Catalyst expressions only — no
    Python evaluation node, one projection over the scan."""
    df = spark.createDataFrame([("http://a.b/c",)], "url string")
    plan = df.select(canonical_url("url").alias("c"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def _canonical_url_naive(col):
    """The pre-r14 inlined form of :func:`canonical_url`, kept verbatim
    as the differential reference: every rule's defining expression is
    re-embedded at each use site, so the tree is exponential in rule
    depth (~280 KB of explain per instantiation, ~9 ms/row interpreted)
    but trivially readable. The shipped operator must stay bit-identical
    to it."""
    from functools import reduce

    from pyspark.sql import functions as F

    from wwwision_importservice_spark.operators.urls import TRACKING_PARAMS

    def is_tracking(p):
        return reduce(lambda a, b: a | b,
                      (p.startswith(pat) for pat in TRACKING_PARAMS))

    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(F.trim(u), "#.*$", "")
    qpos = F.instr(u, "?")
    base = F.when(qpos > 0, F.substr(u, F.lit(1), qpos - 1)).otherwise(u)
    query = F.when(qpos > 0, F.substr(u, qpos + 1)).otherwise(F.lit(""))
    apos = F.instr(base, "://")
    has_auth = apos > 0
    scheme = F.lower(F.substr(base, F.lit(1), apos - 1))
    after = F.substr(base, apos + 3)
    slash = F.instr(after, "/")
    authority = F.lower(
        F.when(slash > 0, F.substr(after, F.lit(1), slash - 1)).otherwise(after)
    )
    path = F.when(slash > 0, F.substr(after, slash)).otherwise(F.lit(""))
    authority = (
        F.when((scheme == "http") & authority.endswith(":80"),
               F.substr(authority, F.lit(1), F.length(authority) - 3))
        .when((scheme == "https") & authority.endswith(":443"),
              F.substr(authority, F.lit(1), F.length(authority) - 4))
        .otherwise(authority)
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substr(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    clean_q = F.array_join(
        F.array_sort(
            F.filter(F.split(query, "&"),
                     lambda p: (p != "") & ~is_tracking(p))
        ),
        "&",
    )
    q_suffix = (
        F.when(clean_q != "", F.concat(F.lit("?"), clean_q))
        .otherwise(F.lit(""))
    )
    rebuilt = F.concat(scheme, F.lit("://"), authority, path, q_suffix)
    return F.when(has_auth, rebuilt).otherwise(F.concat(base, q_suffix))


def test_canonical_url_let_form_matches_naive(spark):
    """r14 optimization pin: the let-bound form (single-element
    ``transform`` lambdas, linear tree) is bit-identical to the naive
    inlined form on the rule matrix, NULL/empty, and a 600-URL
    generative mix of every rule interaction (scheme case x port x
    trailing slash x tracking params x fragments x no-authority)."""
    from pyspark.sql import functions as F

    urls = [src for src, _ in CASES] + [None, ""]
    schemes = ["http", "HTTP", "https", "hTTps"]
    ports = ["", ":80", ":443", ":8080"]
    tails = ["", "/", "//", "/x/", "#f", "?utm_a=1", "?b=2&a=1#z",
             "?gclid=g&z=1&y=2", "?", "?&&a=1"]
    for i in range(600):
        s = schemes[i % 4]
        p = ports[(i // 4) % 4]
        t = tails[(i // 16) % 10]
        host = f"WWW.h{i % 7}.Com" if i % 2 else f"h{i % 7}.com"
        path = "" if i % 5 == 0 else f"/P{i % 11}/q"
        urls.append(f"{s}://{host}{p}{path}{t}")
        if i % 13 == 0:
            urls.append(f"opaque-{i}:stuff?ref=x&a={i}#frag")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        canonical_url("url").alias("n"),
        _canonical_url_naive("url").alias("o"),
    ).collect()
    bad = [(urls[i], r["n"], r["o"]) for i, r in enumerate(got)
           if r["n"] != r["o"]]
    assert not bad, bad[:5]


def test_canonical_url_tree_stays_linear(spark):
    """Regression guard for the exponential-duplication class: one
    instantiation of the operator must print as a few KB of plan, not
    hundreds (the naive form's single-column projection was ~280 KB).
    Generous 10x headroom over the current ~4 KB so the pin survives
    formatting drift but not a re-inlined intermediate."""
    df = spark.createDataFrame([("http://a.b/c?z=1&a=2#f",)], "url string")
    plan = df.select(canonical_url("url").alias("c"))._jdf \
        .queryExecution().executedPlan().toString()
    assert len(plan) < 40_000, len(plan)
