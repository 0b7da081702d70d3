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
