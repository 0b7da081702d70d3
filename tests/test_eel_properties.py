"""Property-based differential testing of the Eel → Spark SQL translator.

Hypothesis generates expressions from the translated Eel subset —
integer arithmetic, string concatenation with ``+``, comparisons,
``&&``/``||``, ternaries, and a few String helpers — renders them as
``${...}`` rules, and a literal Python evaluator supplies the expected
value. Each batch of expressions is evaluated in ONE Spark job (one
projection over a 1-row frame) to keep example cost down.

Known, documented translator limitations are respected by construction:
string ``+`` chains carry at least one protected string literal
(attribute-only concat is type-blind at translation time), and helper
results are never used as bare ``+`` concat operands.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wwwision_importservice_spark.functions.eel import translate_eel

ROW = {"a": 7, "b": -3, "s": "spark", "t": "graft"}


# each strategy yields (eel_source, python_value)
INT_LEAVES = st.sampled_from(
    [("record.a", ROW["a"]), ("record.b", ROW["b"])]
    + [(str(n), n) for n in (0, 1, 2, 5, 13)]
)
STR_LEAVES = st.sampled_from(
    [("record.s", ROW["s"]), ("record.t", ROW["t"])]
    + [(f'"{x}"', x) for x in ("", "x", "ab-1")]
)


def _num(children):
    def combine(pair):
        (ls, lv), op, (rs, rv) = pair
        if op == "+":
            return (f"({ls} + {rs})", lv + rv)
        if op == "-":
            return (f"({ls} - {rs})", lv - rv)
        return (f"({ls} * {rs})", lv * rv)

    return st.tuples(
        children, st.sampled_from(["+", "-", "*"]), children
    ).map(combine)


NUMS = st.recursive(INT_LEAVES, _num, max_leaves=6)


def _concat(pair):
    (ls, lv), (rs, rv) = pair
    return (f"({ls} + {rs})", f"{lv}{rv}")


# a concat chain seeded with a literal so the '+' is provably stringy
STRINGS = st.recursive(
    st.tuples(STR_LEAVES, st.sampled_from([(f'"{x}"', x) for x in ("_", "#")])).map(
        _concat
    ),
    lambda children: st.tuples(children, STR_LEAVES).map(_concat),
    max_leaves=5,
)


def _cmp(pair):
    (ls, lv), op, (rs, rv) = pair
    if op == "==":
        return (f"({ls} == {rs})", lv == rv)
    if op == "!=":
        return (f"({ls} != {rs})", lv != rv)
    if op == "<":
        return (f"({ls} < {rs})", lv < rv)
    return (f"({ls} >= {rs})", lv >= rv)


COMPARISONS = st.tuples(
    NUMS, st.sampled_from(["==", "!=", "<", ">="]), NUMS
).map(_cmp)


def _logic(children):
    def combine(pair):
        (ls, lv), op, (rs, rv) = pair
        if op == "&&":
            return (f"({ls} && {rs})", lv and rv)
        return (f"({ls} || {rs})", lv or rv)

    return st.tuples(children, st.sampled_from(["&&", "||"]), children).map(
        combine
    )


CONDS = st.recursive(COMPARISONS, _logic, max_leaves=4)


def _ternary(triple):
    (cs, cv), (ts, tv), (es, ev) = triple
    return (f"({cs} ? {ts} : {es})", tv if cv else ev)


TERNARIES = st.tuples(CONDS, STRINGS, STRINGS).map(_ternary)


def _helper(pair):
    (ss, sv), name = pair
    if name == "upper":
        return (f"String.toUpperCase({ss})", sv.upper())
    if name == "lower":
        return (f"String.toLowerCase({ss})", sv.lower())
    if name == "trim":
        return (f"String.trim({ss})", sv.strip())
    return (f"String.length({ss})", len(sv))


HELPERS = st.tuples(STRINGS, st.sampled_from(["upper", "lower", "trim", "len"])).map(
    _helper
)

EXPRESSIONS = st.one_of(NUMS, STRINGS, TERNARIES, HELPERS)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(st.lists(EXPRESSIONS, min_size=1, max_size=8))
def test_translated_expression_matches_python_eval(spark, batch):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(ROW["a"], ROW["b"], ROW["s"], ROW["t"])],
        "a long, b long, s string, t string",
    )
    cols = [
        F.expr(translate_eel("${" + src + "}")).alias(f"c{i}")
        for i, (src, _) in enumerate(batch)
    ]
    row = df.select(*cols).collect()[0]
    for i, (src, expected) in enumerate(batch):
        got = row[f"c{i}"]
        assert got == expected, f"${{{src}}} → {got!r}, expected {expected!r}"
