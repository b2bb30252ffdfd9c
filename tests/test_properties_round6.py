"""Property-based invariants for the round-6 operators: webtext
idempotence/conservation and DDQ quantile-sketch bucket laws."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# text with markup-ish and unicode-ish noise mixed in
_NOISY = st.text(
    alphabet="ab <>&;/p!-–“”é ​\n\r\x07.0", min_size=0, max_size=60
)
_CENTS = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_NOISY, min_size=1, max_size=6))
def test_unicode_clean_is_idempotent(spark, texts):
    """Folding folded text is a no-op: every fold target is ASCII (or
    LF), so a second pass has nothing left to rewrite — the property
    that makes the stage safe to re-run in a replayed pipeline."""
    from iheardai_data_pipeline_spark.operators import webtext as W

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    once = W.unicode_clean(F.col("t"))
    rows = df.select(
        once.alias("a"), W.unicode_clean(once).alias("b")
    ).collect()
    for r in rows:
        assert r["a"] == r["b"]


@settings(max_examples=8, deadline=None)
@given(st.lists(_NOISY, min_size=1, max_size=6))
def test_density_filter_keeps_a_subset_of_lines(spark, texts):
    """The line filter may only DROP lines — never rewrite, reorder, or
    invent them."""
    from iheardai_data_pipeline_spark.operators import webtext as W

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    rows = df.select("t", W.line_density_filter(F.col("t")).alias("o")).collect()
    for r in rows:
        src = r["t"].split("\n")
        out = r["o"].split("\n") if r["o"] else []
        it = iter(src)
        for line in out:
            assert any(line == s for s in it), (r["t"], r["o"])


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="ab cd.", min_size=0, max_size=30),
                min_size=1, max_size=6))
def test_html_to_text_on_markup_free_text_is_space_collapse(spark, texts):
    """With no '<', '&' or control chars in the input, extraction must
    reduce to per-line space collapse + blank-line drop — markup-free
    text passes through undamaged."""
    from iheardai_data_pipeline_spark.operators import webtext as W

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    rows = df.select("t", W.html_to_text(F.col("t")).alias("o")).collect()
    import re

    for r in rows:
        want = "\n".join(
            l for l in (
                re.sub(r"[ \t]+", " ", x).strip() for x in r["t"].split("\n")
            ) if l
        )
        assert r["o"] == want


@settings(max_examples=8, deadline=None)
@given(_CENTS)
def test_ddq_bucket_is_monotone_and_exhaustive(spark, cents):
    """Bucket assignment must be monotone in the value (v1 <= v2 ->
    bucket(v1) <= bucket(v2) in (e, m) order) and must count every
    input exactly once."""
    from iheardai_data_pipeline_spark.operators.sketch import ddq_build

    df = spark.createDataFrame(
        [(c / 100.0,) for c in cents], "value double"
    )
    sk = ddq_build(df, "value").collect()
    assert sum(r["cnt"] for r in sk) == len(cents)

    def bucket(c):
        if c <= 0:
            return (-1, 0)
        e = c.bit_length() - 1
        return (e, (c >> max(e - 2, 0)) - (1 << min(e, 2)))

    got = {(r["e"], r["m"]): r["cnt"] for r in sk}
    from collections import Counter

    want = Counter(bucket(c) for c in cents)
    assert got == dict(want)
    for a in cents:
        for b in cents:
            if a <= b:
                assert bucket(a) <= bucket(b)


@settings(max_examples=6, deadline=None)
@given(_CENTS, _CENTS)
def test_ddq_merge_is_a_homomorphism(spark, a, b):
    """sketch(a ++ b) == sum-merge(sketch(a), sketch(b)) — the property
    that makes t17's micro-batch maintenance exact."""
    from iheardai_data_pipeline_spark.operators.sketch import ddq_build

    mk = lambda xs: spark.createDataFrame(
        [(c / 100.0,) for c in xs], "value double"
    )
    one = ddq_build(mk(a + b), "value")
    merged = (
        ddq_build(mk(a), "value")
        .unionByName(ddq_build(mk(b), "value"))
        .groupBy("e", "m")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, merged.collect())
    )
