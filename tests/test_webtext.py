"""webtext: HTML extraction / Unicode folding / line-density filter —
the tricky behaviors pinned, plus DuckDB-twin parity on adversarial
strings (the catalog oracle re-checks parity corpus-wide at sf0.01)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators import webtext as W


def _spark_one(spark, col_fn, s):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(col_fn(F.col("t")).alias("o")).collect()[0]["o"]


def _duck_one(sql_fn, s):
    return duckdb.connect().execute(f"SELECT {sql_fn('?')}", [s]).fetchone()[0]


def test_html_comment_with_gt_inside(spark):
    s = "a<!-- x > y -->b"
    assert _spark_one(spark, W.html_to_text, s) == "ab"


def test_script_and_style_subtrees_removed_entirely(spark):
    s = "<style>p{a:1}</style>keep<script>if(a>1){x('<b>')}</script>."
    assert _spark_one(spark, W.html_to_text, s) == "keep."


def test_block_tags_become_line_structure(spark):
    s = "<p>one</p><p>two</p><br>three"
    assert _spark_one(spark, W.html_to_text, s) == "one\ntwo\nthree"


def test_entity_decode_order_no_double_unescape(spark):
    # "&amp;lt;" is literal "&lt;" — must NOT decode twice into "<"
    s = "&amp;lt;x&amp;gt; &lt;real&gt; &quot;q&quot; &#39;a&#39;"
    assert (
        _spark_one(spark, W.html_to_text, s) == "&lt;x&gt; <real> \"q\" 'a'"
    )


def test_blank_and_whitespace_lines_dropped(spark):
    s = "<p>a   b</p><p>   </p><p>\t</p><p>c</p>"
    assert _spark_one(spark, W.html_to_text, s) == "a b\nc"


def test_unicode_clean_folds_and_strips(spark):
    s = "Café “q” – … A​B\x07C\r\nD\rE"
    assert (
        _spark_one(spark, W.unicode_clean, s) == 'Cafe "q" - ... ABC\nD\nE'
    )


def test_unicode_clean_multichar_folds(spark):
    assert _spark_one(spark, W.unicode_clean, "straße æon œuf") == (
        "strasse aeon oeuf"
    )


def test_line_density_filter_boundaries(spark):
    # "ab!" fails min_chars=5; "-----" fails density; 5-char 40% edge kept
    s = "ab!\n-----\nab--c\nGood line 42"
    assert (
        _spark_one(spark, lambda c: W.line_density_filter(c, 40, 5), s)
        == "ab--c\nGood line 42"
    )


def test_duckdb_twins_bit_exact_on_adversarial_strings(spark):
    cases = [
        "<html><head><style>p{a:1}</style><script>if(a>1){}</script></head>"
        "<body><h1>T &amp; U</h1><!-- c > d --><p>x&nbsp;y</p><div>z</div>"
        "&amp;lt;e&amp;gt;</body></html>",
        "no markup at all",
        "“fancy” — café …  sp​zw",
        "ctl\x01\x02\x1f\x7fend\r\nnext",
        "short\n!!!!!\nA good enough line\nx1\nokay line 9",
        "<p>unclosed <b>tag",
    ]
    for s in cases:
        for col_fn, sql_fn in (
            (W.html_to_text, W.sql_html_to_text),
            (W.unicode_clean, W.sql_unicode_clean),
            (W.line_density_filter, W.sql_line_density_filter),
        ):
            assert _spark_one(spark, col_fn, s) == _duck_one(sql_fn, s), (
                col_fn.__name__,
                s,
            )
