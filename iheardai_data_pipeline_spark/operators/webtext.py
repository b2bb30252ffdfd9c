"""Web-document curation primitives: HTML/boilerplate extraction,
Unicode normalization, and a text-density line filter (C4 / RefinedWeb
lineage — the standard first stages of a web-crawl training-data
pipeline; the reference's own URL/page parsing gestures at the domain,
frontend_transformer.py:100-142).

Design rule shared with bpe.py / pq.py: every transform is a ROW-LOCAL
expression chain generated from ONE table of patterns, with a DuckDB
twin generated from the SAME table — so the catalog oracles check the
values bit-for-bit, not a reimplementation. No UDFs anywhere; at 100 TB
these run inside whole-stage codegen over the scan.

Honesty notes:
- ``unicode_clean`` is deterministic TRANSLITERATION/folding (pinned
  quote/dash/space/accent tables, zero-width removal, control-char
  strip), not full NFC — real NFC needs the Unicode composition tables
  (unicodedata), which neither engine exposes in SQL. The folds cover
  the high-frequency web-text cases those pipelines actually target.
- ``html_to_text`` is the C4-style tag stripper (comments, script/style
  subtrees, block tags to newlines, entity decode), not an HTML5 parser
  — malformed markup degrades to leaving text in place, never to
  dropping it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- shared pattern tables (single source of truth for both engines) --------------

# decode ORDER MATTERS: "&amp;" must be LAST or "&amp;lt;" would decode
# twice ("&lt;" then "<") — the classic double-unescape bug
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

_COMMENT_RE = r"(?s)<!--.*?-->"
_SCRIPT_STYLE_RE = r"(?is)<(script|style)[^>]*>.*?</(script|style)>"
# block-level closers/br become newlines so line structure survives the strip
_BLOCK_TAG_RE = r"(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|/blockquote)[^>]*/?>"
_ANY_TAG_RE = r"<[^>]*>"

# 1:1 codepoint folds (translate-able): curly quotes, dashes, exotic
# spaces, and a pinned Latin-1 accent subset
UNICODE_FOLD_1TO1: tuple[tuple[str, str], ...] = (
    (" ", " "),  # nbsp
    (" ", " "),
    (" ", " "),
    (" ", " "),
    ("‘", "'"),
    ("’", "'"),
    ("‚", "'"),
    ("“", '"'),
    ("”", '"'),
    ("„", '"'),
    ("–", "-"),
    ("—", "-"),
    ("´", "'"),
    ("à", "a"), ("á", "a"), ("â", "a"), ("ã", "a"),
    ("ä", "a"), ("å", "a"),
    ("è", "e"), ("é", "e"), ("ê", "e"), ("ë", "e"),
    ("ì", "i"), ("í", "i"), ("î", "i"), ("ï", "i"),
    ("ò", "o"), ("ó", "o"), ("ô", "o"), ("õ", "o"),
    ("ö", "o"),
    ("ù", "u"), ("ú", "u"), ("û", "u"), ("ü", "u"),
    ("ç", "c"), ("ñ", "n"), ("ý", "y"), ("ÿ", "y"),
    ("À", "A"), ("Á", "A"), ("Â", "A"), ("Ä", "A"),
    ("È", "E"), ("É", "E"), ("Ê", "E"), ("Ë", "E"),
    ("Ì", "I"), ("Í", "I"), ("Î", "I"), ("Ï", "I"),
    ("Ò", "O"), ("Ó", "O"), ("Ô", "O"), ("Ö", "O"),
    ("Ù", "U"), ("Ú", "U"), ("Û", "U"), ("Ü", "U"),
    ("Ç", "C"), ("Ñ", "N"),
)

# 1:N folds (replace chain — translate can't grow strings)
UNICODE_FOLD_MULTI: tuple[tuple[str, str], ...] = (
    ("…", "..."),  # ellipsis
    ("ß", "ss"),
    ("æ", "ae"),
    ("œ", "oe"),
    ("Æ", "AE"),
    ("Œ", "OE"),
)

# zero-width characters: removed outright
_ZERO_WIDTH = "​‌‍﻿"

# C0 controls except \t(09) \n(0A) \r(0D), plus DEL — \r folds to \n
# separately so CRLF survives as line structure
_CONTROL_CODEPOINTS = (
    list(range(0x00, 0x09)) + [0x0B, 0x0C] + list(range(0x0E, 0x20)) + [0x7F]
)


def _control_re(engine: str) -> str:
    if engine == "spark":
        parts = "".join(f"\\x{c:02X}" for c in _CONTROL_CODEPOINTS)
    else:  # duckdb (RE2)
        parts = "".join(f"\\x{{{c:04X}}}" for c in _CONTROL_CODEPOINTS)
    return f"[{parts}]"


# --- Spark expressions --------------------------------------------------------------


def decode_entities(col: Column) -> Column:
    """Fixed-table HTML entity decode (order-pinned replace chain)."""
    out = col
    for src, dst in HTML_ENTITIES:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def html_to_text(col: Column) -> Column:
    """Strip markup to visible text, preserving block structure as
    newlines: comments out, script/style SUBTREES out (their text is
    code, not content), block closers/br to ``\\n``, remaining tags
    out, entities decoded, then per-line space collapse + blank-line
    drop. One row-local expression chain — no UDF, no shuffle."""
    out = F.regexp_replace(col, _COMMENT_RE, "")
    out = F.regexp_replace(out, _SCRIPT_STYLE_RE, "")
    out = F.regexp_replace(out, _BLOCK_TAG_RE, "\n")
    out = F.regexp_replace(out, _ANY_TAG_RE, "")
    out = decode_entities(out)
    lines = F.split(out, "\n")
    cleaned = F.filter(
        F.transform(
            lines, lambda l: F.trim(F.regexp_replace(l, r"[ \t]+", " "))
        ),
        lambda l: F.length(l) > 0,
    )
    return F.array_join(cleaned, "\n")


def unicode_clean(col: Column) -> Column:
    """Deterministic Unicode folding (see module doc — transliteration,
    not NFC): CRLF/CR to LF, control chars stripped, zero-widths
    removed, pinned quote/dash/space/accent folds, multi-char folds."""
    out = F.replace(col, F.lit("\r\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\n"))
    out = F.regexp_replace(out, _control_re("spark"), "")
    out = F.regexp_replace(out, f"[{_ZERO_WIDTH}]", "")
    frm = "".join(s for s, _ in UNICODE_FOLD_1TO1)
    to = "".join(d for _, d in UNICODE_FOLD_1TO1)
    out = F.translate(out, frm, to)
    for src, dst in UNICODE_FOLD_MULTI:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def line_density_filter(
    col: Column, min_alnum_pct: int = 40, min_chars: int = 5
) -> Column:
    """Keep lines that look like prose: at least ``min_chars`` long AND
    alphanumeric density >= ``min_alnum_pct`` percent (boilerplate —
    separators, nav crumbs, symbol rows — fails both). The density test
    is EXACT integer cross-multiplication (100*alnum >= pct*len), no
    float rounding to disagree across engines."""
    lines = F.split(col, "\n")
    kept = F.filter(
        lines,
        lambda l: (F.length(l) >= min_chars)
        & (
            F.length(F.regexp_replace(l, r"[^A-Za-z0-9]", "")) * 100
            >= F.length(l) * min_alnum_pct
        ),
    )
    return F.array_join(kept, "\n")


# --- DuckDB twins (generated from the SAME tables) ----------------------------------


def sql_decode_entities(expr: str) -> str:
    out = expr
    for src, dst in HTML_ENTITIES:
        d = dst.replace("'", "''")
        out = f"replace({out}, '{src}', '{d}')"
    return out


def sql_html_to_text(expr: str) -> str:
    out = f"regexp_replace({expr}, '(?s)<!--.*?-->', '', 'g')"
    out = (
        f"regexp_replace({out}, "
        f"'(?is)<(script|style)[^>]*>.*?</(script|style)>', '', 'g')"
    )
    out = (
        f"regexp_replace({out}, "
        f"'(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|/blockquote)[^>]*/?>', "
        f"chr(10), 'g')"
    )
    out = f"regexp_replace({out}, '<[^>]*>', '', 'g')"
    out = sql_decode_entities(out)
    return (
        "array_to_string(list_filter(list_transform("
        f"string_split({out}, chr(10)), "
        "l -> trim(regexp_replace(l, '[ \\t]+', ' ', 'g'))), "
        "l -> length(l) > 0), chr(10))"
    )


def sql_unicode_clean(expr: str) -> str:
    out = f"replace({expr}, chr(13) || chr(10), chr(10))"
    out = f"replace({out}, chr(13), chr(10))"
    out = f"regexp_replace({out}, '{_control_re('duckdb')}', '', 'g')"
    out = f"regexp_replace({out}, '[{_ZERO_WIDTH}]', '', 'g')"
    frm = "".join(s for s, _ in UNICODE_FOLD_1TO1)
    to = "".join(d for _, d in UNICODE_FOLD_1TO1)
    out = f"translate({out}, '{frm}', '{to.replace(chr(39), chr(39) * 2)}')"
    for src, dst in UNICODE_FOLD_MULTI:
        out = f"replace({out}, '{src}', '{dst}')"
    return out


def sql_line_density_filter(
    expr: str, min_alnum_pct: int = 40, min_chars: int = 5
) -> str:
    return (
        "array_to_string(list_filter("
        f"string_split({expr}, chr(10)), "
        f"l -> length(l) >= {min_chars} AND "
        f"length(regexp_replace(l, '[^A-Za-z0-9]', '', 'g')) * 100 "
        f">= length(l) * {min_alnum_pct}), chr(10))"
    )
