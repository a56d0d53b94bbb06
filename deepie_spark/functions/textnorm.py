"""HTML -> text extraction and the reference's text-cleaning invariant.

Two layers:

1. Pure single-row functions (``extract_text_py``, ``clean_text_py``) —
   the *row oracle*.  The per-url byte-identity contract of the build
   (BASELINE.json ``input_hint``) is: for every url, the batched UDF
   output equals these functions byte-for-byte.
2. Column expressions / Arrow-batched pandas UDFs that run the same
   logic distributed.  Cleaning is pure Catalyst column expressions
   (whole-stage codegen, no Python); only HTML extraction needs a
   pandas UDF (regex + entity unescape over binary).

Cleaning semantics come from the reference:
  - strip '®' and '◆'   (run/DuIE/transformer_mpn_v2/data_loader_v2.py:185-186)
  - strip '\\xa0' from *decoded spans* (train.py:275-280) — exposed
    separately as ``strip_nbsp`` because the reference applies it at
    decode time, not ingest time.
  - digit normalization (every digit -> '0') for the NER path
    (run/entity_extraction/lexiconAugmentNER/utils/functions.py:9-16).
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# --- pure python row oracle ------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|table|title|article|section|header|footer)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
# ASCII whitespace only: NBSP (\xa0) must survive, because the reference
# strips it at span-decode time, not ingest time (train.py:275-280).
_WS_RUN_RE = re.compile(r"[ \t\r\n\f\v]+")


def extract_text_py(html_bytes: bytes | None) -> str:
    """Deterministic HTML -> text.

    Rules (fixed; this *defines* the per-url byte-identity invariant):
    decode utf-8 (replace errors), drop script/style/comments, block-level
    tags become ' ', all other tags become '', entities unescaped
    (``&nbsp;`` -> '\\xa0' — preserved, because the reference strips
    \\xa0 only at span-decode time), ASCII whitespace runs collapse to
    one ' ', outer ASCII whitespace stripped.
    """
    if html_bytes is None:
        return ""
    raw = bytes(html_bytes).decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub(" ", raw)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub(" ", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    s = _WS_RUN_RE.sub(" ", s)
    return s.strip(" \t\r\n\f\v")


def clean_text_py(text: str | None) -> str:
    """Reference ingest cleaning: drop '®' and '◆'
    (data_loader_v2.py:185-186).  None -> "" — a crawl WILL contain
    null-text rows (failed html extraction) and they must flow as
    zero-triple pages, not kill the task."""
    return (text or "").replace("®", "").replace("◆", "")


def strip_nbsp_py(text: str) -> str:
    """Reference decode-time cleaning: drop NBSP (train.py:275-280)."""
    return text.replace("\xa0", "")


def digit_norm_py(text: str) -> str:
    """NER digit normalization: every ASCII digit -> '0'
    (lexiconAugmentNER/utils/functions.py:9-16)."""
    return re.sub(r"[0-9]", "0", text)


# --- Catalyst column expressions (JVM-side, codegen) -----------------------


def clean_text_col(col: Column) -> Column:
    return F.translate(col, "®◆", "")


def strip_nbsp_col(col: Column) -> Column:
    return F.translate(col, "\xa0", "")


def digit_norm_col(col: Column) -> Column:
    return F.regexp_replace(col, "[0-9]", "0")


# --- Arrow-batched UDF for HTML extraction ---------------------------------


def extract_text_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (url, html) -> (url, text).

    Kept as a mapInPandas (not a scalar pandas_udf) so the binary html
    column never round-trips through a second projection — at 100 TB the
    html column dominates scan cost and must be dropped in this stage.
    """
    for pdf in it:
        out = pd.DataFrame(
            {
                "url": pdf["url"],
                "text": [extract_text_py(h) for h in pdf["html"]],
            }
        )
        yield out


def extract_text_udf() -> "F.udf":
    """Scalar pandas UDF (url-preserving projection form).  Built lazily
    because pandas_udf needs an active SparkSession to parse the DDL."""
    return F.pandas_udf(lambda s: s.map(extract_text_py), "string")
