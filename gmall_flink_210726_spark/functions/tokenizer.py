"""D1 — tokenizer UDTF (SURVEY §2.11).

The reference registers an IK-analyzer Chinese word-segmentation UDTF
(func/SplitFunction.java:12-27, util/KeyWordUtil.java:12-29) invoked as
``LATERAL TABLE(SplitFunction(keywords))``. Spark has no UDTF; the
equivalent is a function returning ``array<string>`` + ``explode``.

Two tiers:
- ``tokenize_col``   — pure Column expression (lower + regex split); stays
  JVM-side, oracle-expressible in ANSI SQL, deterministic. Default path.
- ``tokenize_udf``   — Python path that uses ``jieba`` when importable
  (real CJK segmentation) and degrades to the same deterministic regex
  fallback — mirroring the reference's catch-and-emit-raw behavior at
  func/SplitFunction.java:22-24. Arrow-batched (``pandas_udf``): rows
  cross the JVM↔Python boundary in columnar batches instead of
  per-row pickled tuples (~10-100× less serialization overhead); the
  per-ROW semantics — including the catch-and-emit-raw error path —
  are unchanged, as each batch element still goes through
  ``_tokenize_py``.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_FALLBACK_RE = re.compile(r"[^0-9a-z一-鿿]+")

try:  # pragma: no cover - jieba not in the test image
    import jieba  # type: ignore

    _HAVE_JIEBA = True
except Exception:  # pragma: no cover
    jieba = None
    _HAVE_JIEBA = False


def tokenize_col(col: Column | str) -> Column:
    """JVM-side tokenizer: lowercase, split on anything that is neither
    alphanumeric nor CJK, drop empties. CJK codepoints (一-鿿) survive
    the split so Chinese search terms — the reference's primary
    IK-analyzer use case — emit keywords instead of vanishing; without
    a segmenter a CJK run stays one token (the same degradation as the
    reference's error path at func/SplitFunction.java:22-24, which the
    jieba-backed ``tokenize_udf`` upgrades when available)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^0-9a-z一-鿿]+"), lambda w: w != "")


def _tokenize_py(text: str | None) -> list[str]:
    if not text:
        return []
    try:
        if _HAVE_JIEBA:
            toks = [t.strip().lower() for t in jieba.cut(text, cut_all=False)]
            return [t for t in toks if t and not _FALLBACK_RE.fullmatch(t)]
        toks = _FALLBACK_RE.split(text.lower())
        return [t for t in toks if t]
    except Exception:
        # same degradation as the reference: emit the raw keyword
        return [text]


def _tokenize_batch(texts: pd.Series) -> pd.Series:
    return texts.map(_tokenize_py)


tokenize_udf = F.pandas_udf(_tokenize_batch, ArrayType(StringType()))
