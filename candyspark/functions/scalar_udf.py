"""SCALAR pandas UDF surface — the Arrow-vectorized per-row escape hatch
(completing the engine's UDF taxonomy next to the GROUPED_AGG UDAFs in
``functions/udaf.py``, the grouped-map kernels in ``operators/``, the UDTF
in ``operators/udtf_ops.py`` and the mapInPandas/mapInArrow media kernels).

A scalar pandas UDF receives column CHUNKS as ``pandas.Series`` over Arrow
(one FFI transfer per batch, vectorized kernel body) — ~10-100× the
throughput of a row-at-a-time Python UDF, which this engine bans outright.
Still the slow path versus builtin Column expressions: use ONLY when the
kernel genuinely needs Python (here the point is the surface itself; the
regex counting below is deliberately also SQL-expressible so the whole
Arrow round trip sits under the DuckDB hash check, like the multimodal
kernels)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def syllable_count(text: pd.Series) -> pd.Series:
    """Maximal vowel-group runs per text (the classic syllable estimate) —
    vectorized ``Series.str.count`` over one Arrow batch."""
    return text.fillna("").str.lower().str.count(r"[aeiouy]+").astype("int64")


@pandas_udf("long")
def sentence_count(text: pd.Series) -> pd.Series:
    """Sentence-terminator runs, clamped to ≥ 1 (prose without terminal
    punctuation is one sentence)."""
    return text.fillna("").str.count(r"[.!?]+").clip(lower=1).astype("int64")


@pandas_udf("long")
def word_count_udf(text: pd.Series) -> pd.Series:
    """Whitespace-delimited word count (vectorized split-free form)."""
    return text.fillna("").str.count(r"\S+").astype("int64")
