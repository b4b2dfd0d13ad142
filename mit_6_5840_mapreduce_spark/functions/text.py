"""Text primitives shared by the MR-surface queries and the text-analysis
operators.

Tokenizer parity contract (reference ``src/mrapps/wc.go:21-24``): a token is
a maximal run of Unicode letters — Go ``strings.FieldsFunc(s, !unicode.
IsLetter)``. In Spark/Java regex and in DuckDB/RE2 alike that is splitting
on ``[^\\p{L}]+`` and dropping empty strings; both engines agree on the
Unicode `L` property, which the test corpus exercises with non-ASCII docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Split pattern whose complement-class is exactly Go unicode.IsLetter.
TOKEN_SPLIT_RE = r"[^\p{L}]+"


def tokenize(text: Column) -> Column:
    """Array of letter-run tokens (empties removed), JVM-side only."""
    return F.filter(F.split(text, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def tokens_df(documents: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Explode documents into one row per token occurrence.

    This is the engine's equivalent of the reference map phase for wc /
    indexer (``src/mrapps/wc.go:19-32``, ``src/mrapps/indexer.go:20-31``):
    a narrow, codegen'd projection — no shuffle, no Python.
    """
    return documents.select(
        F.col(id_col),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    )
