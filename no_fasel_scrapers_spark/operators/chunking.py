"""Document chunking — fixed-size token windows for training pipelines.

Splits each document's text into whitespace-token chunks of ``size`` tokens
advancing by ``stride`` (= size - overlap), the standard pre-tokenization
shaping step for LLM training corpora.  Pure column expressions end to end:
tokenize once (``split``), generate window starts (``sequence``), explode,
slice — no UDF, whole-stage codegen, and the explode keeps the work
row-parallel so a 100 TB corpus chunks in one pass with no shuffle at all
(narrow dependency; chunks inherit the parent row's partition).

No reference analog (the reference emits whole records); this belongs to
the training-data operator family the engine adds on top (README coverage
map, "training:" rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """One row per (doc, chunk): (id, chunk_id, n_tokens, chunk_text).

    ``stride`` defaults to ``size`` (no overlap).  The final window is kept
    if it contains at least one token; windows are never padded.  Documents
    whose text is null/empty produce no rows.
    """
    stride = size if stride is None else stride
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks: Column = F.split(F.trim(F.col(text_col)), r"\s+")
    n: Column = F.size(toks)
    # window starts: 0, stride, 2*stride, ... while start < n
    n_chunks = F.when(
        n > 0, F.ceil(n.cast("double") / F.lit(stride)).cast("int")
    ).otherwise(F.lit(0))
    # cap: a start inside the last `size` tokens only counts if it adds
    # tokens beyond the previous window — with stride <= size every start
    # < n yields a non-empty window, which is exactly ceil(n / stride)
    base = docs.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(
        F.col(id_col),
        toks.alias("__toks"),
        n_chunks.alias("__n_chunks"),
    )
    return base.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("__n_chunks") - 1),
                lambda i: F.slice(F.col("__toks"), i * stride + 1, size),
            )
        ).alias("chunk_id", "__chunk"),
    ).select(
        id_col,
        "chunk_id",
        F.size("__chunk").alias("n_tokens"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )
