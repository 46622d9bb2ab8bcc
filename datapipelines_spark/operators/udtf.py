"""Python UDTF examples (Spark 3.5+): table functions for row-expanding
transforms that need imperative logic (SURVEY §2.10 UDF/UDAF/UDTF row).

UDTFs are the slow path (per-row Python); they exist for semantics the
relational operators can't express — here, a stateful text chunker whose
output length depends on accumulated content. For anything expressible with
explode/split, use those instead.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkText:
    """Greedy token-window chunker: split text into chunks of at most
    ``max_tokens`` whitespace tokens with ``overlap`` tokens of context
    carried between consecutive chunks — the standard RAG/pretraining
    document chunker."""

    def eval(self, text: str, max_tokens: int = 64, overlap: int = 8):
        if text is None:
            return
        toks = text.split()
        if not toks:
            return
        step = max(max_tokens - overlap, 1)
        idx = 0
        for start in range(0, len(toks), step):
            window = toks[start : start + max_tokens]
            yield idx, " ".join(window), len(window)
            idx += 1
            if start + max_tokens >= len(toks):
                break


def register_udtfs(spark) -> None:
    """Make the table functions callable from the SQL entry point."""
    spark.udtf.register("chunk_text", ChunkText)
