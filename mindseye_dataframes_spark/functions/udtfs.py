"""Python UDTF surface (SURVEY §2A UDF/UDAF/UDTF row).

The engine's table-function extension point: one input row → many
output rows with an arbitrary Python generator, addressable from SQL
as ``LATERAL fn(col)``. This is deliberately the *slow* path — per-row
Python, no Arrow batching — so it exists as an API-surface
demonstration for logic that genuinely cannot be expressed as
built-ins or pandas UDFs; every hot-path exploder in this repo
(chunking q88, shingles, frame sampling) uses codegen
``explode``/``mapInPandas`` instead, and ``token_windows``'s own
oracle twin (q113) proves the built-in form computes the same rows.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="win_idx int, window_text string, n_tokens int")
class TokenWindows:
    """Sliding token windows: width 20, stride 15 — the overlapping-
    context-window shape an LLM pretokenizer emits."""

    WIDTH = 20
    STRIDE = 15

    def eval(self, text: str):
        if text is None:
            return
        toks = text.split(" ")
        i, win_idx = 0, 0
        while i < len(toks):
            win = toks[i : i + self.WIDTH]
            yield win_idx, " ".join(win), len(win)
            if i + self.WIDTH >= len(toks):
                break
            i += self.STRIDE
            win_idx += 1


def register_udtfs(spark) -> None:
    spark.udtf.register("token_windows", TokenWindows)
