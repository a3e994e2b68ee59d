"""Interactive SQL surface (M6, `Trainer.scala:110-121`).

The reference embeds a ``%sql``-prefixed REPL (from sparkbook) used
for data staging and exploration, with a default command and a
continue predicate. This is the same surface as a thin programmatic
wrapper: commands prefixed ``%sql`` run against the session catalog
(temp views registered by ``sources.register_views`` or staging
``CREATE TEMPORARY VIEW`` statements — S2/S3/S4)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class SqlRepl:
    def __init__(
        self,
        spark: SparkSession,
        default_cmd: str | None = None,
        should_continue: Callable[[int], bool] | None = None,
    ):
        self.spark = spark
        self.default_cmd = default_cmd
        self.should_continue = should_continue or (lambda n: True)
        self.history: list[str] = []

    def run(self, command: str | None = None) -> DataFrame | None:
        """Execute one REPL command. ``%sql <stmt>`` (or bare SQL) runs
        through the session; empty input falls back to the default
        command (`Trainer.scala:112-116`)."""
        cmd = (command or "").strip() or (self.default_cmd or "")
        if not cmd:
            return None
        if cmd.startswith("%sql"):
            cmd = cmd[len("%sql") :].strip()
        self.history.append(cmd)
        return self.spark.sql(cmd)

    def loop(self, commands: list[str]) -> list[DataFrame | None]:
        out = []
        for i, cmd in enumerate(commands):
            if not self.should_continue(i):
                break
            out.append(self.run(cmd))
        return out
