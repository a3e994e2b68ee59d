"""The engine's declared query surface.

Every operator from SURVEY.md §2 is declared here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) the equivalent ANSI SQL the DuckDB
oracle runs on the same parquet tables. ``__spark_entry__.py`` simply
re-exports this registry.
"""

from __future__ import annotations

import importlib

from mindseye_dataframes_spark.queries.registry import REGISTRY, Query, query  # noqa: F401

_MODULES = (
    "relational",
    "windows",
    "featurize",
    "dedup",
    "similarity",
    "text",
    "timeseries",
    "multimodal",
    "scalars",
    "joins_extra",
    "json_props",
    "suppliers",
    "pipeline",
    "pivot",
    "sources_formats",
    "subqueries",
    "maps_stats",
    "curation",
)
_loaded = False


def load_all() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry."""
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            try:
                importlib.import_module(f"mindseye_dataframes_spark.queries.{mod}")
            except ModuleNotFoundError as exc:
                # allow partial builds while modules land incrementally
                if f"queries.{mod}" not in str(exc):
                    raise
        _loaded = True
    return REGISTRY
