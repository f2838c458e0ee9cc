"""Source registry + collection filter DSL.

Spark-native analog of the reference's EE asset catalog
(/root/reference/geeflow/ee_data.py): named sources resolve to tables
(parquet/Iceberg paths) with band metadata and pre-filters, and the
FeatureCollection filter DSL (ee_data.py:1163-1186) compiles onto Spark
Column predicates with EXACTLY the same prefix grammar:

    (key, value)         -> equality             (list value -> inList)
    ("!key", v)          -> not-equal            (list value -> NOT inList)
    ("<key", v)/("<=key", v)/(">key", v)/(">=key", v) -> comparisons
    ("~key", v)          -> string contains
    ("!~key", v)         -> NOT string contains

Custom sources mirror CustomImage/CustomIC/CustomFC (ee_data.py:1123-1256):
any table path + optional filters + band list, with point-buffering
semantics for feature tables (ee_data.py:1187-1196).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def compile_filter(key: str, value: Any) -> Column:
    """One (key, value) DSL entry -> Spark Column predicate.

    Same dispatch order as the reference (ee_data.py:1163-1186): list
    values route to inList before any prefix parsing; prefix tests go
    <=, <, >=, >, !~, ~, !, then plain equality.
    """
    if isinstance(value, (tuple, list)):
        if key.startswith("!"):
            return ~F.col(key[1:]).isin(*value)
        return F.col(key).isin(*value)
    if key.startswith("<="):
        return F.col(key[2:]) <= value
    if key.startswith("<"):
        return F.col(key[1:]) < value
    if key.startswith(">="):
        return F.col(key[2:]) >= value
    if key.startswith(">"):
        return F.col(key[1:]) > value
    if key.startswith("!~"):
        return ~F.col(key[2:]).contains(value)
    if key.startswith("~"):
        return F.col(key[1:]).contains(value)
    if key.startswith("!"):
        return F.col(key[1:]) != value
    return F.col(key) == value


def apply_filters(df: DataFrame,
                  filters: Sequence[tuple[str, Any] | Column] | None
                  ) -> DataFrame:
    """Filters are DSL (key, value) pairs or raw Column predicates.

    Raw Columns (or zero-arg callables returning one, for predicates
    declared before a SparkSession exists) cover what the prefix DSL
    can't express, e.g. list-typed metadata equality (Sentinel-1's
    transmitterReceiverPolarisation == ['VV','VH'], ee_data.py:116-127).
    """
    for f in (filters or ()):
        if callable(f) and not isinstance(f, Column):
            f = f()
        df = df.filter(f if isinstance(f, Column)
                       else compile_filter(f[0], f[1]))
    return df


@dataclasses.dataclass
class TableSource:
    """A named source: table path + band metadata + standing filters.

    Mirrors an EeData subclass: `bands` ≙ BANDS, `vis_bands` ≙ VIS_BANDS,
    `filters` ≙ the source's filterMetadata chain (e.g. Sentinel1's
    instrumentMode/polarisation filters, ee_data.py:116-127).
    """
    name: str
    path: str | None = None
    bands: Sequence[str] = ()
    vis_bands: Sequence[str] = ()
    filters: Sequence[tuple[str, Any] | Column] | None = None
    kind: str = "ic"  # ic (time-series raster) | im (single) | fc (vector)
    ts_col: str = "ts"
    # Alternative to `path`: a callable producing the table (synth-backed
    # catalog entries, derived demo tables). Standing filters still apply.
    loader: Any = None

    def load(self, spark: SparkSession) -> DataFrame:
        if self.loader is not None:
            df = self.loader(spark)
        else:
            if not self.path:
                raise ValueError(f"Source `{self.name}` has no path/loader")
            df = spark.read.parquet(self.path)
        return apply_filters(df, self.filters)

    def select_bands(self, df: DataFrame,
                     bands: Sequence[str] | None = None) -> DataFrame:
        """Ordered band projection with name validation (the reference
        validates selected bands against available names,
        pipelines.py:226-250)."""
        bands = list(bands or self.bands)
        available = set(df.columns)
        missing = [b for b in bands if b not in available]
        if missing:
            raise ValueError(f"Bands {missing} not in source "
                             f"`{self.name}` (has {sorted(available)})")
        keep = [c for c in df.columns if c not in set(self.bands)
                or c in bands]
        return df.select(*[c for c in keep if c not in bands], *bands)


class Registry:
    """Name -> TableSource map (≙ the module-level catalog in ee_data)."""

    def __init__(self):
        self._sources: dict[str, TableSource] = {}

    def register(self, src: TableSource) -> TableSource:
        self._sources[src.name] = src
        return src

    def get(self, name: str) -> TableSource:
        if name not in self._sources:
            raise KeyError(f"Unknown source `{name}`; have "
                           f"{sorted(self._sources)}")
        return self._sources[name]

    def names(self) -> list[str]:
        return sorted(self._sources)


DEFAULT_REGISTRY = Registry()
