"""VRL object/path functions over map columns.

Vector's LogEvent is a dynamic nested map; our rows are typed columns
plus a `map<string,string>` attributes column for the dynamic residue
(SURVEY §1.3). These are the VRL object functions for that column:
get / set / del(remove) / merge / only_fields / unnest / compact —
all pure Column expressions (map_concat / map_filter / explode).

References: lib/vrl/stdlib/src/{get,set,del,merge,only_fields,unnest,
compact}.rs and the path ops in lib/vector-core/src/event/util/log.rs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def get_path(m: Column, key: str) -> Column:
    """VRL get(value, path) — missing key → NULL (get.rs)."""
    return F.element_at(m, key)


def set_path(m: Column, key: str, value: Column) -> Column:
    """VRL set: insert-or-overwrite one key (set.rs). Existing key is
    filtered first so the result never carries duplicates regardless of
    mapKeyDedupPolicy."""
    cleaned = F.map_filter(m, lambda k, _v: k != F.lit(key))
    return F.map_concat(cleaned, F.create_map(F.lit(key), value.cast("string")))


def del_path(m: Column, keys: list[str]) -> Column:
    """VRL del / remove: drop keys (del.rs)."""
    arr = F.array(*[F.lit(k) for k in keys])
    return F.map_filter(m, lambda k, _v: ~F.array_contains(arr, k))


def merge_maps(a: Column, b: Column) -> Column:
    """VRL merge(to, from): b's keys win on collision (merge.rs shallow
    mode). a's colliding keys are filtered before concat."""
    b_keys = F.map_keys(b)
    cleaned = F.map_filter(a, lambda k, _v: ~F.array_contains(b_keys, k))
    return F.map_concat(cleaned, b)


def only_fields(m: Column, keys: list[str]) -> Column:
    """VRL only_fields: keep listed keys (only_fields.rs)."""
    arr = F.array(*[F.lit(k) for k in keys])
    return F.map_filter(m, lambda k, _v: F.array_contains(arr, k))


def compact_map(m: Column) -> Column:
    """VRL compact over an object: drop null/empty-string values
    (compact.rs null/empty semantics for the map case)."""
    return F.map_filter(m, lambda _k, v: v.isNotNull() & (v != ""))


def unnest(df: DataFrame, array_col: str, keep: list[str] | None = None) -> DataFrame:
    """VRL unnest: one event per array element (unnest.rs) — explode.
    Multi-emit transforms (e.g. the cloudwatch subscription fan-out)
    compose on this."""
    cols = keep if keep is not None else [c for c in df.columns if c != array_col]
    return df.select(*cols, F.explode(array_col).alias(array_col))
