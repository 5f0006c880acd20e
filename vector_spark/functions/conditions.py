"""Vector condition predicates → Spark boolean Columns.

Vector's `check_fields` condition surface (predicate names at
/root/reference/src/conditions/check_fields.rs:436-458) and bare-string
VRL boolean conditions compile here to Column predicates used by the
`filter` and `route` transforms and by unit-test assertions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.functions.ip import ip_cidr_contains


def equals(col: Column, value) -> Column:
    return col == F.lit(value)


def not_equals(col: Column, value) -> Column:
    return col != F.lit(value)


def contains(col: Column, value: str) -> Column:
    return col.contains(value)


def prefix(col: Column, value: str) -> Column:  # alias starts_with
    return col.startswith(value)


starts_with = prefix


def ends_with(col: Column, value: str) -> Column:
    return col.endswith(value)


def exists(col: Column) -> Column:
    return col.isNotNull()


def regex(col: Column, pattern: str) -> Column:
    return col.rlike(pattern)


def length_eq(col: Column, n: int) -> Column:
    """strings/arrays/maps: Vector's length_eq checks the container size."""
    return F.length(col) == n if n is not None else F.lit(False)


def array_length_eq(col: Column, n: int) -> Column:
    return F.size(col) == n


def cidr(col: Column, cidr_block: str) -> Column:
    return ip_cidr_contains(col, cidr_block)


#: registry mirroring check_fields predicate names (check_fields.rs:436-458)
PREDICATES = {
    "eq": equals,
    "equals": equals,
    "neq": not_equals,
    "not_equals": not_equals,
    "contains": contains,
    "prefix": prefix,
    "starts_with": starts_with,
    "ends_with": ends_with,
    "exists": lambda col, v=True: col.isNotNull() if v else col.isNull(),
    "regex": regex,
    "ip_cidr_contains": cidr,
    "length_eq": length_eq,
}


def check_fields(spec: dict[str, object]) -> Column:
    """Compile a `check_fields` spec {"field.predicate": value, ...} into
    one AND-ed Column (src/conditions/check_fields.rs semantics)."""
    conds = []
    for key, value in spec.items():
        field, _, pred = key.rpartition(".")
        if pred not in PREDICATES:
            raise KeyError(f"unknown check_fields predicate: {pred}")
        conds.append(PREDICATES[pred](F.col(field), value))
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out
