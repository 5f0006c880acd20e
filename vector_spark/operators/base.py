"""Transform execution contracts (SURVEY.md §2.1).

Vector transforms implement FunctionTransform (stateless 1→0..N),
FallibleFunctionTransform (adds an error port), or TaskTransform
(stateful stream→stream) — /root/reference/lib/vector-core/src/transform/mod.rs:14-172.

Spark mapping: every operator here is a DataFrame → DataFrame stage
(narrow for function transforms, wide for task transforms). Fallible
transforms return an extra error branch; `route` returns a dict of
lanes. A pipeline is plain composition (Vector's `compound` transform,
src/transforms/compound.rs:58, is literally function composition here).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame


class Transform(ABC):
    """One pipeline stage. Stateless config in __init__, plan built in apply()."""

    @abstractmethod
    def apply(self, df: DataFrame) -> DataFrame: ...

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


class FallibleTransform(Transform):
    """Adds apply_with_errors → (ok, err) branch pair
    (FallibleFunctionTransform, transform/mod.rs:151-153)."""

    def apply_with_errors(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        raise NotImplementedError


def compose(*stages: Transform):
    """Vector `compound`: serial chain of steps (ExpandType::Serial,
    src/config/compiler.rs:105-151)."""

    def run(df: DataFrame) -> DataFrame:
        for s in stages:
            df = s.apply(df)
        return df

    return run
