"""`sample` transform: keep 1-in-rate events.

Reference: /root/reference/src/transforms/sample.rs:12-16, 107-138.
Vector's keyed mode decides by `seahash(key) % rate == 0` — deterministic
per key; positional mode uses a running counter; `exclude` bypasses
sampling; kept events are stamped with `sample_rate`.

Spark mapping (documented divergences, SURVEY.md §7 risks):
- keyed: xxhash64 instead of seahash (same contract: stable, uniform,
  key-deterministic). Narrow filter — no shuffle, scales linearly.
- modulo-keyed: for integer keys, plain pmod(key, rate) — fully
  SQL-portable (used by the DuckDB oracle).
- positional ("1 in N by arrival order") has no deterministic distributed
  equivalent; we offer Bernoulli `df.sample(fraction, seed)` instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform


def keyed_keep(key: Column, rate: int) -> Column:
    return F.pmod(F.xxhash64(key), F.lit(rate)) == 0


class Sample(Transform):
    def __init__(
        self,
        rate: int,
        key_field: str | None = None,
        exclude: Column | None = None,
        stamp_rate: bool = True,
        modulo: bool = False,
        seed: int = 42,
    ):
        self.rate, self.key_field, self.exclude = rate, key_field, exclude
        self.stamp_rate, self.modulo, self.seed = stamp_rate, modulo, seed

    def apply(self, df: DataFrame) -> DataFrame:
        if self.key_field is not None:
            key = df[self.key_field]
            keep = (
                F.pmod(key.cast("long"), F.lit(self.rate)) == 0
                if self.modulo
                else keyed_keep(key, self.rate)
            )
        else:
            # positional fallback: Bernoulli sample (documented divergence)
            keep = F.rand(self.seed) < (1.0 / self.rate)
        if self.exclude is not None:
            keep = keep | self.exclude  # excluded events bypass sampling
        out = df.filter(keep)
        if self.stamp_rate:
            out = out.withColumn("sample_rate", F.lit(self.rate))
        return out


class StratifiedSample(Transform):
    """Per-stratum sampling for training-mix construction: each value
    of `strata_field` gets its own 1-in-rate keep ratio (e.g. keep all
    rare `error` events, 1-in-100 `debug`). Same deterministic keyed
    decision as Sample (`pmod(key, rate) == 0` in modulo form), so
    re-runs and engines agree row-for-row; stamps the per-row
    `sample_rate` the way sample.rs stamps its rate field.

    One narrow filter — no shuffle; the rate map rides along as a
    literal map expression (strata counts are small by definition)."""

    def __init__(
        self,
        rates: dict[str, int],
        key_field: str,
        strata_field: str,
        default_rate: int = 1,
    ):
        self.rates, self.key_field = rates, key_field
        self.strata_field, self.default_rate = strata_field, default_rate

    def apply(self, df: DataFrame) -> DataFrame:
        rate_map = F.create_map(
            *[x for k, v in self.rates.items() for x in (F.lit(k), F.lit(int(v)))]
        )
        rate = F.coalesce(
            F.element_at(rate_map, F.col(self.strata_field)),
            F.lit(self.default_rate),
        )
        keep = F.pmod(F.col(self.key_field).cast("long"), rate) == 0
        return df.filter(keep).withColumn("sample_rate", rate)
