"""Enrichment tables → broadcast hash joins.

Reference semantics (/root/reference/src/enrichment_tables/file.rs:14-44,
353-380, 415-479 and /root/reference/lib/enrichment/src/lib.rs:18-43):
- a small CSV/dimension table loaded in memory with hash indexes on the
  lookup key subset;
- `get_enrichment_table_record` errors unless EXACTLY one row matches;
- conditions are AND-ed equality (+ optional date-range);
- case-insensitive option normalizes the key.

Spark: `df.join(broadcast(dim), keys, "left")`. The hash index IS the
broadcast hash join's build side. The ≠1-row contract becomes an eager
uniqueness assertion on the dimension table (cheap: dim is small by
definition). Date-range conditions become range predicates in the join
condition — still broadcastable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class EnrichmentTable:
    def __init__(self, dim: DataFrame, keys: list[str], case_insensitive: bool = False):
        self.keys = list(keys)
        self.case_insensitive = case_insensitive
        if case_insensitive:
            for k in self.keys:
                dim = dim.withColumn(k, F.lower(F.col(k)))
        self.dim = dim

    def assert_unique(self) -> None:
        """find_table_row's exactly-one-row contract (lib.rs:37-43)."""
        dupes = self.dim.groupBy(*self.keys).count().filter(F.col("count") > 1)
        bad = dupes.take(1)
        if bad:
            raise ValueError(f"enrichment table not unique on {self.keys}: {bad}")

    def enrich(self, df: DataFrame, how: str = "left", date_between: tuple[str, str, str] | None = None) -> DataFrame:
        """Broadcast-join enrichment. ``date_between=(event_col, from_col,
        to_col)`` adds the BetweenDates range condition (lib.rs:18-27)."""
        left = df
        join_keys: Column | None = None
        for k in self.keys:
            lcol = F.lower(left[k]) if self.case_insensitive else left[k]
            cond = lcol == self.dim[k]
            join_keys = cond if join_keys is None else (join_keys & cond)
        if date_between:
            ev, lo, hi = date_between
            join_keys = join_keys & (left[ev] >= self.dim[lo]) & (left[ev] < self.dim[hi])
        joined = left.join(F.broadcast(self.dim), on=join_keys, how=how)
        # drop the duplicated key columns from the dim side
        return joined.drop(*[self.dim[k] for k in self.keys])


def geoip_enrich(df: DataFrame, ip_col: str, cidr_table: DataFrame, target_prefix: str = "geoip_") -> DataFrame:
    """`geoip` transform (/root/reference/src/transforms/geoip.rs:13-18)
    re-expressed as a broadcast range join on integer IP bounds.

    ``cidr_table`` columns: ip_lo bigint, ip_hi bigint, + attribute
    columns (city, country, isp, ...). The mmdb point-lookup becomes a
    broadcast interval join; unresolvable IPs keep null attributes
    (Vector writes empty strings — callers can coalesce)."""
    from vector_spark.functions.ip import ip_aton

    attrs = [c for c in cidr_table.columns if c not in ("ip_lo", "ip_hi")]
    dim = cidr_table.select(
        "ip_lo", "ip_hi", *[F.col(c).alias(f"{target_prefix}{c}") for c in attrs]
    )
    addr = ip_aton(df[ip_col])
    joined = df.join(
        F.broadcast(dim), on=(addr >= dim.ip_lo) & (addr <= dim.ip_hi), how="left"
    )
    return joined.drop("ip_lo", "ip_hi")


def ec2_metadata_stamp(df: DataFrame, metadata: dict[str, str], prefix: str = "") -> DataFrame:
    """`aws_ec2_metadata` (/root/reference/src/transforms/aws_ec2_metadata.rs:24-35):
    per-interval IMDS fetch stamped onto every event. In batch the fetch
    happens driver-side once per run; stamping is lit() columns (zero
    per-row cost, constant-folded by Catalyst)."""
    for k, v in metadata.items():
        df = df.withColumn(f"{prefix}{k}", F.lit(v))
    return df


class Ec2Metadata:
    """`aws_ec2_metadata` as a first-class transform
    (/root/reference/src/transforms/aws_ec2_metadata.rs:24-35): the
    reference polls IMDS on an interval and stamps the current values
    onto every event. Batch mapping: ONE driver-side fetch per run →
    `lit()` columns (constant-folded; zero per-row cost).

    `fetcher` is injectable: the default raises in this sandbox (no
    IMDS endpoint) — pass a dict-returning callable, e.g. a cached
    `urllib` read of http://169.254.169.254/latest/meta-data/ on a real
    instance. `fields` limits which keys are stamped (the reference's
    field allowlist)."""

    DEFAULT_FIELDS = (
        "instance-id", "local-hostname", "local-ipv4", "public-hostname",
        "public-ipv4", "ami-id", "availability-zone", "region",
    )

    def __init__(self, fetcher=None, fields: list[str] | None = None, prefix: str = ""):
        self.fetcher = fetcher
        self.fields = list(fields) if fields is not None else list(self.DEFAULT_FIELDS)
        self.prefix = prefix

    def fetch(self) -> dict[str, str]:
        if self.fetcher is None:
            raise RuntimeError(
                "no IMDS endpoint in this environment — inject `fetcher` "
                "(callable returning {field: value})"
            )
        return self.fetcher()

    def apply(self, df: DataFrame) -> DataFrame:
        meta = self.fetch()
        picked = {k: v for k, v in meta.items() if k in self.fields}
        # column names follow the reference's underscored keys
        return ec2_metadata_stamp(
            df, {k.replace("-", "_"): v for k, v in picked.items()}, prefix=self.prefix
        )
