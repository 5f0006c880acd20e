"""Probabilistic (Bloom-filter) `tag_cardinality_limit` — streaming form.

Reference: /root/reference/src/transforms/tag_cardinality_limit.rs:25-54:
`mode = "probabilistic"` tracks seen tag values in a Bloom filter of
`cache_size_per_tag` bytes instead of an exact set, trading false
positives ("value claimed already-seen" → accepted past the true limit
boundary is impossible; the FP direction here is a NEW value treated as
seen, i.e. accepted without consuming a slot) for bounded memory.
First-seen is ARRIVAL order — that only exists in a stream, so this is
the Structured Streaming side of the operator; the batch operator
(`operators.tag_cardinality_limit`) is the exact mode with
min-event-time as the deterministic "first seen".

Spark mapping: one `applyInPandasWithState` group per limited tag key.
Within a key the decision sequence is inherently serial (Vector runs the
whole transform on one task too); across keys it parallelizes. State is
the Bloom bit array (fixed `cache_bytes`) + accepted count — bounded
regardless of how many distinct values flood in, which is the entire
point of the probabilistic mode.
"""

from __future__ import annotations

import hashlib

import numpy as np

_N_HASHES = 4


def _bloom_positions(value: str, m_bits: int) -> list[int]:
    """k=4 bit positions from independent blake2b digests (salted)."""
    out = []
    for i in range(_N_HASHES):
        h = hashlib.blake2b(value.encode(), digest_size=8, salt=bytes([i])).digest()
        out.append(int.from_bytes(h, "big") % m_bits)
    return out


def bloom_contains(bits: np.ndarray, value: str) -> bool:
    m = len(bits) * 8
    return all(bits[p >> 3] & (1 << (p & 7)) for p in _bloom_positions(value, m))


def bloom_add(bits: np.ndarray, value: str) -> None:
    m = len(bits) * 8
    for p in _bloom_positions(value, m):
        bits[p >> 3] |= 1 << (p & 7)


def streaming_tag_cardinality_limit(
    events,
    tag: str,
    value_limit: int = 500,
    action: str = "drop_tag",
    cache_bytes: int = 4096,
    order_col: str = "ts",
):
    """Bloom-mode cardinality cap over a streaming DataFrame.

    Emits the input rows (append mode) with the over-cap action applied:
    drop_tag nulls the tag, drop_event omits the row. Pass-through
    columns: everything in `events`. Rows inside a micro-batch are
    ordered by `order_col` to pin "arrival" deterministically under
    shuffle (Vector's arrival order is per-stream; a distributed batch
    must re-establish one).
    """
    assert action in ("drop_tag", "drop_event")
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd

    cols = events.columns
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in events.schema.fields)
    state_schema = "bits binary, n long"

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        if state.exists:
            raw, n = state.get
            bits = np.frombuffer(raw, dtype=np.uint8).copy()
        else:
            bits, n = np.zeros(cache_bytes, dtype=np.uint8), 0
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col).reset_index(drop=True)
            keep = np.ones(len(pdf), dtype=bool)
            vals = pdf[tag].astype(object)
            for i, v in enumerate(vals):
                if v is None:
                    continue
                if bloom_contains(bits, v):
                    continue
                if n < value_limit:
                    bloom_add(bits, v)
                    n += 1
                    continue
                if action == "drop_event":
                    keep[i] = False
                else:
                    vals.iat[i] = None
            out = pdf[keep].copy()
            if action == "drop_tag":
                out[tag] = vals[keep]
            if len(out):
                outs.append(out[cols])
        state.update((bits.tobytes(), n))
        yield from outs

    keyed = events.withColumn("__tag_key", F.lit(tag))
    return (
        keyed.groupBy("__tag_key")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
