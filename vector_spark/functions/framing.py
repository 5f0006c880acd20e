"""Framing codecs: byte-stream chunks → individual message frames.

Reference: /root/reference/src/codecs/framers/*.rs — `bytes`,
`character_delimited`, `newline_delimited`, `length_delimited`,
`octet_counting` framers. In Spark-land most framing is already done by
the source (`spark.read.text` = newline framing), but a stream chunk
column that still carries several frames needs explicit unframing with
multi-emit (one row per frame — the same `explode()` shape as VRL
remap's array emission).

- `character_delimited` / `newline_delimited`: pure expressions
  (split + explode by the caller).
- `octet_counting` (RFC 6587 syslog-over-TCP: `<len> <payload>`
  repeated): variable-length prefixes make the scan inherently
  sequential per chunk, so it is an Arrow-batched pandas UDF returning
  `array<string>` — the documented procedural escape hatch, never
  row-at-a-time Python (octet_counting.rs).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed to resolve pandas_udf type hints
import pyspark.sql.functions as F
from pyspark.sql import Column


def character_delimited_frames(col: Column, delimiter: str) -> Column:
    """`character_delimited` framer: one chunk → array of frames.
    Callers `explode()` for per-frame rows. The delimiter is a literal
    character, not a regex (framers/character_delimited.rs)."""
    import re

    return F.split(col, re.escape(delimiter), -1)


def newline_delimited_frames(col: Column) -> Column:
    """`newline_delimited` framer (the `spark.read.text` default,
    exposed for chunks that arrive embedded)."""
    return F.split(col, r"\r?\n", -1)


def length_delimited_frames(col: Column) -> Column:
    """`length_delimited` framer: 4-byte big-endian length prefix over
    a BINARY chunk (framers/length_delimited.rs / tokio
    LengthDelimitedCodec defaults). Returns array<binary>; NULL on a
    truncated frame."""

    @F.pandas_udf("array<binary>")
    def _unframe(s: "pd.Series") -> "pd.Series":
        def go(chunk):
            if chunk is None:
                return None
            frames = []
            data = bytes(chunk)
            pos = 0
            while pos < len(data):
                if pos + 4 > len(data):
                    return None
                n = int.from_bytes(data[pos : pos + 4], "big")
                pos += 4
                if pos + n > len(data):
                    return None
                frames.append(data[pos : pos + n])
                pos += n
            return frames

        return s.map(go)

    return _unframe(col)


def octet_counting_frames(col: Column) -> Column:
    """`octet_counting` framer: `<len> <payload>` repeated, len = byte
    length of the payload (framers/octet_counting.rs). Returns
    array<string> (NULL on malformed prefixes / truncated payloads —
    the whole chunk is rejected, matching the framer erroring the
    connection)."""

    @F.pandas_udf("array<string>")
    def _unframe(s: "pd.Series") -> "pd.Series":
        def go(chunk):
            if chunk is None:
                return None
            frames = []
            data = chunk.encode("utf-8")
            pos = 0
            while pos < len(data):
                sp = data.find(b" ", pos)
                if sp < 0:
                    return None
                try:
                    n = int(data[pos:sp])
                except ValueError:
                    return None
                start = sp + 1
                if n < 0 or start + n > len(data):
                    return None
                frames.append(data[start : start + n].decode("utf-8", "replace"))
                pos = start + n
            return frames

        return s.map(go)

    return _unframe(col)
