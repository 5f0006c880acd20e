"""MaxMind DB (.mmdb) → CIDR-range table: the geoip on-ramp.

Vector's `geoip` transform opens a MaxMind database and does per-event
point lookups (/root/reference/src/transforms/geoip.rs:13-18). The
Spark-first shape is the opposite: decode the database ONCE, driver-
side, into a (ip_lo, ip_hi, attrs...) range table, broadcast it, and
let `vector_spark.enrich.geoip_enrich` answer every lookup with a
codegen'd interval join — no per-row library calls, no mmdb on the
executors.

This module is a dependency-free reader of the public MaxMind DB file
format (spec: maxmind.github.io/MaxMind-DB/ — binary search tree +
data section + metadata section, all documented):

    rows = mmdb_to_rows("GeoLite2-Country.mmdb")   # [(cidr, {attrs})]
    dim  = mmdb_to_cidr_table(spark, path, fields=["country.iso_code"])
    out  = geoip_enrich(events, "client_ip", dim)

Only IPv4 ranges are emitted by default (the enrich join keys on the
uint32 form); IPv6 networks are surfaced via `mmdb_to_rows` for callers
that key on the (hi, lo) pair from functions.ip.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR_SIZE = 16


class MMDBError(ValueError):
    pass


class _Decoder:
    """Data-section decoder (spec §'Data Section Separator' onward)."""

    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base

    def decode(self, offset: int) -> tuple[Any, int]:
        ctrl = self.buf[offset]
        offset += 1
        type_num = ctrl >> 5
        if type_num == 0:  # extended type
            type_num = self.buf[offset] + 7
            offset += 1
        if type_num == 1:  # pointer
            size = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if size == 0:
                p = (v << 8) | self.buf[offset]
                offset += 1
            elif size == 1:
                p = (v << 16) | int.from_bytes(self.buf[offset:offset + 2], "big")
                p += 2048
                offset += 2
            elif size == 2:
                p = (v << 24) | int.from_bytes(self.buf[offset:offset + 3], "big")
                p += 526336
                offset += 3
            else:
                p = int.from_bytes(self.buf[offset:offset + 4], "big")
                offset += 4
            value, _ = self.decode(self.base + p)
            return value, offset

        size = ctrl & 0x1F
        if size == 29:
            size = 29 + self.buf[offset]
            offset += 1
        elif size == 30:
            size = 285 + int.from_bytes(self.buf[offset:offset + 2], "big")
            offset += 2
        elif size == 31:
            size = 65821 + int.from_bytes(self.buf[offset:offset + 3], "big")
            offset += 3

        if type_num == 2:  # utf8 string
            return self.buf[offset:offset + size].decode("utf-8"), offset + size
        if type_num == 3:  # double
            return struct.unpack(">d", self.buf[offset:offset + 8])[0], offset + 8
        if type_num == 4:  # bytes
            return self.buf[offset:offset + size], offset + size
        if type_num in (5, 6, 9):  # uint16 / uint32 / uint64
            return int.from_bytes(self.buf[offset:offset + size], "big"), offset + size
        if type_num == 7:  # map
            out = {}
            for _ in range(size):
                k, offset = self.decode(offset)
                v, offset = self.decode(offset)
                out[k] = v
            return out, offset
        if type_num == 8:  # int32
            raw = self.buf[offset:offset + size]
            val = int.from_bytes(raw, "big", signed=False)
            if size == 4 and val >= 1 << 31:
                val -= 1 << 32
            return val, offset + size
        if type_num == 10:  # uint128
            return int.from_bytes(self.buf[offset:offset + size], "big"), offset + size
        if type_num == 11:  # array
            out = []
            for _ in range(size):
                v, offset = self.decode(offset)
                out.append(v)
            return out, offset
        if type_num == 14:  # boolean (size IS the value)
            return bool(size), offset
        if type_num == 15:  # float
            return struct.unpack(">f", self.buf[offset:offset + 4])[0], offset + 4
        raise MMDBError(f"unsupported mmdb type {type_num}")


class MMDBReader:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        idx = self.buf.rfind(_METADATA_MARKER)
        if idx < 0:
            raise MMDBError("not a MaxMind DB file (metadata marker missing)")
        meta_dec = _Decoder(self.buf, idx + len(_METADATA_MARKER))
        self.metadata, _ = meta_dec.decode(idx + len(_METADATA_MARKER))
        self.record_size = self.metadata["record_size"]
        self.node_count = self.metadata["node_count"]
        self.ip_version = self.metadata["ip_version"]
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_base = self.tree_size + _DATA_SEPARATOR_SIZE
        self._decoder = _Decoder(self.buf, self.data_base)

    def _read_record(self, node: int, side: int) -> int:
        off = node * self.node_bytes
        rs = self.record_size
        if rs == 24:
            o = off + 3 * side
            return int.from_bytes(self.buf[o:o + 3], "big")
        if rs == 28:
            if side == 0:
                mid_hi = self.buf[off + 3] >> 4
                return (mid_hi << 24) | int.from_bytes(self.buf[off:off + 3], "big")
            mid_lo = self.buf[off + 3] & 0x0F
            return (mid_lo << 24) | int.from_bytes(self.buf[off + 4:off + 7], "big")
        if rs == 32:
            o = off + 4 * side
            return int.from_bytes(self.buf[o:o + 4], "big")
        raise MMDBError(f"unsupported record size {rs}")

    def _data_at(self, record: int) -> Any:
        offset = record - self.node_count - _DATA_SEPARATOR_SIZE + self.data_base
        value, _ = self._decoder.decode(offset)
        return value

    def networks(self) -> Iterator[tuple[int, int, Any]]:
        """Yield (prefix_as_int, prefix_len, record_dict) by DFS over
        the search tree. Bit width is 32 (v4 tree) or 128 (v6 tree)."""
        bits = 32 if self.ip_version == 4 else 128
        stack = [(0, 0, 0)]  # node, prefix, depth
        while stack:
            node, prefix, depth = stack.pop()
            for side in (0, 1):
                rec = self._read_record(node, side)
                child_prefix = (prefix << 1) | side
                if rec < self.node_count:  # interior node
                    stack.append((rec, child_prefix, depth + 1))
                elif rec == self.node_count:  # empty subtree
                    continue
                else:  # data record
                    net = child_prefix << (bits - depth - 1)
                    yield net, depth + 1, self._data_at(rec)


def _flatten(d: Any, prefix: str = "") -> dict[str, Any]:
    """{'country': {'iso_code': 'US'}} → {'country.iso_code': 'US'}."""
    out: dict[str, Any] = {}
    if isinstance(d, dict):
        for k, v in d.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            out.update(_flatten(v, key))
    else:
        out[prefix] = d
    return out


def mmdb_to_rows(path: str, ipv4_only: bool = True) -> list[tuple[int, int, dict]]:
    """Decode a .mmdb into [(ip_lo, ip_hi, flat_attrs)]. For a v6 tree,
    IPv4-mapped subtrees (::/96 and ::ffff:0:0/96) are projected down
    to uint32 ranges when ipv4_only; other v6 networks are skipped
    (pass ipv4_only=False to get 128-bit ints instead)."""
    reader = MMDBReader(path)
    bits = 32 if reader.ip_version == 4 else 128
    rows = []
    for net, plen, data in reader.networks():
        span = 1 << (bits - plen)
        lo, hi = net, net + span - 1
        if bits == 128 and ipv4_only:
            for base in (0, 0xFFFF << 32):  # ::a.b.c.d and ::ffff:a.b.c.d
                if lo >= base and hi <= base + 0xFFFFFFFF:
                    lo, hi = lo - base, hi - base
                    break
            else:
                continue
        elif bits == 128 and not ipv4_only:
            pass
        rows.append((lo, hi, _flatten(data)))
    return rows


def mmdb_to_cidr_table(spark, path: str, fields: list[str]):
    """The geoip on-ramp: .mmdb → DataFrame(ip_lo, ip_hi, <fields>...)
    ready for `enrich.geoip_enrich`. `fields` are flattened attribute
    paths ('country.iso_code', 'location.latitude'); column names swap
    '.' for '_'."""
    rows = []
    for lo, hi, attrs in mmdb_to_rows(path):
        rows.append((lo, hi, *[attrs.get(f) for f in fields]))
    cols = ", ".join(f"`{f.replace('.', '_')}` string" for f in fields)
    return spark.createDataFrame(rows, f"ip_lo long, ip_hi long, {cols}")
