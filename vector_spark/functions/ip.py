"""VRL IP functions as pure Spark SQL expressions (no UDFs).

VRL surface: ip_aton, ip_ntoa, ip_cidr_contains, ip_subnet
(/root/reference/lib/vrl/stdlib/src/ip_cidr_contains.rs:8 etc.).
IPv4 only — an IPv6 variant would use the same shape over two longs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ip_aton(col: Column) -> Column:
    """dotted-quad string → uint32 as long (NULL on malformed input)."""
    parts = F.split(col, r"\.")
    valid = (F.size(parts) == 4) & col.rlike(r"^(\d{1,3}\.){3}\d{1,3}$")
    # try_cast: ANSI mode (Spark 4 default) would throw on junk input
    octets = [F.get(parts, i).try_cast("long") for i in range(4)]
    in_range = F.lit(True)
    for o in octets:
        in_range = in_range & (o >= 0) & (o <= 255)
    value = octets[0] * 16777216 + octets[1] * 65536 + octets[2] * 256 + octets[3]
    return F.when(valid & in_range, value)


def ip_ntoa(col: Column) -> Column:
    """uint32 long → dotted-quad string."""
    return F.concat_ws(
        ".",
        (col / 16777216).cast("long") % 256,
        (col / 65536).cast("long") % 256,
        (col / 256).cast("long") % 256,
        col % 256,
    )


def ip_cidr_contains(col: Column, cidr_block: str) -> Column:
    """Is the IPv4 address in `col` inside `cidr_block` ('10.0.0.0/8')?
    Computed with integer masking — codegen'd, broadcast-free."""
    net_str, _, bits_str = cidr_block.partition("/")
    bits = int(bits_str) if bits_str else 32
    mask = 0xFFFFFFFF ^ ((1 << (32 - bits)) - 1) if bits < 32 else 0xFFFFFFFF
    net = _ipv4_to_int(net_str) & mask
    addr = ip_aton(col)
    return F.when(addr.isNotNull(), (addr.bitwiseAND(F.lit(mask)) == F.lit(net))).otherwise(F.lit(False))


def ip_subnet(col: Column, bits: int) -> Column:
    """Zero the host bits: '10.1.2.3'/8 → '10.0.0.0'."""
    mask = 0xFFFFFFFF ^ ((1 << (32 - bits)) - 1) if bits < 32 else 0xFFFFFFFF
    return ip_ntoa(ip_aton(col).bitwiseAND(F.lit(mask)))


def _ipv4_to_int(s: str) -> int:
    a, b, c, d = (int(x) for x in s.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d
