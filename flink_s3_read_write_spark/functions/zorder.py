"""Z-order (Morton) clustering key, pure Catalyst bit arithmetic.

Sorting a table by ONE column gives tight parquet row-group min/max
stats on that column only; filters on any other column read every row
group.  Interleaving the bits of two columns into a Morton code and
sorting by THAT gives useful (if looser) stats on BOTH columns — the
standard multi-dimensional clustering trick (Delta/Iceberg OPTIMIZE
ZORDER) — so a 100 TB table can serve selective filters on either
dimension from a fraction of its row groups.

The reference has no storage layout control at all (its sink is a
rolling text file, ``S3ReadWriteExample.java:30-38``); this is part of
the engine's mandated 100 TB extension surface.

Everything here is shiftleft/AND/OR on longs inside whole-stage
codegen — no UDF, no Python in the write path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Bit-spreading masks for 16 -> 32-bit expansion (classic Morton):
# after spreading, bit i of the input sits at bit 2i of the output.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` so bit i lands at bit 2i."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder2(a: Column, b: Column) -> Column:
    """32-bit Morton code interleaving the low 16 bits of two columns.

    Inputs should be pre-scaled to [0, 65535] (e.g. ``F.ntile`` ranks,
    modulo buckets, or ``floor((x - min) / range * 65536)``); the code
    only looks at the low 16 bits.  ``a`` occupies even bits, ``b``
    odd bits.
    """
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))
