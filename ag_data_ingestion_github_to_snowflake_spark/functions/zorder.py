"""Z-order (Morton) codes for multi-dimensional data skipping.

A range sort on one column gives tight parquet min/max on that column
only; sorting by the interleaved bits of TWO columns gives every file a
small bounding *box* in both dimensions, so predicates on either
column (or both) skip files. This is the public "OPTIMIZE ZORDER BY"
technique (Morton 1966; bit-spreading by binary magic numbers is the
classic public bit-twiddling method).

Pure bitwise column expressions — shiftleft/and/or on longs, ANSI-safe
(all intermediates stay far below 2^62), whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spread the low 16 bits of x so bit i lands at position 2i:
# successive (x | x<<s) & mask steps, s = 8,4,2,1.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(col: Column) -> Column:
    """Spread the low 16 bits of a non-negative long: bit i -> bit 2i."""
    x = col.bitwiseAND(F.lit(0xFFFF)).cast("long")
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_code(a: Column, b: Column) -> Column:
    """Interleave the low 16 bits of two non-negative long columns into
    a 32-bit Morton code: a's bits at even positions, b's at odd."""
    return spread_bits16(a).bitwiseOR(F.shiftleft(spread_bits16(b), 1))
