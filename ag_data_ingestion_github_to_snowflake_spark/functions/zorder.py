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


def hilbert_index(x: Column, y: Column, order: int) -> Column:
    """Hilbert curve index of a (x, y) cell on a 2^order x 2^order
    grid — the locality-clustering key that strictly dominates Morton
    on neighbor distance (consecutive Hilbert positions are ALWAYS
    Manhattan-adjacent; Morton jumps at quadrant seams).

    Unrolls the classic iterative xy2d transform (Wikipedia/Warren,
    public domain): per round s = n/2..1, accumulate the quadrant
    digit and rotate/reflect the frame. Pure integer CASE/AND/XOR
    column expressions — whole-stage codegen, no UDF.
    """
    n = 1 << order
    d = F.lit(0).cast("long")
    for k in range(order - 1, -1, -1):
        s = 1 << k
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        # (3*rx) XOR ry as a CASE table: 00->0 01->1 11->2 10->3
        q = (
            F.when((rx == 0) & (ry == 0), F.lit(0))
            .when((rx == 0) & (ry == 1), F.lit(1))
            .when((rx == 1) & (ry == 1), F.lit(2))
            .otherwise(F.lit(3))
        )
        d = d + F.lit(s * s).cast("long") * q
        # rot(n, x, y, rx, ry): reflect in the FULL n-grid, then swap
        nx = (
            F.when(ry == 1, x)
            .when(rx == 1, F.lit(n - 1) - y)
            .otherwise(y)
        )
        ny = (
            F.when(ry == 1, y)
            .when(rx == 1, F.lit(n - 1) - x)
            .otherwise(x)
        )
        x, y = nx, ny
    return d


def hilbert_index_sql(x: str, y: str, order: int) -> str:
    """The identical xy2d unroll as an ANSI-SQL scalar expression
    builder: returns (select_fragments, round_count) chained CTE text.

    Emits a WITH-chain body: callers embed
    ``hilbert_index_sql("cx", "cy", 4)`` output between a source CTE
    named r0 (exposing columns x0, y0, d0 plus carried keys) and their
    final SELECT reading r{order} (columns x{order}, y{order},
    d{order}).
    """
    parts = []
    n = 1 << order
    for i, k in enumerate(range(order - 1, -1, -1)):
        s = 1 << k
        j = i + 1
        parts.append(
            f"""r{j} AS (
      SELECT *,
             d{i} + {s * s} * (CASE WHEN (x{i} & {s}) > 0 AND (y{i} & {s}) > 0 THEN 2
                               WHEN (x{i} & {s}) > 0 THEN 3
                               WHEN (y{i} & {s}) > 0 THEN 1
                               ELSE 0 END) AS d{j},
             CASE WHEN (y{i} & {s}) > 0 THEN x{i}
                  WHEN (x{i} & {s}) > 0 THEN {n - 1} - y{i}
                  ELSE y{i} END AS x{j},
             CASE WHEN (y{i} & {s}) > 0 THEN y{i}
                  WHEN (x{i} & {s}) > 0 THEN {n - 1} - x{i}
                  ELSE x{i} END AS y{j}
      FROM r{i}
    )"""
        )
    return ",\n    ".join(parts)
