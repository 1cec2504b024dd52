"""Cross-engine-exact rounding expressions.

Python's ``round()`` (and Pillow's coordinate rounding) is HALF-EVEN;
Spark's ``F.round`` is half-up — they differ exactly at .5 ties, which is
enough to break bit-exact oracle parity. One shared expression so every
consumer (unit derivation grids, image crop coordinates) stays in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_even(c: Column, out_type: str = "double") -> Column:
    """Python ``round(x, 0)`` (banker's rounding) as a native expression:
    f = floor(x + 0.5); on an exact tie (f - x == 0.5) an odd f steps down
    to its even neighbour."""
    f = F.floor(c + F.lit(0.5))
    tie = (f.cast("double") - c) == F.lit(0.5)
    odd = F.pmod(f, F.lit(2)) == F.lit(1)
    return F.when(tie & odd, f - F.lit(1)).otherwise(f).cast(out_type)
