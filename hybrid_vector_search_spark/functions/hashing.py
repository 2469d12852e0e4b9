"""Engine-portable hash expressions (MD5-based).

Deduplication operators (MinHash, SimHash, fingerprints) need hash values that
the DuckDB correctness oracle can reproduce bit-for-bit. Spark's native
``hash()``/``xxhash64()`` use engine-private seeds, so every portable hash
here is derived from ``md5`` hex strings, which both engines compute
identically. Fixed-width lowercase hex strings compare lexicographically in
numeric order, so ``min(md5(...))`` is a valid MinHash without any numeric
conversion.

Scale note: md5-of-short-string is cheap relative to the shuffle these
operators feed; at 100 TB the cost center is the explode + groupBy, not the
hash. A production deployment could swap in xxhash64 (single engine, faster);
the operator shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(c: Column) -> Column:
    return F.md5(c.cast("string"))


def seeded_md5(c: Column, seed: int) -> Column:
    """Independent-ish hash family member: md5(seed || '#' || value)."""
    return F.md5(F.concat(F.lit(f"{seed}#"), c.cast("string")))


def md5_bit(c: Column, seed: int, bit: int) -> Column:
    """One bit (0/1) of the seeded hash: nibble ``bit//4``, mask ``bit%4``.

    Extracted via hex-digit lookup so the same expression is a one-liner in
    the SQL oracle: ``(('0x' || substr(md5(..), p, 1))::int >> s) & 1``.
    """
    nibble = F.conv(F.substring(seeded_md5(c, seed), bit // 4 + 1, 1), 16, 10).cast("int")
    return F.shiftright(nibble, bit % 4).bitwiseAND(F.lit(1))
