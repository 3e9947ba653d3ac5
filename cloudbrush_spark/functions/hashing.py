"""Content-addressed hashing helpers shared by the dedup / LSH operators.

md5-based constructions are used where engine-portability matters (the
same expression is computable in any SQL engine, enabling oracle checks);
xxhash64 where only Spark-side speed matters (SimHash, salting, seeded
symmetry-breaking a la src/Brush/PairMark.java:61-72).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_keyed(seed: Column | int, value: Column) -> Column:
    """Portable keyed hash: md5(seed || '|' || value)."""
    seed_col = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    return F.md5(F.concat_ws("|", seed_col, value))


def seeded_coin(id_col: Column, seed: int) -> Column:
    """Deterministic boolean coin per id for symmetry breaking
    (reference: hash(nodeid) ^ randseed, src/Brush/PairMark.java:61-72)."""
    return (F.xxhash64(id_col, F.lit(seed)) % 2 == 0)


def salt(col: Column, buckets: int) -> Column:
    """Skew salt in [0, buckets) derived from the row content."""
    return F.pmod(F.xxhash64(col), F.lit(buckets))
