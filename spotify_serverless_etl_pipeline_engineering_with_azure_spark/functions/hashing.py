"""Deterministic cross-engine hashing primitives.

All dedup/similarity operators need token→integer hashes that are
IDENTICAL in Spark and in the DuckDB oracle. Engine-native hash
functions (xxhash64 vs duckdb hash) differ, so we build hashes from
md5 hex digests — byte-identical in every engine — and fold hex chars
to integers with exact 64-bit-safe arithmetic.

Scale note: md5 + conv are JVM codegen'd expressions; at 100 TB this is
a map-side transform with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 48-bit hash (12 hex chars): positive, products with 31-bit multipliers
# stay within int64 after reduction mod MERSENNE31.
HEX_CHARS = 12
MERSENNE31 = 2147483647  # 2^31 - 1, prime

# Fixed affine minhash parameters (a_j, b_j) mod MERSENNE31 — generated
# once with a fixed seed and inlined in BOTH the Spark plan and the
# DuckDB oracle so the signatures agree exactly.
MINHASH_PARAMS: list[tuple[int, int]] = [
    (1207840695, 1076931140), (1938772317, 652228388),
    (734620754, 1672539549), (1333208661, 342412903),
    (501647744, 224721540), (1388351634, 827404226),
    (1378266274, 684634889), (2105677583, 1614806409),
    (812720997, 1933444618), (1514014732, 1306037711),
    (968848094, 327773405), (734960364, 1404550264),
    (1396733162, 302606396), (524892855, 1532515476),
    (1784340994, 638369244), (894646766, 1032762258),
]
# 16 hashes → 8 bands × 2 rows (r=2 keeps band-collision probability
# j^2, high enough to surface candidates on low-similarity corpora).
MINHASH_ROWS_PER_BAND = 2
MINHASH_N_BANDS = len(MINHASH_PARAMS) // MINHASH_ROWS_PER_BAND


def md5_int48(col: Column) -> Column:
    """First 12 hex chars of md5 as a positive 48-bit long."""
    return F.conv(F.substring(F.md5(col), 1, HEX_CHARS), 16, 10).cast("long")


def sql_md5_int48(expr: str) -> str:
    """DuckDB fragment computing the identical 48-bit hash.

    Folds the 12 hex chars left-to-right: acc*16 + digit.
    """
    digit = f"(STRPOS('0123456789abcdef', SUBSTR(MD5({expr}), CAST(i AS INTEGER), 1)) - 1)"
    return (
        f"LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
        f"LIST_TRANSFORM(RANGE(1, {HEX_CHARS + 1}), i -> CAST({digit} AS BIGINT))), "
        f"(a, b) -> a * 16 + b)"
    )
