"""Cross-engine PORTABLE hashing for dedup sketches.

Spark's ``xxhash64`` has no DuckDB twin, which is what kept
dedup_minhash / dedup_simhash rows-only (VERDICT r3 item 2). Both
engines DO agree on md5 of the same string, and both can read a 15-hex
prefix as an integer:

- Spark : ``conv(substring(md5(s), 1, 15), 16, 10)`` cast BIGINT
- DuckDB: ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``

15 hex chars = 60 bits < 2^63, so the value is non-negative and exact
in BIGINT on both sides (probed: both return 648541476951500027 for
'abc'). MinHash then derives its hash family with the classical
universal-hash construction h_i(x) = (a_i·x + b_i) mod p over
p = 2^31 − 1: products stay < 2^62, so 64-bit integer arithmetic is
exact on both engines — the oracle is bit-identical, not approximate.

The Spark expression and the SQL fragment live side by side HERE so
they cannot drift apart; coefficients come from one deterministic
formula evaluated in Python and inlined into both plans as literals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)

# odd multiplicative constants (Knuth / xxhash golden-ratio primes) —
# only used to derive a deterministic, well-spread coefficient family
_MULT_A = 0x9E3779B1
_MULT_B = 0x85EBCA77


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for h_i(x) = (a_i x + b_i) mod p,
    a_i never 0 mod p."""
    out = []
    for i in range(num_hashes):
        a = ((i + 1) * _MULT_A) % MINHASH_P or 1
        b = ((i + 1) * _MULT_B + 0x27D4EB2F) % MINHASH_P
        out.append((a, b))
    return out


def portable_hash60(col: Column) -> Column:
    """60-bit md5-prefix hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def sql_hash60(expr: str) -> str:
    """The SAME 60-bit hash as a DuckDB SQL fragment."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
