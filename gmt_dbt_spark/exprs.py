"""Shared expression helpers for oracle-exact arithmetic.

Floating-point sums are order-dependent; Spark and DuckDB will not
reduce doubles in the same order, so any double SUM/AVG would be a
coin-flip on the driver's value-hash compare. Decimal arithmetic is
exact and associative, so we aggregate in DECIMAL and cast the final
value back to double on both sides.

The decimal→double cast itself must go THROUGH A STRING: DuckDB
casts wide decimals to double as int128→double followed by a divide
by 10^scale (two roundings — off by 1 ulp once the unscaled value
exceeds 2^53), while Spark's BigDecimal.doubleValue is correctly
rounded. Decimal→string is exact in both engines and string→double
is a correctly-rounded IEEE parse in both (Java Double.parseDouble,
DuckDB fast_float), so `CAST(CAST(x AS VARCHAR) AS DOUBLE)` is
bit-identical across engines at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for SF-100TB sums (25 integer digits), exact to 1e-6.
DEC = "decimal(25,6)"


def dec2dbl(c: Column) -> Column:
    """Exact-decimal → double via the string route (see module doc)."""
    return c.cast("string").cast("double")


def dsum(c: Column | str) -> Column:
    """Order-independent SUM of a double column, returned as double.

    DuckDB twin: CAST(CAST(SUM(CAST(x AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE)
    """
    col = F.col(c) if isinstance(c, str) else c
    return dec2dbl(F.sum(col.cast(DEC)))


def davg(c: Column | str) -> Column:
    """Order-independent AVG as exact-sum / exact-count (double division
    of two identical operands is deterministic).

    DuckDB twin:
      CAST(CAST(SUM(CAST(x AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / COUNT(x)
    """
    col = F.col(c) if isinstance(c, str) else c
    return dec2dbl(F.sum(col.cast(DEC))) / F.count(col)


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount), computed exactly.

    DuckDB twin:
      CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))
    """
    return F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,6)")


def dsum_rev(alias: str = "revenue") -> Column:
    """SUM(revenue_expr) as double — the TPC-H revenue aggregate.

    DuckDB twin:
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * CAST(1 - l_discount AS DECIMAL(18,6))) AS VARCHAR)
           AS DOUBLE) AS <alias>
    """
    return dec2dbl(F.sum(revenue_expr())).alias(alias)
