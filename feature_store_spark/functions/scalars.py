"""Scalar column expressions (SURVEY.md §2.8) with pinned cross-engine
semantics.

Parity notes (SURVEY.md §7.4):

- Weekend: PostgreSQL ``EXTRACT(DOW)`` is Sun=0..Sat=6 (reference
  `sql/transaction_features.sql:21`); Spark ``dayofweek`` is
  Sun=1..Sat=7. We pin weekend = {Saturday, Sunday} in both engines.
- Night window: the reference writes ``EXTRACT(HOUR ...) BETWEEN 22
  AND 6`` (`sql/transaction_features.sql:28`) which is vacuously false
  in PG; we implement the *intended* wrap-around semantics
  (hour >= 22 OR hour <= 6), a documented deviation.
- Ratios guard division by zero with NULL (reference ``NULLIF``
  denominators, `sql/transaction_features.sql:23-24`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_weekend(ts: Column) -> Column:
    """True when ts falls on Saturday/Sunday (Spark: Sun=1, Sat=7)."""
    return F.dayofweek(ts).isin(1, 7)


def is_night(ts: Column) -> Column:
    """Wrap-around night window: 22:00–06:59."""
    return (F.hour(ts) >= 22) | (F.hour(ts) <= 6)


def safe_ratio(num: Column, denom: Column) -> Column:
    """num/denom with NULL when denom is 0 (NULLIF semantics)."""
    return F.when(denom == 0, F.lit(None)).otherwise(num / denom)
