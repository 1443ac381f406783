"""Bijective base-26 week-class labels (SURVEY.md §2 op 23).

The reference's missing ``new_class_list`` assigns consecutive
Excel-style letters a..z, aa, ab, ... to non-empty week bins in week
order (evidence: data_pair/L_out.csv runs a..ax). Here the rank comes
from ``dense_rank`` over the tiny distinct-week table and the letter
encoding is a pure Column expression (native, codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _chr(n: Column) -> Column:
    return F.char(n.cast("int"))


def base26_label(rank: Column) -> Column:
    """1-based rank -> bijective base-26 letters (1=a, 26=z, 27=aa, 702=zz,
    703=aaa). Three letters covers 18k weeks ≈ 350 years of bins."""
    r1 = rank.cast("long")
    one = _chr(F.lit(96) + r1)
    r2 = r1 - 1
    two = F.concat(
        _chr(F.lit(96) + F.floor(r2 / 26)), _chr(F.lit(97) + r2 % 26)
    )
    r3 = r2 - 26  # shift into two-trailing-letter space
    three = F.concat(
        _chr(F.lit(96) + F.floor(r3 / 676)),
        _chr(F.lit(97) + F.floor((r3 % 676) / 26)),
        _chr(F.lit(97) + r3 % 26),
    )
    return F.when(r1 <= 26, one).when(r1 <= 702, two).when(r1 <= 18278, three)


def base26_label_sql(rank_expr: str) -> str:
    """The same encoding as ANSI SQL for the DuckDB oracle."""
    r = f"CAST({rank_expr} AS BIGINT)"

    def c(expr: str) -> str:
        return f"chr(CAST({expr} AS INTEGER))"

    return (
        f"CASE WHEN {r} <= 26 THEN {c(f'96 + {r}')} "
        f"WHEN {r} <= 702 THEN {c(f'96 + ({r}-1)//26')} || {c(f'97 + ({r}-1)%26')} "
        f"ELSE {c(f'96 + ({r}-27)//676')} || {c(f'97 + (({r}-27)%676)//26')} "
        f"|| {c(f'97 + ({r}-27)%26')} END"
    )
