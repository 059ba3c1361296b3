"""Driver/UDF-side numeric helpers that must match JVM semantics.

Spark's ``round()`` (and DuckDB's ``ROUND``) round ties HALF_UP over
the shortest decimal repr (``BigDecimal.valueOf``); Python's ``round``
and ``np.round`` are banker's (half-even).  Any Python-side rounding
that an oracle compares against SQL ``ROUND`` must use these helpers or
an exact decimal tie (e.g. ...x5 at the cut digit) hash-mismatches.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, digits: int = 9) -> float:
    """HALF_UP decimal rounding of ``x`` to ``digits`` places, matching
    Spark/DuckDB ``round()`` tie behavior (``repr`` gives the shortest
    round-tripping decimal, same as ``BigDecimal.valueOf``)."""
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP
        )
    )


def round_half_up_array(values, digits: int = 6):
    """Elementwise :func:`round_half_up` over a numpy array (returns a
    float64 ndarray).  Vectorization is per-element Decimal — fine for
    the per-group centroid/statistic sizes this is used at (≤ a few
    thousand values per group), not for row-scale hot paths."""
    import numpy as np

    return np.array(
        [round_half_up(float(v), digits) for v in np.asarray(values).ravel()],
        dtype=np.float64,
    )
