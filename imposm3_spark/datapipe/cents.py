"""Shared value->integer-cents conversion for Python-side (streaming)
operators.

Every batch operator converts money-like doubles with Spark's
``F.round(value * 100)`` — HALF_UP applied to the double's SHORTEST
decimal representation (java BigDecimal.valueOf semantics), which DuckDB's
``round()`` matches. Python's builtin ``round()`` is half-to-EVEN, so a
streaming operator using it diverges from its batch sibling on exact
half-cent doubles (e.g. a value whose ``v*100`` is binary-exactly
``x.5``), and the classic ``floor(x+0.5)`` trick diverges on values like
``0.49999999999999994`` where the ``+0.5`` addition itself rounds up.

``half_up_cents`` reproduces the JVM semantics exactly: quantize the
shortest decimal repr (python ``repr`` == shortest round-trip, same as
``Double.toString``) with decimal.ROUND_HALF_UP.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def half_up_cents(value: float) -> int:
    """Integer cents of a money-like double, bit-identical to Spark's
    ``F.round(value * 100).cast('bigint')`` and DuckDB's
    ``CAST(round(value * 100) AS BIGINT)``."""
    return int(
        Decimal(repr(value * 100.0)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )
