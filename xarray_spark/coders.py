"""``xarray_spark.coders`` — parity with the reference's public coder
classes (xarray/coders.py → ``CFDatetimeCoder``/``CFTimedeltaCoder``,
implementations coding/times.py:1355, :1522).

In the engine, CF decoding is a set of scan-time column expressions
(:func:`xarray_spark.io.decode_cf`); these classes are the knobs a
reference user passes as ``decode_times=`` — here they slot into a
``decode_cf`` spec dict under the ``"coder"`` key to control WHICH
decode path a time variable takes:

- ``CFDatetimeCoder(use_cftime=True)`` forces the encoded cftime
  ordinal path even for real (proleptic-Gregorian family) calendars —
  exactly what the reference flag does;
- ``use_cftime=False`` demands real timestamps and raises for
  non-real calendars instead of silently switching representation;
- ``use_cftime=None`` (default) picks by calendar, the reference's
  behavior.

``time_unit`` is accepted for signature parity; the engine's
timestamps are microsecond-grain (Spark's TIMESTAMP), so only units
at or above ``'us'`` are representable and ``'ns'`` requests decode at
microsecond resolution (documented divergence, same value range).
"""

from __future__ import annotations

__all__ = ["CFDatetimeCoder", "CFTimedeltaCoder"]

_UNITS = ("s", "ms", "us", "ns")


class CFDatetimeCoder:
    """Decode-time knob for CF time variables (reference
    coding/times.py:1355)."""

    def __init__(self, use_cftime: bool | None = None,
                 time_unit: str = "ns") -> None:
        if time_unit not in _UNITS:
            raise ValueError(
                f"time_unit must be one of {_UNITS}, got {time_unit!r}")
        self.use_cftime = use_cftime
        self.time_unit = time_unit

    def __repr__(self) -> str:
        return (f"CFDatetimeCoder(use_cftime={self.use_cftime!r}, "
                f"time_unit={self.time_unit!r})")


class CFTimedeltaCoder:
    """Decode-time knob for CF timedelta variables (reference
    coding/times.py:1522).  The engine decodes timedeltas to
    microsecond-integer columns (the ``.dt`` timedelta field grain)."""

    def __init__(self, time_unit: str = "ns",
                 decode_via_units: bool = True) -> None:
        if time_unit not in _UNITS:
            raise ValueError(
                f"time_unit must be one of {_UNITS}, got {time_unit!r}")
        self.time_unit = time_unit
        self.decode_via_units = decode_via_units

    def __repr__(self) -> str:
        return f"CFTimedeltaCoder(time_unit={self.time_unit!r})"
