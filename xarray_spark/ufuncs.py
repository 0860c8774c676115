"""Universal scalar functions (reference: xarray/ufuncs.py:245-348 __all__).

Each ufunc is a thin mapper over an XDataset/XDataArray's data variables
(or over a raw Column) onto pyspark.sql.functions — JVM-side,
whole-stage-codegen'd.  The few numpy ufuncs with no Spark builtin
(spacing, nextafter) are noted; they'd go through a pandas_udf.
"""

from __future__ import annotations

import math
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from xarray_spark.dataset import XDataset


def _apply(x, fn: Callable[[Column], Column]):
    if isinstance(x, XDataset):
        return x.map(fn)
    if isinstance(x, Column):
        return fn(x)
    return fn(F.lit(x))


def _mk(fn):
    def ufunc(x):
        return _apply(x, fn)
    return ufunc


# trig / hyperbolic
sin = _mk(F.sin); cos = _mk(F.cos); tan = _mk(F.tan)
arcsin = _mk(F.asin); arccos = _mk(F.acos); arctan = _mk(F.atan)
sinh = _mk(F.sinh); cosh = _mk(F.cosh); tanh = _mk(F.tanh)
arcsinh = _mk(F.asinh); arccosh = _mk(F.acosh); arctanh = _mk(F.atanh)

# exp / log
exp = _mk(F.exp)
expm1 = _mk(F.expm1)
exp2 = _mk(lambda c: F.pow(F.lit(2.0), c))
log = _mk(F.log)
log10 = _mk(F.log10)
log2 = _mk(F.log2)
log1p = _mk(F.log1p)
logaddexp = lambda a, b: F.log(F.exp(a) + F.exp(b))  # noqa: E731

# rounding
ceil = _mk(F.ceil); floor = _mk(F.floor)
trunc = _mk(lambda c: c.cast("long"))
rint = _mk(F.bround)
round = _mk(F.round)  # noqa: A001

# powers / roots
sqrt = _mk(F.sqrt)
cbrt = _mk(F.cbrt)
square = _mk(lambda c: c * c)
reciprocal = _mk(lambda c: F.lit(1.0) / c)
hypot = lambda a, b: F.hypot(a, b)  # noqa: E731
power = lambda a, b: F.pow(a, b)  # noqa: E731

# sign / abs
abs = _mk(F.abs)  # noqa: A001
fabs = _mk(F.abs)
sign = _mk(F.signum)
negative = _mk(lambda c: -c)
positive = _mk(lambda c: c)
copysign = lambda a, b: F.abs(a) * F.signum(b)  # noqa: E731

# predicates
isnan = _mk(F.isnan)
isnull = _mk(lambda c: c.isNull())
isfinite = _mk(lambda c: c.isNotNull() & ~F.isnan(c.cast("double")) & (F.abs(c.cast("double")) != F.lit(float("inf"))))
isinf = _mk(lambda c: F.abs(c.cast("double")) == F.lit(float("inf")))

# comparison
maximum = lambda a, b: F.greatest(a, b)  # noqa: E731
minimum = lambda a, b: F.least(a, b)  # noqa: E731
fmax = maximum
fmin = minimum

# logical
logical_and = lambda a, b: a & b  # noqa: E731
logical_or = lambda a, b: a | b  # noqa: E731
logical_xor = lambda a, b: a.cast("boolean") != b.cast("boolean")  # noqa: E731
logical_not = _mk(lambda c: ~c.cast("boolean"))

# int ops
gcd = lambda a, b: F.expr(f"gcd({a}, {b})") if isinstance(a, str) else None  # noqa: E731
bitwise_and = lambda a, b: a.bitwiseAND(b)  # noqa: E731
bitwise_or = lambda a, b: a.bitwiseOR(b)  # noqa: E731
bitwise_xor = lambda a, b: a.bitwiseXOR(b)  # noqa: E731
bitwise_not = _mk(lambda c: F.expr(f"~{c._jc.toString()}") if hasattr(c, "_jc") else ~c)
left_shift = lambda a, b: F.shiftleft(a, b)  # noqa: E731
right_shift = lambda a, b: F.shiftright(a, b)  # noqa: E731
bitwise_count = _mk(F.bit_count)

# float structure
fmod = lambda a, b: a % b  # noqa: E731
mod = fmod
remainder = lambda a, b: a - F.floor(a / b) * b  # noqa: E731
floor_divide = lambda a, b: F.floor(a / b)  # noqa: E731
ldexp = lambda a, b: a * F.pow(F.lit(2.0), b)  # noqa: E731

# degrees / radians
deg2rad = _mk(F.radians)
rad2deg = _mk(F.degrees)
degrees = rad2deg
radians = deg2rad

# misc
heaviside = lambda a, h: F.when(a < 0, 0.0).when(a == 0, h).otherwise(1.0)  # noqa: E731

# numpy ufuncs with no JVM builtin — would require a pandas_udf; kept
# explicit so coverage is auditable:
_NO_BUILTIN = ("spacing", "nextafter", "frexp", "modf")
