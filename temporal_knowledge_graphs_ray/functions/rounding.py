"""Rounding that matches DuckDB's ROUND (half away from zero).

numpy/pandas round half-to-even; DuckDB rounds half away from zero. The
difference only shows at exact .5 boundaries, but oracle-parity code must
not depend on luck — every float column compared against a SQL oracle is
rounded with this helper on the Ray side and ROUND(...) in SQL.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, ndigits: int):
    scale = 10.0 ** ndigits
    arr = np.asarray(x, dtype=np.float64)
    out = np.where(
        arr >= 0,
        np.floor(arr * scale + 0.5) / scale,
        np.ceil(arr * scale - 0.5) / scale,
    )
    if np.isscalar(x) or getattr(x, "ndim", 1) == 0:
        return float(out)
    return out
