"""
Host-side statistical fits.

The reference leans on statsmodels/scipy for O(T) post-processing:
- OLS without intercept for the Einstein diffusion slope
  (``diffusion.py:323-326``),
- scipy ``curve_fit`` for the viscosity double exponential
  (``viscosity.py:288-304``) and the residence-time stretched exponential
  (``residence_time.py:160-166``).

statsmodels is not a dependency here; ``ols_no_intercept`` reimplements
the same estimator and reports the same statistics (slope, standard
error, uncentered R^2 — the no-constant convention).
"""

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class OLSResult:
    slope: float
    bse: float
    rsquared: float
    nobs: int

    @property
    def params(self):
        return np.array([self.slope])

    def predict(self, x=None):
        if x is None:
            x = self._x
        return self.slope * np.asarray(x)

    def summary(self) -> str:
        return (
            "OLS Regression Results (no intercept)\n"
            "=====================================\n"
            f"nobs:            {self.nobs}\n"
            f"slope:           {self.slope:.6e}\n"
            f"std err:         {self.bse:.6e}\n"
            f"R-squared (uncentered): {self.rsquared:.6f}\n"
        )


def ols_no_intercept(x, y) -> OLSResult:
    """y ~ slope * x. Matches statsmodels OLS(y, x) with a single
    regressor and no constant: slope = sum(xy)/sum(x^2),
    bse = sqrt(SSR/(n-1)/sum(x^2)), R^2 uncentered = 1 - SSR/sum(y^2)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    sxx = float(np.sum(x * x))
    slope = float(np.sum(x * y)) / sxx
    resid = y - slope * x
    ssr = float(np.sum(resid * resid))
    n = x.size
    scale = ssr / (n - 1)
    bse = float(np.sqrt(scale / sxx))
    ssy = float(np.sum(y * y))
    rsq = 1.0 - ssr / ssy if ssy > 0 else np.nan
    res = OLSResult(slope, bse, rsq, n)
    object.__setattr__(res, "_x", x)
    return res
