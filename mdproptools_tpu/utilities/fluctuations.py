"""
Equilibration-fluctuation plots (behavior parity with
``mdproptools/utilities/fluctuations.py:14-57``): plot one thermo
property vs time, save the figure, return its (mean, std).

Deliberate divergences from the reference (documented, not bugs):
- the x-axis is labeled "Time (ns)" — the reference hardcodes
  ``Time, 10^9 (m^2/s)`` (a diffusion-coefficient unit) on what is a
  time axis (its ``fluctuations.py:47``); the plotted values are the
  same (step * timestep * time-conversion * 1e9 = nanoseconds for the
  'real' unit system);
- the figure styling is this package's own (mean line + one-sigma
  band) rather than a copy of the reference's plot block. The numeric
  contract — the returned (mean, std) of the property column — is
  unchanged and is what the reference's own test suite asserts
  (``tests/utilities/test_fluctuations.py``).
"""

import os

import numpy as np

from mdproptools_tpu.common import constants
from mdproptools_tpu.utilities.plots import set_axis


def plot_fluctuations(log, log_prop, title, filename, timestep=1,
                      units="real", working_dir=None):
    """Plot ``log_prop`` vs time from a thermo DataFrame; save the
    figure; return (mean, std) of the property (pandas ``describe``
    semantics: ddof=1 std)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    working_dir = working_dir or os.getcwd()
    values = np.asarray(log[log_prop], np.float64)
    mean = float(np.mean(values))
    std = float(np.std(values, ddof=1))
    time_ns = np.asarray(
        log["Step"], np.float64
    ) * timestep * constants.TIME_CONVERSION[units] * 1e9

    fig, ax = plt.subplots(figsize=(8, 6))
    set_axis(ax, axis="both")
    ax.plot(time_ns, values, lw=1.5, color="#c23b22")
    ax.axhline(mean, lw=1.5, color="black", ls="--")
    ax.axhspan(mean - std, mean + std, color="#c23b22", alpha=0.15,
               label=rf"$\pm\sigma$ = {std:.4g}")
    ax.set_title(f"{title} (mean: {mean:.4g}, std: {std:.4g})",
                 fontsize=16)
    ax.set_xlabel("Time (ns)", fontsize=18)
    ax.set_xlim(left=0)
    ax.legend(frameon=False, fontsize=12)
    fig.savefig(os.path.join(working_dir, filename),
                bbox_inches="tight", pad_inches=0.1)
    plt.close(fig)
    return mean, std
