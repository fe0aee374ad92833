"""
Equilibration-fluctuation plots (reference:
``mdproptools/utilities/fluctuations.py:14-57``): plot one thermo
property vs time, return its (mean, std).
"""

import os

import numpy as np

from mdproptools_tpu.common import constants
from mdproptools_tpu.utilities.plots import set_axis


def _get_stats(stats):
    return "(" + ", ".join([f"{k}:{v: .4g}" for k, v in stats.items()]) + ")"


def plot_fluctuations(log, log_prop, title, filename, timestep=1,
                      units="real", working_dir=None):
    """Plot ``log_prop`` vs time from a thermo DataFrame; save the figure;
    return (mean, std)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    working_dir = working_dir or os.getcwd()
    fig, ax = plt.subplots(figsize=(8, 6), sharey=False)
    set_axis(ax, axis="both")
    time_data = (log["Step"] * timestep
                 * constants.TIME_CONVERSION[units] * 1e9)
    stats = log[log_prop].describe().loc[["mean", "std"]].to_dict()
    ax.plot(time_data, log[log_prop], linewidth=2, color="red")
    ax.axhline(np.mean(log[log_prop]), linewidth=2, color="#000000", ls="--")
    ax.set_title("{} {}".format(title, _get_stats(stats)), fontsize=18)
    ax.set_xlabel(r"$\mathrm{Time, 10^9 (m^2/s)}$", fontsize=18)
    ax.set_xlim(0, None)
    lo = log[log_prop].min()
    hi = log[log_prop].max()
    ax.set_ylim(lo * 2 if lo < 0 else lo / 2, hi * 2 if hi > 0 else -hi * 2)
    fig.tight_layout(pad=3)
    fig.savefig(f"{working_dir}/{filename}", bbox_inches="tight",
                pad_inches=0.1)
    plt.close(fig)
    return stats["mean"], stats["std"]
