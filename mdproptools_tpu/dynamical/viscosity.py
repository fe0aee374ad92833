"""
Green-Kubo viscosity from LAMMPS log pressure tensors
(10.1021/acs.jcim.9b00066, 10.1021/acs.jctc.5b00351).

API-compatible with the reference ``mdproptools/dynamical/viscosity.py``
(class ``Viscosity``: ``autocorrelate:87``, ``exp_func:123``,
``calc_visc:139``, ``calc_avg_visc:193``, ``fit_avg_visc:239``,
``bootstrapping:382``). The per-component, per-replicate ACFs run as one
batched Wiener-Khinchin FFT on device; the double-exponential
extrapolation to infinite time (10.1021/jp062885s) stays on host via
scipy least squares.

Divergence from the reference: in ``fit_avg_visc`` the reference tests
``if std_indexes:`` / ``if time_indexes:`` on np.where tuples, which are
always truthy, so when the std never reaches 0.4*eta (or no time exceeds
2 ps) it crashes with IndexError (viscosity.py:276-286); here those
cases fall back to the full window (idx_cut_time = len(visc)) / index 1.
"""

import glob
import os
import random

import numpy as np
from scipy import optimize

from mdproptools_tpu.common import constants
from mdproptools_tpu.io.lammps_log import parse_lammps_log
from mdproptools_tpu.ops import acf as acf_ops

TENSOR_LABELS = ["Pxy", "Pxz", "Pyz"]


class Viscosity:
    """Green-Kubo viscosity with multi-replicate averaging, double-exp
    infinite-time extrapolation and bootstrapped uncertainty."""

    def __init__(
        self,
        log_pattern,
        cutoff_time,
        volume,
        temp=298.15,
        timestep=1,
        acf_method="wkt",
        units="real",
        working_dir=None,
    ):
        self.log_pattern = log_pattern
        self.cutoff_time = cutoff_time
        self.units = units
        if self.units not in constants.SUPPORTED_UNITS:
            raise KeyError(
                "Unit type not supported. Supported units are: "
                + str(constants.SUPPORTED_UNITS)
            )
        self.volume = volume * constants.DISTANCE_CONVERSION[self.units] ** 3
        self.temp = temp
        self.timestep = timestep
        self.acf_method = acf_method
        self.working_dir = working_dir or os.getcwd()
        self.time = None
        self.step_to_s = self.timestep * constants.TIME_CONVERSION[self.units]

    @staticmethod
    def autocorrelate(series, method):
        """Unbiased autocorrelation; 'wkt' = batched device FFT,
        'brute_force' = O(N^2) oracle (``viscosity.py:87-120``)."""
        series = np.asarray(series, np.float64)
        if method == "brute_force":
            return acf_ops.autocorrelate_brute(series)
        if method == "wkt":
            # ops.acf dispatches host vs device by size/dtype
            return np.asarray(acf_ops.autocorrelate(series))
        raise ValueError("Method string input not recognized")

    @staticmethod
    def exp_func(t, A, alpha, tau1, tau2):
        """Running-integral double exponential (``viscosity.py:123-137``)."""
        return A * alpha * tau1 * (1 - np.exp(-t / tau1)) + A * (
            1 - alpha
        ) * tau2 * (1 - np.exp(-t / tau2))

    def calc_visc(self, acf, dt):
        """eta(t) = V/(kB T) * cumtrapz(ACF) (``viscosity.py:139-153``).
        ``ops.acf`` keeps small/f64 inputs on host — integrating a
        just-host-computed ACF must not pay a device round trip."""
        integral = np.asarray(acf_ops.cumtrapz(acf, dt))
        return self.volume / (constants.BOLTZMANN * self.temp) * integral

    def _calc_3d_visc(self, log_df):
        """Viscosity from the three off-diagonal pressure components
        (``viscosity.py:155-191``); batched ACF over components."""
        time_data = log_df["Step"].to_numpy() * self.step_to_s
        delta_t = time_data[1] - time_data[0]
        pconv2 = constants.PRESSURE_CONVERSION[self.units] ** 2

        series = np.stack([log_df[l].to_numpy(np.float64)
                           for l in TENSOR_LABELS])
        if self.acf_method == "wkt":
            acf_data = np.asarray(
                acf_ops.autocorrelate(series)
            ) * pconv2
        else:
            acf_data = np.stack(
                [self.autocorrelate(s, self.acf_method) for s in series]
            ) * pconv2
        viscosity_data = np.stack([self.calc_visc(a, delta_t)
                                   for a in acf_data])
        return viscosity_data.mean(axis=0), viscosity_data, acf_data

    def calc_avg_visc(self, output_all_data=False):
        """Per-replicate running-integral viscosity
        (``viscosity.py:193-237``).

        Replicate-grid quirk (preserved from the reference,
        ``viscosity.py:215-225``): the truncation index ``cutoff_idx`` is
        located ONCE, in the FIRST replicate's ``Step`` column, and then
        applied positionally (``iloc``) to every other replicate. A
        replicate logged at a different thermo cadence would be silently
        mis-truncated, so — unlike the reference — we raise a
        ``ValueError`` when any replicate's Step grid disagrees with the
        first's over the kept window."""
        log_files = glob.glob(f"{self.working_dir}/{self.log_pattern}")
        if not log_files:
            raise FileNotFoundError(
                f"no log files match {self.log_pattern!r} in "
                f"{self.working_dir}"
            )
        list_log_df = [parse_lammps_log(f)[0] for f in log_files]

        first = list_log_df[0]
        matches = first.index[first["Step"] == self.cutoff_time]
        if len(matches) == 0:
            raise ValueError(
                f"cutoff_time {self.cutoff_time} not found in the Step "
                "column of the first replicate"
            )
        cutoff_idx = first.index.get_loc(matches[0])

        ref_steps = first["Step"].to_numpy()[cutoff_idx:]
        for i, log_df in enumerate(list_log_df[1:], start=1):
            steps = log_df["Step"].to_numpy()[cutoff_idx:]
            n = min(len(steps), len(ref_steps))
            if n == 0 or not np.array_equal(steps[:n], ref_steps[:n]):
                raise ValueError(
                    f"replicate {log_files[i]!r} has a Step grid that "
                    "disagrees with the first replicate's after the "
                    f"cutoff row {cutoff_idx}; the positional truncation "
                    "shared across replicates (reference "
                    "viscosity.py:215-225) would silently mis-truncate it"
                )

        visc_avg, visc_data, acf_data = [], [], []
        for log_df in list_log_df:
            log_df = log_df.iloc[cutoff_idx:]
            avg, data, acf = self._calc_3d_visc(log_df)
            visc_avg.append(avg)
            visc_data.append(data)
            acf_data.append(acf)
        self.time = (
            np.array(list_log_df[0]["Step"][: len(visc_avg[0]) - 1])
            * self.timestep
        )
        if output_all_data:
            return visc_avg, visc_data, acf_data, self.time
        return visc_avg

    def fit_avg_visc(self, visc_avg, initial_guess=[1e-10, 0.8, 1.1e4, 1.1e4],
                     plot=False, plot_file="viscosity.png"):
        """Average replicates, fit the double exponential over
        [t > 2 ps, std <= 0.4 eta] with 1/std^0.5 weights, return the
        infinite-time viscosity (``viscosity.py:239-380``)."""
        visc = np.average(visc_avg, axis=0)
        std = np.std(visc_avg, axis=0)

        time_indexes = np.where(self.time > 2000)
        idx_start_time = time_indexes[0][0] if time_indexes[0].size else 1
        std_indexes = np.where(std >= 0.4 * visc)
        idx_cut_time = std_indexes[0][0] if std_indexes[0].size else len(visc)

        t_fit = self.time[idx_start_time:idx_cut_time]
        v_fit = visc[idx_start_time:idx_cut_time]
        s_fit = std[idx_start_time:idx_cut_time]
        # Divergence from the reference (viscosity.py:292): sigma=1/std**0.5
        # with any zero std (the t~0 samples where every replicate's running
        # integral is still 0, a single replicate, or identical replicates)
        # produces inf weights and a curve_fit failure; the reference shares
        # the bug. Zero-std points are clamped to the window's smallest
        # POSITIVE std (weighting elsewhere is untouched — an all-or-nothing
        # unweighted fallback would silently change the fit for every point
        # because of one degenerate sample); only a window with NO positive
        # std (single replicate) falls back to an unweighted fit.
        pos = s_fit[s_fit > 0]
        if pos.size:
            sigma = 1 / np.where(s_fit > 0, s_fit, pos.min()) ** 0.5
        else:
            sigma = None
        popt2, _ = optimize.curve_fit(
            self.exp_func,
            t_fit,
            v_fit,
            sigma=sigma,
            bounds=(0, [max(v_fit), 1, 5 * self.time[min(idx_cut_time,
                                                         len(self.time) - 1)],
                        5 * self.time[min(idx_cut_time,
                                          len(self.time) - 1)]]),
            p0=initial_guess,
            maxfev=1000000,
        )
        viscosity = popt2[0] * popt2[1] * popt2[2] + popt2[0] * (
            1 - popt2[1]
        ) * popt2[3]

        if plot:
            self._plot(visc_avg, visc, std, t_fit, v_fit, popt2,
                       idx_start_time, idx_cut_time, plot_file)
        return viscosity

    def _plot(self, visc_avg, visc, std, t_fit, v_fit, popt2, idx_start,
              idx_cut, plot_file):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.ticker import ScalarFormatter

        from mdproptools_tpu.utilities.plots import set_axis

        time_data = self.time * self.step_to_s * 1e9
        paired = plt.get_cmap("Paired")
        colors = iter(paired(np.linspace(0, 1, max(len(visc_avg), 2))))
        fig, ax = plt.subplots(1, 3, figsize=[20, 5], sharey=False)
        ax1, ax2, ax3 = ax
        set_axis(ax1, axis="both")
        for arr in visc_avg:
            ax1.plot(time_data, arr[: len(time_data)], linewidth=2,
                     color=next(colors))
        ax1.plot(time_data, visc[: len(time_data)], linewidth=2,
                 color="black")
        if idx_cut < len(time_data):
            ax1.axvline(time_data[idx_cut], linewidth=2, color="black",
                        linestyle="--")
        ax1.set_ylabel(r"$\mathrm{\mu \ (Pa.s)}$", fontsize=18)
        set_axis(ax2, axis="both")
        ax2.plot(time_data, std[: len(time_data)], linewidth=2, color="black")
        ax2.set_ylabel(r"$\mathrm{\sigma \ (Pa.s)}$", fontsize=18)
        set_axis(ax3, axis="both")
        ax3.plot(t_fit * self.step_to_s * 1e9, v_fit, linewidth=2,
                 color="red", label="data")
        ax3.plot(t_fit * self.step_to_s * 1e9,
                 [self.exp_func(t, *popt2) for t in t_fit], linewidth=2,
                 color="black", label="fit")
        ax3.legend(fontsize=16, loc="lower right", frameon=False)
        ax3.set_ylabel(r"$\mathrm{\mu \ (Pa.s)}$", fontsize=18)
        for axis in (ax1, ax2, ax3):
            axis.set_xlabel(r"$\mathrm{Time, 10^9 (s)}$", fontsize=18)
            fmt = ScalarFormatter(useOffset=False)
            axis.yaxis.set_major_formatter(fmt)
        fig.tight_layout(pad=3)
        fig.savefig(f"{self.working_dir}/{plot_file}", bbox_inches="tight",
                    pad_inches=0.1)
        plt.close(fig)

    def bootstrapping(self, visc_avg, num_replicates, tot_replicates,
                      initial_guess=[1e-10, 0.8, 1.1e4, 1.1e4], plot=False):
        """Bootstrap over replicate subsets (without replacement within an
        iteration) -> (mean, std) of the fitted viscosity
        (``viscosity.py:382-434``)."""
        idx = np.zeros((tot_replicates, num_replicates), dtype=int)
        for i in range(tot_replicates):
            idx[i] = random.sample(range(len(visc_avg)), num_replicates)
        visc_samples = np.array(visc_avg)[idx]
        all_visc = []
        for ind, visc in enumerate(visc_samples):
            all_visc.append(
                self.fit_avg_visc(
                    visc_avg=visc,
                    initial_guess=initial_guess,
                    plot=plot,
                    plot_file=f"viscosity_{ind + 1}.png",
                )
            )
        return np.average(all_visc), np.std(all_visc)
