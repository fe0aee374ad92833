"""
Green-Kubo ionic conductivity from LAMMPS dumps (10.1063/1.4890741).

API-compatible with the reference ``mdproptools/dynamical/conductivity.py``
(class ``Conductivity``: ``correlate:98``, ``detect_time_range:117``,
``get_charge_flux:167``, ``correlate_charge_flux:197``,
``integrate_charge_flux_correlation:216``, ``fit_curve:234``,
``green_kubo:259``, ``calc_cond:276``) with the same CSV/plot artifacts.

TPU-native internals: the reference's multiprocessing.Pool over frames
(``conductivity.py:190-191``) + per-frame pandas groupby
(``_conductivity.py:27-31``) becomes ONE jitted device program — a
segment-sum molecular COM velocity and per-type charge flux over the
whole (T, N, 3) velocity block — and the per-type-pair correlation
double loop (``conductivity.py:208-214``) becomes one batched FFT
cross-correlation (Wiener-Khinchin, zero-pad 2N, unbiased triangle
norm) on device.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.integrate import cumulative_trapezoid

from mdproptools_tpu.common import constants
from mdproptools_tpu.common.system import System
from mdproptools_tpu.io.lammps_dump import (
    iter_trajectory_blocks,
    peek_dump_columns,
    prefetch_iter,
)
from mdproptools_tpu.ops import acf as acf_ops
from mdproptools_tpu.ops import com as com_ops
from mdproptools_tpu.ops.precision import resolve_dtype
from mdproptools_tpu.utilities.tracing import stage


class Conductivity:
    """Green-Kubo ionic conductivity: total and per-molecule-type."""

    def __init__(
        self,
        filename,
        num_mols,
        num_atoms_per_mol,
        volume,
        mass=None,
        temp=298.15,
        timestep=1,
        units="real",
        working_dir=None,
        precision="strict",
    ):
        self.working_dir = working_dir or os.getcwd()
        self.filename = filename
        self.mass = mass
        self.num_mols = num_mols
        self.num_atoms_per_mol = num_atoms_per_mol
        self.units = units
        self.volume = volume * constants.DISTANCE_CONVERSION[self.units] ** 3
        self.temp = temp
        self.timestep = timestep
        self.precision = precision
        self.time = []  # seconds, filled by get_charge_flux

    # ------------------------------------------------------------------
    @staticmethod
    def correlate(a, b):
        """Unbiased FFT cross-correlation (``conductivity.py:98-114``).
        ``ops.acf`` dispatches host vs device by size/dtype — do not
        pre-upload the operands."""
        return np.asarray(acf_ops.correlate(a, b))

    @staticmethod
    def detect_time_range(flux, tol):
        """Plateau detector (``conductivity.py:117-165``): discretize,
        per-group std, normalized against the std of stds, rolling-median
        of the below-tol mask, longest run wins.

        PARITY-PINNED TRANSLITERATION: this heuristic's exact pandas
        groupby-transform / rolling-median / run-scan sequence decides
        the integration window, and the window directly changes the
        reported conductivity — any "cleaner" reformulation changes
        results. It is therefore kept operation-for-operation equal to
        the reference (variable names aside), deliberately."""
        flux = pd.Series(np.asarray(flux), name="flux")
        time_step = max(int(len(flux) / 10000), 5)
        ind = [i // time_step for i in range(len(flux))]
        flux_std = flux.groupby(ind).transform("std")
        std = flux_std.std()
        div = std if std else 1
        flux_std = flux_std / div
        mask = (flux_std < tol).astype("int").to_frame()
        mask = (
            mask.rolling(
                window=4 * time_step + 1,
                min_periods=3 * time_step + 1,
                center=True,
            )
            .median()
            .fillna(0)["flux"]
            .to_list()
        )
        runs = []
        open_run = False
        for k, v in enumerate(mask):
            if v == 1 and not open_run:
                runs.append((k,))
                open_run = True
            elif v < 1 and open_run:
                runs[-1] = runs[-1] + (k,)
                open_run = False
        if runs and len(runs[-1]) == 1:
            runs[-1] = runs[-1] + (len(mask) - 1,)
        if not runs:
            raise ValueError(
                "detect_time_range: no near-zero plateau found; loosen tol"
            )
        best, best_len = None, 0
        for r in runs:
            if r[1] - r[0] > best_len:
                best_len = r[1] - r[0]
                best = r
        if best is None:  # only zero-length runs found
            raise ValueError(
                "detect_time_range: no near-zero plateau found; loosen tol"
            )
        return best

    # ------------------------------------------------------------------
    def get_charge_flux(self):
        """Charge flux J_k(t) = sum_mols q_mol * v_com per molecule type
        -> (3, n_mol_types, T). One device program per frame block
        replaces the process pool (``conductivity.py:167-195``);
        ingestion is streamed so host memory stays O(block x N) for any
        trajectory length (the per-type flux series itself is tiny)."""
        pattern = f"{self.working_dir}/{self.filename}"
        available = peek_dump_columns(pattern)
        # minimal parse: masses come from the ``mass`` arg (mapped via
        # the type column) or the dump's mass column, never both
        wanted = ["id", "q", "vx", "vy", "vz"]
        wanted.insert(1, "type" if self.mass is not None else "mass")
        stream = self.flux_stream()
        # prefetch depth 2: background parse overlaps the fold's host
        # copies and device transfers (the C parser releases the GIL)
        for blk in prefetch_iter(
            iter_trajectory_blocks(
                pattern, columns=[c for c in wanted if c in available]),
            depth=2,
        ):
            stream.fold(blk)
        return stream.finalize()

    def flux_stream(self, fold="host"):
        """(beyond-reference) push-model charge flux:
        ``fold(frame_block)`` one parsed block at a time, ``finalize()``
        -> the (3, n_mol_types, T) flux (and sets ``self.time``), so the
        shared-parse composite pipeline (``mdproptools_tpu.pipeline``)
        can feed one parse into several property streams.

        ``fold="host"`` (default) reduces each block on the host in
        float64 (``ops/host_fold.py`` — the reduction is
        bandwidth-trivial and per-block device uploads are retained in
        host RSS by the tunneled TPU client); ``fold="device"`` keeps
        the jitted per-block segment-sum program (the mesh-sharded
        path)."""
        return _FluxStream(self, fold)

    def correlate_charge_flux(self, flux):
        """All type-pair cross-correlations, summed over xyz; row i =
        sum_j corr(i, j); last row = grand total
        (``conductivity.py:197-214``), as one batched FFT.

        The operands stay host-side in the precision-resolved dtype;
        ``ops.acf`` routes the batch to host pocketfft when it is small
        (the (3, K, K, T) correlation of a 10k-frame flux is ~1 MB —
        the remote device path paid ~155 s of executable-load/fetch
        latency for milliseconds of FFT, round-4 BASELINE.md:83-90) and
        to the batched device FFT when it is large."""
        k = len(self.num_mols)
        f = np.asarray(flux, np.dtype(resolve_dtype(
            getattr(self, "precision", "strict"))))
        a = f[:, :, None, :]  # (3, K, 1, T)
        b = f[:, None, :, :]  # (3, 1, K, T)
        corr = np.asarray(acf_ops.correlate(a, b))  # (3, K, K, T)
        tot = np.zeros((k + 1, flux.shape[2]))
        tot[:k] = corr.sum(axis=(0, 2))  # sum over xyz and j
        tot[k] = corr.sum(axis=(0, 1, 2))
        return tot

    def integrate_charge_flux_correlation(self, tot_flux):
        """Cumulative trapezoid of each correlation row
        (``conductivity.py:216-232``)."""
        integral = np.zeros((len(tot_flux), len(tot_flux[0])))
        delta = self.time[1] - self.time[0]
        for i in range(len(tot_flux)):
            integral[i][1:] = cumulative_trapezoid(tot_flux[i], dx=delta)
        return integral

    def fit_curve(self, tot_flux, integral, tol):
        """Average the integral over the detected near-zero window of the
        correlation function (``conductivity.py:234-257``)."""
        ave = np.zeros(len(integral))
        time_range = np.zeros(len(integral), dtype=object)
        for i in range(len(integral)):
            s, e = self.detect_time_range(tot_flux[i], tol=tol)
            ave[i] = np.average(integral[i][s:e])
            time_range[i] = (self.time[s], self.time[e])
        return ave, time_range

    def green_kubo(self, ave):
        """sigma = <int J.J dt> / (3 kB T V) (``conductivity.py:259-274``)."""
        return ave / 3 / constants.BOLTZMANN / self.temp / self.volume

    def calc_cond(self, tol=1e-4, plot=False, save=False):
        """End-to-end Green-Kubo conductivity (``conductivity.py:276-397``).
        Returns sigma per molecule type followed by the total (S/m)."""
        j = self.get_charge_flux()
        tot_flux = self.correlate_charge_flux(j)
        integral = self.integrate_charge_flux_correlation(tot_flux)
        ave, time_range = self.fit_curve(tot_flux, integral, tol)
        cond = self.green_kubo(ave)

        if plot:
            self._plot(tot_flux, integral, time_range)
        if save:
            # PARITY-PINNED TRANSLITERATION (conductivity.py:376-396): the
            # CSV trio's file names, column headers, row layout and the
            # "1,2,...,tot" naming ARE the output contract downstream
            # tooling reads — kept structurally identical on purpose.
            charge_flux = np.append(np.array([self.time]), tot_flux, axis=0)
            integral_out = np.append(np.array([self.time]), integral, axis=0)
            start_time = [i[0] for i in time_range]
            end_time = [i[1] for i in time_range]
            cond_out = np.asarray([start_time, end_time, cond])
            mol_names = ",".join(
                str(i + 1) for i in range(len(tot_flux) - 1)
            ) + ",tot"
            col_names = "t," + mol_names
            np.savetxt(f"{self.working_dir}/charge_flux.csv", charge_flux.T,
                       delimiter=",", header=col_names, comments="")
            np.savetxt(f"{self.working_dir}/integral.csv", integral_out.T,
                       delimiter=",", header=col_names, comments="")
            np.savetxt(f"{self.working_dir}/conductivity.csv", cond_out.T,
                       delimiter=",", header="start_t,end_t,cond",
                       comments="")
        return cond

    def _plot(self, tot_flux, integral, time_range):
        """PARITY-PINNED TRANSLITERATION (``conductivity.py:304-374``):
        the figure layout, colors, labels and the marked integration
        window mirror the reference plot so users comparing outputs
        side-by-side see the same artifact; only the rendering backend
        (Agg) and helper imports differ."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.ticker import ScalarFormatter

        from mdproptools_tpu.utilities.plots import set_axis

        time_data = np.array(self.time) * 1e9
        paired = plt.get_cmap("Paired")
        fig, ax = plt.subplots(1, 2, figsize=(20, 5), sharey=False)
        colors = iter(paired(np.linspace(0, 1, 10)))
        ax1, ax2 = ax
        set_axis(ax1, axis="both")
        for i in range(len(tot_flux) - 1):
            ax1.plot(time_data, tot_flux[i], linewidth=2, color=next(colors))
        ax1.plot(time_data, tot_flux[-1], linewidth=2, color="black")
        ax1.set_ylabel(r"$\mathrm{\langle J(t)\cdot J(0)\rangle dt}$",
                       fontsize=18)
        colors = iter(paired(np.linspace(0, 1, 10)))
        set_axis(ax2, axis="both")
        for i in range(len(integral) - 1):
            ax2.plot(time_data, integral[i], label=i + 1, linewidth=2,
                     color=next(colors))
        ax2.plot(time_data, integral[-1], label="total", linewidth=2,
                 color="black")
        ax2.legend(fontsize=16, loc="center left", bbox_to_anchor=(1, 0.5),
                   frameon=False)
        ax2.set_ylabel(
            r"$\mathrm{\int_{0}^{\infty}\langle J(t)\cdot J(0)\rangle dt}$",
            fontsize=18,
        )
        for axis in (ax1, ax2):
            axis.axvline(time_range[-1][0] * 1e9, linewidth=2, color="black",
                         linestyle="--")
            axis.axvline(time_range[-1][1] * 1e9, linewidth=2, color="black",
                         linestyle="--")
            axis.set_xscale("log")
            axis.set_xlabel(r"$\mathrm{Time, 10^9 (s)}$", fontsize=18)
            fmt = ScalarFormatter(useOffset=False)
            axis.yaxis.set_major_formatter(fmt)
        fig.tight_layout(pad=3)
        fig.savefig(f"{self.working_dir}/conductivity.png",
                    bbox_inches="tight", pad_inches=0.1)
        plt.close(fig)

    def einstein(self, initial_time=None, final_time=None):
        """Einstein-Helfand conductivity (the reference stubs this,
        ``conductivity.py:399``): sigma = slope of the collective
        translocation MSD,

            sigma = d/dt < |sum_i q_i (r_i(t) - r_i(0))|^2 > / (6 kB T V)

        computed from unwrapped coordinates via one device program, with
        a no-intercept OLS slope over [initial_time, final_time] seconds
        (defaults to the whole trajectory). Returns sigma in S/m.
        """
        from mdproptools_tpu.ops.fits import ols_no_intercept

        pattern = f"{self.working_dir}/{self.filename}"
        available = peek_dump_columns(pattern)
        from mdproptools_tpu.dynamical.diffusion import Diffusion

        wanted = ["id", "q"]
        if {"xu", "yu", "zu"} <= set(available):
            wanted += ["xu", "yu", "zu"]  # skip the wrapped fallback
        else:
            wanted += ["x", "y", "z", "xu", "yu", "zu", "ix", "iy", "iz"]

        dconv = constants.DISTANCE_CONVERSION[self.units]
        qconv = constants.CHARGE_CONVERSION[self.units]

        # Streamed: per block, reduce to the collective dipole
        # P(t) = sum_i q_i r_i(t) — a heavily cancelling sum (neutral
        # system): float32 loses it entirely, so this O(T*N) reduction
        # always runs float64 on host regardless of the precision
        # setting. Host memory stays O(block x N).
        p_parts, ts_parts = [], []
        q = None
        for blk in iter_trajectory_blocks(
            pattern, columns=[c for c in wanted if c in available]
        ):
            if q is None:
                if not blk.has("q"):
                    raise AssertionError("Missing atom charges in dump file.")
                # copy: col() is a view into the recycled block buffer
                # (io._BlockBufferPool) — holding it would pin the
                # ~O(block x N x C) buffer for the whole stream
                q = np.array(blk.col("q")[0], np.float64)
            xu_b = Diffusion._unwrapped_coords(blk)
            p_parts.append(np.einsum(
                "tnc,n->tc", np.asarray(xu_b, np.float64), q))
            ts_parts.append(blk.timesteps)
        p = np.concatenate(p_parts) * (dconv * qconv)
        dp = p - p[0][None]
        msd = np.sum(dp * dp, axis=1)
        time_s = (np.concatenate(ts_parts).astype(np.float64)
                  * self.timestep
                  * constants.TIME_CONVERSION[self.units])
        lo = initial_time if initial_time is not None else time_s.min()
        hi = final_time if final_time is not None else time_s.max()
        sel = (time_s >= lo) & (time_s <= hi)
        fit = ols_no_intercept(time_s[sel], msd[sel])
        return fit.slope / (6 * constants.BOLTZMANN * self.temp
                            * self.volume)

    def nernst(self, diffusion, charges, counts, temp=None):
        """Nernst-Einstein conductivity from self-diffusion coefficients
        (the reference stubs this, ``conductivity.py:402``):

            sigma_NE = (1 / (V kB T)) * sum_k N_k (z_k e)^2 D_k

        Args:
          diffusion: per-species D in m^2/s (sequence, one per species).
          charges: per-species formal charge z_k (in e).
          counts: per-species molecule counts N_k.
        Returns sigma_NE in S/m (ideal, no ion-pairing correction).
        """
        temp = temp if temp is not None else self.temp
        diffusion = np.asarray(diffusion, np.float64)
        z = np.asarray(charges, np.float64)
        n = np.asarray(counts, np.float64)
        e = constants.ELEMENTARY_CHARGE
        return float(
            np.sum(n * (z * e) ** 2 * diffusion)
            / (self.volume * constants.BOLTZMANN * temp)
        )


class _FluxStream:
    """Push-model charge-flux accumulator built by
    ``Conductivity.flux_stream``: ``fold(frame_block)`` runs the jitted
    segment-sum flux program on each parsed block, ``finalize()``
    returns the (3, n_mol_types, T) flux and sets ``cond.time``."""

    def __init__(self, cond: Conductivity, fold="host"):
        if fold not in ("host", "device"):
            raise ValueError("fold must be 'host' or 'device'.")
        self.c = cond
        self.fold_mode = fold
        self.dtype = resolve_dtype(cond.precision)
        self._system = System(cond.num_mols, cond.num_atoms_per_mol,
                              mass=cond.mass)
        self._vconv = constants.VELOCITY_CONVERSION[cond.units]
        self._qconv = constants.CHARGE_CONVERSION[cond.units]
        self._flux_fn = None if fold == "host" else self._build_flux_fn()
        self._host_fold = None  # host reduceat layout (fold="host")
        self._qmol = None  # (M,) molecular charges, SI (fold="host")
        self._j_parts = []
        self._timesteps = []
        self._masses = self._q = self._q_d = self._m_d = None

    def _build_flux_fn(self):
        system = self._system
        mol_index = jnp.asarray(system.mol_index)
        type_index = jnp.asarray(system.mol_type_of_molecule - 1)
        n_mols = system.n_molecules
        n_types = system.n_mol_types
        vconv, qconv = self._vconv, self._qconv

        @jax.jit
        def flux_fn(vel_d, q_d, m_d):
            vcom = com_ops.segment_com(vel_d, m_d, mol_index, n_mols)
            vcom = vcom * vconv  # (T, M, 3), SI
            qmol = jax.ops.segment_sum(q_d, mol_index,
                                       num_segments=n_mols) * qconv
            weighted = vcom * qmol[None, :, None]  # (T, M, 3)
            flat = weighted.reshape(-1, 3)
            seg = jnp.tile(type_index, vel_d.shape[0]) + (
                jnp.repeat(jnp.arange(vel_d.shape[0]), n_mols) * n_types
            )
            j = jax.ops.segment_sum(flat, seg,
                                    num_segments=vel_d.shape[0] * n_types)
            return j.reshape(vel_d.shape[0], n_types, 3)

        return flux_fn

    def fold(self, blk):
        c = self.c
        if self._masses is None:  # frame-0 metadata
            if c.mass is not None:
                types = blk.col("type")[0].astype(np.int64)
                self._masses = np.asarray(c.mass, np.float64)[types - 1]
            elif blk.has("mass"):
                # copy: col() is a view into the recycled block
                # buffer (io._BlockBufferPool)
                self._masses = blk.col("mass")[0].copy()
            else:
                raise AssertionError("Missing atom masses in dump file.")
            if not blk.has("q"):
                raise AssertionError("Missing atom charges in dump file.")
            self._q = blk.col("q")[0].copy()
            if self.fold_mode == "host":
                from ..ops.host_fold import MolecularFold

                self._host_fold = MolecularFold(self._system, self._masses)
                self._qmol = (self._host_fold.molecular_charges(self._q)
                              * self._qconv)
            else:
                # constants cross the tunnel ONCE, not once per block
                self._q_d = jnp.asarray(self._q, self.dtype)
                self._m_d = jnp.asarray(self._masses, self.dtype)
        if self.fold_mode == "host":
            # Host float64 reduceat fold (ops/host_fold.py): the
            # (block, N, 3) velocity copy is weighted in place and
            # reduced to the (block, n_types, 3) flux without touching
            # the device — no upload, so nothing for the tunneled
            # client to retain. f64 regardless of ``precision``.
            vel_b = blk.cols_as(["vx", "vy", "vz"], np.float64)
            with stage("charge_flux", frames=vel_b.shape[0]):
                self._j_parts.append(
                    self._host_fold.charge_flux(vel_b, self._qmol,
                                                self._vconv))
            self._timesteps.append(blk.timesteps)
            return
        # fused f64->dtype column copy (one pass, no f64 temporary)
        vel_b = blk.cols_as(["vx", "vy", "vz"], self.dtype)
        with stage("charge_flux", frames=vel_b.shape[0]):
            # accumulate the (block, n_types, 3) flux shards ON DEVICE
            # and fetch once at finalize — a tunnel fetch costs seconds
            # of latency regardless of size, and the whole flux history
            # is tiny (T x n_types x 3)
            self._j_parts.append(
                self._flux_fn(jnp.asarray(vel_b), self._q_d, self._m_d))
        self._timesteps.append(blk.timesteps)

    def finalize(self):
        if not self._j_parts:
            raise ValueError("no frames folded")
        if self.fold_mode == "host":
            j = np.concatenate(self._j_parts)  # f64 already
        else:
            j = np.asarray(jnp.concatenate(self._j_parts), np.float64)
        self._j_parts.clear()
        self.c.time = list(
            np.concatenate(self._timesteps).astype(np.float64)
            * constants.TIME_CONVERSION[self.c.units]
            * self.c.timestep
        )
        return np.transpose(j, (2, 1, 0))  # (3, n_types, T)
