"""Viscosity: batched ACF pipeline vs brute-force, double-exp fit
recovery, replicate averaging and bootstrapping on synthetic logs."""

import numpy as np
import pandas as pd
import pytest

from mdproptools_tpu.common import constants
from mdproptools_tpu.dynamical.viscosity import Viscosity
from mdproptools_tpu.io.lammps_log import write_lammps_log


def make_logs(tmp_path, n_replicates=4, n=600, seed=0):
    """OU-like pressure series logs with Pxy/Pxz/Pyz columns."""
    rng = np.random.default_rng(seed)
    steps = np.arange(n) * 10
    for r in range(n_replicates):
        df = {"Step": steps, "Temp": np.full(n, 298.0)}
        for lab in ("Pxy", "Pxz", "Pyz"):
            x = np.zeros(n)
            for i in range(1, n):
                x[i] = 0.95 * x[i - 1] + rng.normal(0, 10.0)
            df[lab] = x
        write_lammps_log(str(tmp_path / f"log.visc_{r + 1}"),
                         [pd.DataFrame(df)])
    return "log.visc_*"


def test_calc_3d_visc_matches_brute(tmp_path):
    pattern = make_logs(tmp_path, n_replicates=1, n=300)
    v = Viscosity(pattern, cutoff_time=0, volume=30.0**3, temp=298.0,
                  timestep=1, acf_method="wkt", units="real",
                  working_dir=str(tmp_path))
    visc_avg, visc_data, acf_data, _ = v.calc_avg_visc(output_all_data=True)
    from mdproptools_tpu.io.lammps_log import parse_lammps_log
    from mdproptools_tpu.ops.acf import autocorrelate_brute
    from scipy.integrate import cumulative_trapezoid

    log = parse_lammps_log(str(tmp_path / "log.visc_1"))[0]
    dt = (log["Step"][1] - log["Step"][0]) * constants.TIME_CONVERSION["real"]
    want = []
    for lab in ("Pxy", "Pxz", "Pyz"):
        acf = autocorrelate_brute(log[lab].to_numpy()) * \
            constants.PRESSURE_CONVERSION["real"] ** 2
        eta = (30.0**3 * constants.DISTANCE_CONVERSION["real"] ** 3
               / (constants.BOLTZMANN * 298.0)
               * cumulative_trapezoid(acf, dx=dt))
        want.append(eta)
    want = np.stack(want)
    np.testing.assert_allclose(visc_data[0], want, rtol=1e-6)
    np.testing.assert_allclose(visc_avg[0], want.mean(axis=0), rtol=1e-6)


def test_cutoff_time_trims_rows(tmp_path):
    pattern = make_logs(tmp_path, n_replicates=1, n=200)
    v = Viscosity(pattern, cutoff_time=500, volume=30.0**3,
                  working_dir=str(tmp_path))
    visc_avg = v.calc_avg_visc()
    # cutoff at Step==500 -> index 50 -> 150 rows -> integral length 149
    assert len(visc_avg[0]) == 149


def test_fit_avg_visc_recovers_double_exp(tmp_path):
    """Feed running integrals generated exactly from exp_func: the fit
    must recover the infinite-time viscosity A(alpha tau1 + (1-alpha) tau2)."""
    A, alpha, tau1, tau2 = 2e-7, 0.6, 4.0e3, 2.0e4
    time = np.arange(1, 12001) * 10.0  # "steps" axis used by fit_avg_visc
    rng = np.random.default_rng(7)
    replicates = []
    for r in range(5):
        base = Viscosity.exp_func(time, A, alpha, tau1, tau2)
        noise = base * rng.normal(0, 0.005, size=base.size)
        replicates.append(base + noise)
    v = Viscosity("unused", cutoff_time=0, volume=1.0,
                  working_dir=str(tmp_path))
    v.time = time
    eta = v.fit_avg_visc(replicates, plot=True)
    want = A * alpha * tau1 + A * (1 - alpha) * tau2
    assert abs(eta - want) / want < 0.05
    assert (tmp_path / "viscosity.png").exists()


def test_fit_avg_visc_single_replicate_zero_std(tmp_path):
    """A single replicate has std==0 everywhere; the fit must fall back to
    unweighted instead of producing inf sigma weights (divergence from the
    reference, which crashes — viscosity.py:292)."""
    A, alpha, tau1, tau2 = 2e-7, 0.6, 4.0e3, 2.0e4
    time = np.arange(1, 8001) * 10.0
    base = Viscosity.exp_func(time, A, alpha, tau1, tau2)
    v = Viscosity("unused", cutoff_time=0, volume=1.0,
                  working_dir=str(tmp_path))
    v.time = time
    eta = v.fit_avg_visc([base], plot=False)
    want = A * alpha * tau1 + A * (1 - alpha) * tau2
    assert abs(eta - want) / want < 0.05


def test_bootstrapping(tmp_path):
    A, alpha, tau1, tau2 = 1e-7, 0.5, 3.0e3, 1.0e4
    time = np.arange(1, 3001) * 10.0
    rng = np.random.default_rng(8)
    reps = [
        Viscosity.exp_func(time, A, alpha, tau1, tau2)
        * (1 + rng.normal(0, 0.01, size=time.size))
        for _ in range(6)
    ]
    v = Viscosity("unused", cutoff_time=0, volume=1.0,
                  working_dir=str(tmp_path))
    v.time = time
    mean, std = v.bootstrapping(reps, num_replicates=4, tot_replicates=3,
                                plot=False)
    want = A * alpha * tau1 + A * (1 - alpha) * tau2
    assert abs(mean - want) / want < 0.1
    assert std >= 0


def test_replicate_step_grid_mismatch_raises(tmp_path):
    """A replicate logged at a different thermo cadence must raise
    instead of being silently mis-truncated by the FIRST replicate's
    positional cutoff (preserved reference quirk, viscosity.py:215-225;
    our added guard)."""
    pattern = make_logs(tmp_path, n_replicates=2, n=200)
    # rewrite replicate 2 on a 2x-coarser Step grid
    df = {"Step": np.arange(200) * 20, "Temp": np.full(200, 298.0)}
    rng = np.random.default_rng(3)
    for lab in ("Pxy", "Pxz", "Pyz"):
        df[lab] = rng.normal(0, 10.0, 200)
    write_lammps_log(str(tmp_path / "log.visc_2"), [pd.DataFrame(df)])
    v = Viscosity(pattern, cutoff_time=500, volume=30.0**3,
                  working_dir=str(tmp_path))
    with pytest.raises(ValueError, match="Step grid"):
        v.calc_avg_visc()


def test_brute_vs_wkt_methods_agree():
    rng = np.random.default_rng(9)
    x = rng.normal(size=257)
    a = Viscosity.autocorrelate(x, "wkt")
    b = Viscosity.autocorrelate(x, "brute_force")
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)
    with pytest.raises(ValueError):
        Viscosity.autocorrelate(x, "nope")


def test_fit_avg_visc_partial_zero_std_keeps_weighting(tmp_path):
    """A handful of zero-std samples (e.g. replicates agreeing exactly
    early on) must NOT discard sigma weighting for the whole window:
    zero stds are clamped to the window's smallest positive std and the
    weighted fit still recovers the true viscosity."""
    A, alpha, tau1, tau2 = 2e-7, 0.6, 4.0e3, 2.0e4
    time = np.arange(1, 8001) * 10.0
    base = Viscosity.exp_func(time, A, alpha, tau1, tau2)
    rng = np.random.default_rng(11)
    reps = []
    for r in range(4):
        noise = base * rng.normal(0, 0.004, size=base.size)
        noise[:300] = 0.0  # all replicates identical early -> std == 0
        reps.append(base + noise)
    v = Viscosity("unused", cutoff_time=0, volume=1.0,
                  working_dir=str(tmp_path))
    v.time = time
    eta = v.fit_avg_visc(reps, plot=False)
    want = A * alpha * tau1 + A * (1 - alpha) * tau2
    assert abs(eta - want) / want < 0.05


def test_calc_avg_visc_on_realistic_log_fixtures():
    """calc_avg_visc on genuine LAMMPS-format replicate logs (banner,
    PPPM setup, a WARNING interleaved inside replicate 2's thermo rows,
    MPI timing footers): three replicates, shared Step grid, running
    integrals must be positive and finite."""
    from pathlib import Path

    fixtures = Path(__file__).parents[1] / "io" / "test_files"
    v = Viscosity("log.visc_*", cutoff_time=2000, volume=118949.58,
                  temp=298.15, timestep=1, units="real",
                  working_dir=str(fixtures))
    visc_avg = v.calc_avg_visc()
    assert len(visc_avg) == 3
    for arr in visc_avg:
        # 201 rows - 20 cutoff rows -> 181 samples, cumtrapz gives 180
        assert arr.shape == (180,)
        assert np.all(np.isfinite(arr))
    # the fixture's P_ab is AR(1) with a ~5-sample correlation time, so
    # the running GK integral plateaus positive by ~4 correlation times
    # (the far tail is unbiased-ACF noise and may wander — that is why
    # the reference fits a windowed double exponential, not eta(t_max))
    plateaus = np.array([a[10:50].mean() for a in visc_avg])
    assert (plateaus > 0).all()
    assert plateaus.max() / plateaus.min() < 3.0
