"""Multi-trajectory sweep APIs on synthetic replicate trajectories."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from helpers import write_traj  # noqa: E402

from mdproptools_tpu.parallel import (  # noqa: E402
    sweep_conductivity,
    sweep_msd,
    sweep_rdf,
)


@pytest.fixture(scope="module")
def replicate_dirs(tmp_path_factory):
    """3 replicate trajectories of the same tiny 2-species system."""
    dirs = []
    rng = np.random.default_rng(3)
    box = 15.0
    n = 64
    cols = ["id", "type", "q", "mass", "x", "y", "z", "xu", "yu", "zu",
            "vx", "vy", "vz"]
    for rep in range(3):
        d = tmp_path_factory.mktemp(f"rep{rep}")
        pos = rng.uniform(0, box, (n, 3))
        vel = rng.normal(0, 1e-3, (n, 3))
        frames, ts_list = [], list(range(0, 120000, 1000))
        for ts in ts_list:
            drift = rng.normal(0, 0.05, (n, 3))
            pos = pos + drift
            # OU velocities: correlation decays over ~3 frames so the
            # GK plateau detector has a decaying region to work with
            vel = 0.7 * vel + rng.normal(0, 1e-3, (n, 3))
            data = np.zeros((n, len(cols)))
            data[:, 0] = np.arange(1, n + 1)
            data[:, 1] = [1] * 32 + [2] * 32
            data[:, 2] = [1.0] * 32 + [-1.0] * 32
            data[:, 3] = [22.99] * 32 + [35.45] * 32
            data[:, 4:7] = pos % box
            data[:, 7:10] = pos
            data[:, 10:13] = vel
            frames.append(data)
        write_traj(str(d), ts_list, 0.0, box, cols, frames)
        dirs.append(str(d) + "/dump.test.*.dump")
    return dirs


def test_sweep_rdf(replicate_dirs):
    df = sweep_rdf(replicate_dirs, 6.0, 0.2, 2, [22.99, 35.45],
                   [[1], [2]], precision="strict",
                   labels=["r1", "r2", "r3"])
    assert set(df["trajectory"]) == {"r1", "r2", "r3"}
    assert len(df) == 3 * 30
    assert "g_1-2" in df.columns


def test_sweep_msd(replicate_dirs):
    msd, diff = sweep_msd(replicate_dirs, msd_type="allatom",
                          precision="strict", labels=["a", "b", "c"])
    assert set(msd["trajectory"]) == {"a", "b", "c"}
    assert len(diff) == 3  # one msd column per trajectory
    assert (diff["diffusion (m2/s)"] > 0).all()


def test_sweep_conductivity(replicate_dirs):
    df = sweep_conductivity(
        replicate_dirs, [32, 32], [1, 1], volume=15.0**3,
        mass=[22.99, 35.45], tol=0.9, precision="strict",
        labels=["a", "b", "c"],
    )
    assert list(df["trajectory"]) == ["a", "b", "c", "mean", "std"]
    assert np.isfinite(df["sigma_total"].to_numpy(np.float64)).all()


def test_sweep_rdf_single_program_and_parity(replicate_dirs):
    """The sweep must (a) trace/compile exactly ONE block program per
    block shape across all trajectories, and (b) match per-trajectory
    calc_atomic_rdf results exactly."""
    import pandas as pd

    from mdproptools_tpu.structural import rdf_cn

    rdf_cn._trace_log.clear()
    df = sweep_rdf(replicate_dirs, 6.0, 0.2, 2, [22.99, 35.45],
                   [[1], [2]], precision="strict",
                   labels=["r1", "r2", "r3"])
    # 3 trajectories x 120 frames in one 120-frame block each -> one
    # block shape -> exactly one trace
    assert len(rdf_cn._trace_log) == 1, rdf_cn._trace_log
    for label, f in zip(["r1", "r2", "r3"], replicate_dirs):
        want = rdf_cn.calc_atomic_rdf(
            6.0, 0.2, 2, [22.99, 35.45], [[1], [2]], f,
            save_mode=False, precision="strict")
        got = df[df["trajectory"] == label].drop(
            columns="trajectory").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
