"""Hydration number + number density on synthetic systems with known
geometry (angles and bin counts hand-computable)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from helpers import write_traj  # noqa: E402

from mdproptools_tpu.structural.hydration_number import (  # noqa: E402
    get_hydration_number,
)
from mdproptools_tpu.structural.number_density import (  # noqa: E402
    calc_number_density,
)


def test_hydration_number_known_angles(tmp_path):
    """One cation at origin; two waters: one with bisector pointing AWAY
    from the cation (cos(O->cation, bisector) = -1 < -0.72, 'hydrating'),
    one with bisector pointing TOWARD it (cos = +1)."""
    box = 20.0
    cation = np.array([10.0, 10.0, 10.0])
    # water A: O at +2.0 x; H's further out (+x) -> bisector +x;
    # O->cation vector is -x -> cos = -1
    oA = cation + [2.0, 0, 0]
    hA1 = oA + [0.8, 0.3, 0]
    hA2 = oA + [0.8, -0.3, 0]
    # water B: O at -2.0 x; H's pointing toward the cation (+x) ->
    # bisector +x; O->cation = +x -> cos = +1
    oB = cation - [2.0, 0, 0]
    hB1 = oB + [0.8, 0.3, 0]
    hB2 = oB + [0.8, -0.3, 0]
    pos = np.vstack([cation, oA, hA1, hA2, oB, hB1, hB2])
    cols = ["id", "type", "x", "y", "z"]
    data = np.zeros((7, 5))
    data[:, 0] = np.arange(1, 8)
    data[:, 1] = [1, 2, 3, 3, 2, 3, 3]
    data[:, 2:5] = pos
    write_traj(str(tmp_path), [0], 0.0, box, cols, [data])
    # system: 1 cation molecule (1 atom) then 2 waters (3 atoms each)
    out = get_hydration_number(
        "dump.test.*.dump", cation_type=1, water_type=2, r_cut=3.0,
        num_mols=[1, 2], num_atoms_per_mol=[1, 3],
        working_dir=str(tmp_path),
    )
    cosines = np.sort(out["angles_distribution"].to_numpy())
    np.testing.assert_allclose(cosines, [-1.0, 1.0], atol=1e-12)
    # one of two in-range waters is 'hydrating' -> factor 0.5
    assert out["hydration_factor"].iloc[0] == pytest.approx(0.5)
    assert (tmp_path / "angles_df.csv").exists()


def test_get_angle_and_get_all_angles_match_pipeline(tmp_path):
    """The reference-compat per-frame helpers (get_angle /
    get_all_angles) must reproduce the device pipeline's cosines and
    factor on the same geometry."""
    from mdproptools_tpu.io.lammps_dump import parse_lammps_dumps
    from mdproptools_tpu.structural.hydration_number import get_all_angles

    box = 20.0
    cation = np.array([10.0, 10.0, 10.0])
    oA = cation + [2.0, 0, 0]
    hA1, hA2 = oA + [0.8, 0.3, 0], oA + [0.8, -0.3, 0]
    oB = cation - [2.0, 0, 0]
    hB1, hB2 = oB + [0.8, 0.3, 0], oB + [0.8, -0.3, 0]
    pos = np.vstack([cation, oA, hA1, hA2, oB, hB1, hB2])
    cols = ["id", "type", "x", "y", "z"]
    data = np.zeros((7, 5))
    data[:, 0] = np.arange(1, 8)
    data[:, 1] = [1, 2, 3, 3, 2, 3, 3]
    data[:, 2:5] = pos
    write_traj(str(tmp_path), [0], 0.0, box, cols, [data])
    frame = next(parse_lammps_dumps(str(tmp_path / "dump.test.*.dump")))
    cosines, factor = get_all_angles(
        0, frame, False, [1, 2], [1, 3], cation_type=1, water_type=2,
        r_cut=3.0)
    np.testing.assert_allclose(sorted(cosines), [-1.0, 1.0], atol=1e-12)
    assert factor == pytest.approx(0.5)


def test_number_density_profile(tmp_path):
    """Surface atoms (type 1) occupy x in [0, 2]; type-2 atoms placed at
    known distances beyond the surface; dist_from_interface > 0 shifts by
    the surface thickness (reference semantics)."""
    box = 30.0
    surf_x = np.array([0.0, 1.0, 2.0])
    probe_x = np.array([2.25, 2.75, 3.25, 6.0])  # beyond the far edge
    xs = np.concatenate([surf_x, probe_x])
    n = xs.size
    data = np.zeros((n, 5))
    data[:, 0] = np.arange(1, n + 1)
    data[:, 1] = [1] * 3 + [2] * 4
    data[:, 2] = xs
    data[:, 3] = 5.0
    data[:, 4] = 5.0
    cols = ["id", "type", "x", "y", "z"]
    write_traj(str(tmp_path), [0], 0.0, box, cols, [data])
    out = calc_number_density(
        "dump.test.*.dump", surface_atom=1, atom_types=[2], bin_size=0.5,
        dist_from_interface=8.0, axis_norm_interface="x",
        working_dir=str(tmp_path), results_file="nd.csv",
    )
    # after the shift: b = x - 0 - 2 (dist_range=2); probes at 0.25, 0.75,
    # 1.25, 4.0 -> bins 0, 1, 2, 8; volume = 30*30*0.5
    dens = out["g_2-2" if "g_2-2" in out else out.columns[1]].to_numpy()
    vol = 30.0 * 30.0 * 0.5
    want = np.zeros(16)
    want[[0, 1, 2, 8]] = 1 / vol
    np.testing.assert_allclose(dens, want, rtol=1e-12)
    assert (tmp_path / "nd.csv").exists()


def test_number_density_negative_bins_wrap(tmp_path):
    """An atom inside the surface slab gets a negative shifted coordinate
    whose bin wraps to the array tail, exactly like the reference's
    Python negative indexing."""
    box = 30.0
    xs = np.array([0.0, 2.0, 1.0])  # two surface atoms + one probe INSIDE
    data = np.zeros((3, 5))
    data[:, 0] = [1, 2, 3]
    data[:, 1] = [1, 1, 2]
    data[:, 2] = xs
    data[:, 3] = 5.0
    data[:, 4] = 5.0
    write_traj(str(tmp_path), [0], 0.0, box, ["id", "type", "x", "y", "z"],
               [data])
    out = calc_number_density(
        "dump.test.*.dump", surface_atom=1, atom_types=[2], bin_size=0.5,
        dist_from_interface=4.0, axis_norm_interface="x",
        working_dir=str(tmp_path), save_mode=False,
    )
    dens = out[out.columns[1]].to_numpy()
    # probe: shifted = 1 - 0 = 1; b = 1 - 2 = -1 -> trunc(-2.0) = -2 ->
    # wraps to bin 8 - 2 = 6
    vol = 30.0 * 30.0 * 0.5
    want = np.zeros(8)
    want[6] = 1 / vol
    np.testing.assert_allclose(dens, want, rtol=1e-12)
