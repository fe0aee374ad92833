"""concat_log, plot_fluctuations, calc_com."""

import numpy as np
import pandas as pd
import pytest

from mdproptools_tpu.common.com_mols import calc_com
from mdproptools_tpu.io.lammps_dump import read_trajectory
from mdproptools_tpu.io.lammps_log import write_lammps_log
from mdproptools_tpu.utilities.fluctuations import plot_fluctuations
from mdproptools_tpu.utilities.log import concat_log


def test_concat_log_multi_part(tmp_path):
    s1 = pd.DataFrame({"Step": [0, 10, 20], "Temp": [1.0, 2.0, 3.0]})
    s2 = pd.DataFrame({"Step": [20, 30, 40], "Temp": [3.0, 4.0, 5.0]})
    write_lammps_log(str(tmp_path / "log.run_1"), [s1])
    write_lammps_log(str(tmp_path / "log.run_2"), [s2])
    full = concat_log("log.run_*", working_dir=str(tmp_path))
    # part 1's duplicated last row dropped
    np.testing.assert_allclose(full["Step"], [0, 10, 20, 30, 40])
    np.testing.assert_allclose(full["Temp"], [1, 2, 3, 4, 5])


def test_concat_log_sorts_by_wildcard_integer(tmp_path):
    for i, base in [(10, 100), (2, 0), (1, -100)]:
        df = pd.DataFrame({"Step": [base, base + 1],
                           "Temp": [float(i)] * 2})
        write_lammps_log(str(tmp_path / f"log.run_{i}"), [df])
    full = concat_log("log.run_*", working_dir=str(tmp_path))
    # order 1, 2, 10 (numeric, not lexicographic)
    assert full["Temp"].tolist() == [1.0, 2.0, 10.0, 10.0]


def test_plot_fluctuations(tmp_path):
    rng = np.random.default_rng(0)
    log = pd.DataFrame({
        "Step": np.arange(100) * 10,
        "Press": rng.normal(1.0, 0.1, 100),
    })
    mean, std = plot_fluctuations(log, "Press", "Pressure", "press.png",
                                  working_dir=str(tmp_path))
    assert mean == pytest.approx(log["Press"].mean())
    assert std == pytest.approx(log["Press"].std())
    assert (tmp_path / "press.png").exists()


def test_calc_com_matches_groupby(mg_tfsi_dme_dir):
    from mdproptools_tpu.io.lammps_dump import parse_lammps_dumps

    fr = next(parse_lammps_dumps(f"{mg_tfsi_dme_dir}/dump.nvt.0.dump"))
    out = calc_com(fr, [591, 66, 33], [16, 15, 1],
                   atom_attributes=["xu", "yu", "zu"], calc_charge=True)
    assert out.shape == (690, 5)
    assert out.index.names == ["type", "mol_id"]
    # pandas oracle
    df = fr.to_dataframe()
    mol_type = np.repeat([1, 2, 3], [591 * 16, 66 * 15, 33])
    apm = np.repeat([16, 15, 1], [591, 66, 33])
    mol_gid = np.repeat(np.arange(690), apm)
    df["gid"] = mol_gid
    w = df["mass"]
    for c in ("xu", "yu", "zu"):
        want = (df[c] * w).groupby(mol_gid).sum() / w.groupby(mol_gid).sum()
        np.testing.assert_allclose(out[c].to_numpy(), want.to_numpy(),
                                   rtol=1e-12)
    np.testing.assert_allclose(
        out["q"].to_numpy(), df["q"].groupby(mol_gid).sum().to_numpy(),
        atol=1e-12,
    )
    # net charges: DME ~0, TFSI -1, Mg +2 (tfsi/mg physical sanity)
    tfsi_q = out.loc[2]["q"].mean()
    mg_q = out.loc[3]["q"].mean()
    assert tfsi_q == pytest.approx(-1.0, abs=0.05)
    assert mg_q == pytest.approx(2.0, abs=0.05)


def test_concat_log_realistic_restart_fixture():
    """concat_log on genuine LAMMPS-format restart logs (banner, setup
    noise, interleaved WARNINGs, part 2 killed mid-write): part 1's
    duplicated last row drops, the step grid comes out monotone."""
    from pathlib import Path

    fixtures = Path(__file__).parents[1] / "io" / "test_files"
    full = concat_log("log.mixture_*", working_dir=str(fixtures))
    steps = full["Step"].to_numpy()
    # 0..35000 from part 1 (last row dropped), 35000..51000 from part 2
    # (row 0 is the duplicated restart row; the truncated 52000 row is
    # dropped by the parser)
    np.testing.assert_array_equal(steps, np.arange(0, 51001, 1000))
    assert not full.isna().any().any()
    assert list(full.columns) == ["Step", "Temp", "Press", "Pxy", "Pxz",
                                  "Pyz", "PotEng", "KinEng", "TotEng",
                                  "c_msd[1]", "c_msd[2]", "c_msd[3]",
                                  "c_msd[4]", "Volume"]
    # the msd columns are continuous across the restart boundary
    msd = full["c_msd[4]"].to_numpy()
    assert np.all(np.diff(msd) > 0)
