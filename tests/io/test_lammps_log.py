"""Thermo-log parser: one-line custom styles, multi style, multi-section
logs (pymatgen parse_lammps_log parity surface)."""

import numpy as np

from mdproptools_tpu.io.lammps_log import parse_lammps_log


def test_one_line_custom_header_not_step_first(tmp_path):
    p = tmp_path / "log.custom"
    p.write_text(
        "units real\nrun 10\n"
        "Time Step Temp Press v_eta[1]\n"
        "0.0 0 298.1 1.0 0.5\n"
        "1.0 10 299.0 1.1 0.6\n"
        "Loop time of 0.1 on 4 procs\n"
    )
    secs = parse_lammps_log(str(p))
    assert len(secs) == 1
    df = secs[0]
    assert list(df.columns) == ["Time", "Step", "Temp", "Press", "v_eta[1]"]
    np.testing.assert_allclose(df["Step"], [0, 10])
    np.testing.assert_allclose(df["v_eta[1]"], [0.5, 0.6])


def test_multi_style_blocks(tmp_path):
    p = tmp_path / "log.multi"
    p.write_text(
        "setup\n"
        "---------------- Step        0 ----- CPU =      0.0000 (sec) ----------------\n"
        "TotEng   =     -4242.4157 KinEng   =       811.5939 Temp     =       298.1500 \n"
        "PotEng   =     -5054.0096 E_bond   =       110.1804 E_angle  =       351.7154 \n"
        "\n"
        "---------------- Step       50 ----- CPU =      1.2000 (sec) ----------------\n"
        "TotEng   =     -4240.0000 KinEng   =       810.0000 Temp     =       297.0000 \n"
        "PotEng   =     -5050.0000 E_bond   =       111.0000 E_angle  =       350.0000 \n"
        "Loop time of 1.2 on 4 procs\n"
    )
    secs = parse_lammps_log(str(p))
    assert len(secs) == 1
    df = secs[0]
    np.testing.assert_allclose(df["Step"], [0, 50])
    np.testing.assert_allclose(df["CPU"], [0.0, 1.2])
    np.testing.assert_allclose(df["TotEng"], [-4242.4157, -4240.0])
    np.testing.assert_allclose(df["E_angle"], [351.7154, 350.0])


def test_mixed_sections(tmp_path):
    p = tmp_path / "log.mixed"
    p.write_text(
        "Step Temp\n0 1.0\n1 2.0\nLoop time of 0 on 1 procs\n"
        "minimize\n"
        "---------------- Step        0 ----- CPU =      0.0000 (sec) ----\n"
        "TotEng   =         1.0000 \n"
        "Loop time of 0 on 1 procs\n"
        "Step Press Volume\n5 9.0 100.0\n6 9.5 101.0\n"
    )
    secs = parse_lammps_log(str(p))
    assert len(secs) == 3
    assert list(secs[0].columns) == ["Step", "Temp"]
    assert list(secs[1].columns) == ["Step", "CPU", "TotEng"]
    assert list(secs[2].columns) == ["Step", "Press", "Volume"]
    np.testing.assert_allclose(secs[2]["Volume"], [100.0, 101.0])


# --------------------------------------------------------------------------
# realistic fixtures: genuine LAMMPS 29Sep2021-format logs with banner,
# PPPM/neighbor setup noise, MPI timing breakdowns, multi-run sections,
# warnings interleaved between thermo rows, and a truncated final row
# (killed run). The reference's own log.mixture_* fixtures are
# unmaterialized git-LFS pointers, so these pin the formats pymatgen's
# parser is supposed to handle (reference utilities/log.py:10-28).
# --------------------------------------------------------------------------
from pathlib import Path

FIXTURES = Path(__file__).parent / "test_files"


def test_realistic_log_two_run_sections():
    secs = parse_lammps_log(str(FIXTURES / "log.twostage"))
    assert len(secs) == 2
    eq, prod = secs
    assert list(eq.columns) == ["Step", "Temp", "Press", "PotEng",
                                "KinEng", "TotEng", "Volume"]
    assert list(prod.columns) == ["Step", "Temp", "Press", "Pxy", "Pxz",
                                  "Pyz", "PotEng", "KinEng", "TotEng",
                                  "Volume"]
    # every thermo row survives the interleaved WARNING lines
    np.testing.assert_array_equal(eq["Step"], np.arange(0, 10001, 1000))
    np.testing.assert_array_equal(prod["Step"],
                                  np.arange(10000, 35001, 1000))
    # setup noise (box bounds, histograms, MPI breakdown) parsed as data
    # would show up as extra sections or bogus rows
    assert (eq["Volume"] == 118949.58).all()
    assert abs(prod["Temp"].mean() - 298.15) < 3.0


def test_realistic_log_single_production_section():
    secs = parse_lammps_log(str(FIXTURES / "log.mixture_1"))
    assert len(secs) == 1
    df = secs[0]
    np.testing.assert_array_equal(df["Step"], np.arange(0, 35001, 1000))
    for c in ("Pxy", "Pxz", "Pyz"):
        assert abs(df[c].mean()) < 25.0 and df[c].std() > 20.0


def test_realistic_log_truncated_final_row_dropped():
    secs = parse_lammps_log(str(FIXTURES / "log.mixture_2"))
    assert len(secs) == 1
    df = secs[0]
    # the run was killed mid-write at step 52000: the partial row must
    # be dropped, keeping 35000 (the restart's duplicated row) .. 51000
    assert df["Step"].iloc[0] == 35000
    assert df["Step"].iloc[-1] == 51000
    assert df.notna().all().all()


def test_realistic_log_restart_duplicate_row_is_byte_identical():
    """The restart log's first thermo row repeats part 1's final row
    (the concat_log duplicate-drop contract)."""
    part1 = parse_lammps_log(str(FIXTURES / "log.mixture_1"))[0]
    part2 = parse_lammps_log(str(FIXTURES / "log.mixture_2"))[0]
    np.testing.assert_array_equal(part1.iloc[-1].to_numpy(),
                                  part2.iloc[0].to_numpy())
