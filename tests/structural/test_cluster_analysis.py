"""Cluster extraction byte-parity against the reference's materialized
golden XYZ files (vendored under ``tests/structural/test_files``) — the
strongest parity evidence available. Mirrors the reference's own test
parameters exactly (tests/structural/test_cluster_analysis.py:
r_cut=2.3, frame 50 of the 101-frame trajectory = timestep 2,500,000,
atom_type 9 / altered 32, type_coord_atoms=[O,N,Mg], cum_perc=100).
The frame index is resolved from the glob at runtime so the test runs
identically on the bundled 7-frame subset and the full reference set —
the golden frame's DATA is the same either way, and the output
filenames enumerate processed frames (a single frame is always 0)."""

import filecmp
import glob
import os
import re

import pytest

from mdproptools_tpu.io.molecule import Molecule
from mdproptools_tpu.structural.cluster_analysis import (
    get_clusters,
    get_unique_configurations,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "test_files")
ELEMENTS = ["O", "C", "H", "N", "S", "O", "C", "F", "Mg"]
R_CUT = 2.3
GOLDEN_TIMESTEP = 2500000  # frame 50 of the reference's 101-frame run


def _golden_frame(dump_pattern):
    """Index of the golden timestep in the timestep-sorted glob."""
    ts = sorted(int(re.search(r"(\d+)", os.path.basename(f)).group(1))
                for f in glob.glob(dump_pattern))
    return ts.index(GOLDEN_TIMESTEP)


def _compare_xyz(workdir, pattern):
    mine = sorted(glob.glob(f"{workdir}/{pattern}"))
    golden = sorted(glob.glob(f"{GOLDEN_DIR}/{pattern}"))
    assert len(mine) == len(golden) != 0, (
        f"XYZ count mismatch for {pattern}: {len(mine)} vs {len(golden)}"
    )
    for m, g in zip(mine, golden):
        assert filecmp.cmp(m, g, shallow=False), (
            f"byte mismatch vs reference golden: {os.path.basename(g)}"
        )


def test_get_clusters_byte_identical(dump_pattern, tmp_path, benchmark):
    n = benchmark(
        get_clusters,
        filename=dump_pattern,
        atom_type=9,
        r_cut=R_CUT,
        num_mols=[591, 66, 33],
        num_atoms_per_mol=[16, 15, 1],
        full_trajectory=False,
        frame=_golden_frame(dump_pattern),
        elements=ELEMENTS,
        alter_atom_types=False,
        max_force=0.75,
        working_dir=str(tmp_path),
    )
    assert n == 33
    _compare_xyz(tmp_path, "Cluster_*.xyz")


def test_unique_configurations_matches_reference_test(dump_pattern,
                                                      mg_tfsi_dme_dir,
                                                      tmp_path):
    get_clusters(
        filename=dump_pattern,
        atom_type=32,
        r_cut=R_CUT,
        num_mols=[591, 66, 33],
        num_atoms_per_mol=[16, 15, 1],
        full_trajectory=False,
        frame=_golden_frame(dump_pattern),
        elements=ELEMENTS,
        alter_atom_types=True,
        max_force=0.75,
        working_dir=str(tmp_path),
    )
    dme = Molecule.from_file(os.path.join(mg_tfsi_dme_dir, "dme.pdb"))
    tfsi = Molecule.from_file(os.path.join(mg_tfsi_dme_dir, "tfsi.pdb"))
    mg = Molecule.from_file(os.path.join(mg_tfsi_dme_dir, "mg.pdb"))
    assert len(dme) == 16 and len(tfsi) == 15 and len(mg) == 1
    clusters, configs = get_unique_configurations(
        cluster_pattern="Cluster_*.xyz",
        r_cut=R_CUT,
        molecules=[dme, tfsi, mg],
        mol_num=2,
        type_coord_atoms=["O", "N", "Mg"],
        working_dir=str(tmp_path),
        find_top=True,
        perc=None,
        cum_perc=100,
        mol_names=["dme", "tfsi", "mg"],
        zip=False,
    )
    # the reference's own test expectation: 5 top configurations
    import pandas as pd

    top = pd.read_csv(tmp_path / "top_conf.csv")
    assert len(top) == 5
    _compare_xyz(tmp_path, "conf_*.xyz")
    assert len(clusters) == 33
    assert configs["count"].sum() == 33
    assert list(clusters.columns) == [
        "cluster", "num_dme", "num_tfsi", "num_mg", "atoms_dme",
        "atoms_tfsi", "atoms_mg",
    ]


def test_zip_archival(dump_pattern, mg_tfsi_dme_dir, tmp_path):
    get_clusters(
        filename=dump_pattern, atom_type=9, r_cut=R_CUT,
        num_mols=[591, 66, 33], num_atoms_per_mol=[16, 15, 1],
        frame=_golden_frame(dump_pattern), elements=ELEMENTS,
        working_dir=str(tmp_path),
    )
    dme = Molecule.from_file(os.path.join(mg_tfsi_dme_dir, "dme.pdb"))
    tfsi = Molecule.from_file(os.path.join(mg_tfsi_dme_dir, "tfsi.pdb"))
    mg = Molecule.from_file(os.path.join(mg_tfsi_dme_dir, "mg.pdb"))
    get_unique_configurations(
        cluster_pattern="Cluster_*.xyz", r_cut=R_CUT,
        molecules=[dme, tfsi, mg], mol_num=2, working_dir=str(tmp_path),
        find_top=False, zip=True,
    )
    assert os.path.exists(f"{tmp_path}/Clusters.zip")
    assert not glob.glob(f"{tmp_path}/Cluster_*.xyz")
    assert os.path.exists(f"{tmp_path}/clusters.csv")
    assert os.path.exists(f"{tmp_path}/configurations.csv")


def test_get_clusters_elements_from_dump(tmp_path):
    """A dump with an in-file ``element`` column must produce exactly the
    same Cluster_*.xyz files as passing ``elements=`` explicitly
    (reference branch cluster_analysis.py:132-133)."""
    import filecmp
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from helpers import write_dump, write_dump_mixed

    from mdproptools_tpu.structural.cluster_analysis import get_clusters

    import numpy as np

    rng = np.random.default_rng(21)
    box = 12.0
    # 3 diatomic molecules (types 1-2) + 2 single ions (type 3)
    num_mols, napm = [3, 2], [2, 1]
    n = 8
    pos = rng.uniform(0, box, (n, 3))
    types = [1, 2, 1, 2, 1, 2, 3, 3]
    elem_of_type = {1: "C", 2: "O", 3: "Mg"}
    cols_plain = ["id", "type", "x", "y", "z", "fx", "fy", "fz"]
    rows_plain, rows_elem = [], []
    for i in range(n):
        f = rng.normal(0, 0.01, 3)
        base = [i + 1, types[i], *(f"{v:.10g}" for v in pos[i]),
                *(f"{v:.10g}" for v in f)]
        rows_plain.append(base)
        rows_elem.append(base[:2] + [elem_of_type[types[i]]] + base[2:])
    d1 = tmp_path / "plain"; d1.mkdir()
    d2 = tmp_path / "withel"; d2.mkdir()
    write_dump_mixed(str(d1 / "dump.c.0.dump"), 0, 0.0, box,
                     cols_plain, rows_plain)
    write_dump_mixed(str(d2 / "dump.c.0.dump"), 0, 0.0, box,
                     ["id", "type", "element", "x", "y", "z",
                      "fx", "fy", "fz"], rows_elem)
    n1 = get_clusters(str(d1 / "dump.c.0.dump"), 3, 6.0, num_mols, napm,
                      frame=0, elements=["C", "O", "Mg"],
                      working_dir=str(d1))
    n2 = get_clusters(str(d2 / "dump.c.0.dump"), 3, 6.0, num_mols, napm,
                      frame=0, working_dir=str(d2))
    assert n1 == n2 > 0
    f1 = sorted(p.name for p in d1.glob("Cluster_*.xyz"))
    f2 = sorted(p.name for p in d2.glob("Cluster_*.xyz"))
    assert f1 == f2 and f1
    for name in f1:
        assert filecmp.cmp(d1 / name, d2 / name, shallow=False), name
