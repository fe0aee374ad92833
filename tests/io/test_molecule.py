"""Molecule file-format readers (io/molecule.py) — one equivalence
check per format against the XYZ ground truth (the formats the
reference reaches through pymatgen's ``Molecule.from_file`` at
``cluster_analysis.py:341``)."""

import json

import numpy as np
import pytest

from mdproptools_tpu.io.molecule import Molecule

SPECIES = ["O", "C", "H"]
COORDS = np.array([[0.0, 0.0, 0.1],
                   [1.2, 0.0, -0.3],
                   [1.8, 0.9, 0.4]])


def _check(mol):
    assert mol.species == SPECIES
    np.testing.assert_allclose(mol.coords, COORDS, atol=1e-6)


def test_from_xyz_roundtrip(tmp_path):
    p = tmp_path / "m.xyz"
    Molecule(SPECIES, COORDS).to_xyz(str(p), comment="test")
    _check(Molecule.from_file(str(p)))


def test_from_gaussian_input(tmp_path):
    p = tmp_path / "m.gjf"
    body = "\n".join(
        ["%chk=m.chk", "#P B3LYP/6-31G* opt", "", "title card", "", "0 1"]
        + [f"{s} {x:.6f} {y:.6f} {z:.6f}"
           for s, (x, y, z) in zip(SPECIES, COORDS)]
        + [""]
    )
    p.write_text(body)
    _check(Molecule.from_file(str(p)))


def test_from_gaussian_input_fragment_decoration(tmp_path):
    p = tmp_path / "m.com"
    rows = [f"{s}(Fragment=1) {x} {y} {z}"
            for s, (x, y, z) in zip(SPECIES, COORDS)]
    p.write_text("\n".join(["#P HF/sto-3g", "", "t", "", "-1 2"] + rows))
    _check(Molecule.from_file(str(p)))


def test_from_mol(tmp_path):
    p = tmp_path / "m.mol"
    lines = ["mol title", "  generator", "",
             f"{len(SPECIES):3d}  0  0  0  0  0  0  0  0  0999 V2000"]
    for s, (x, y, z) in zip(SPECIES, COORDS):
        lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {s:<3s} 0  0  0  0  0")
    lines.append("M  END")
    p.write_text("\n".join(lines))
    _check(Molecule.from_file(str(p)))


def test_from_json_pymatgen_dict(tmp_path):
    p = tmp_path / "m.json"
    d = {"sites": [
        {"species": [{"element": s, "occu": 1}], "xyz": list(map(float, c))}
        for s, c in zip(SPECIES, COORDS)
    ]}
    p.write_text(json.dumps(d))
    _check(Molecule.from_file(str(p)))


def test_unknown_format_raises(tmp_path):
    p = tmp_path / "m.cif"
    p.write_text("data_x")
    with pytest.raises(ValueError, match="unsupported molecule file"):
        Molecule.from_file(str(p))
