"""
Per-molecule center-of-mass DataFrame, API-compatible with the reference
``mdproptools/common/com_mols.py::calc_com`` (same output layout: rows
indexed by (type, mol_id), mass-weighted means of the requested atom
attributes, total molecular mass, optional total charge). Internals are
segment sums, not a pandas groupby.
"""

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from mdproptools_tpu.common.system import System
from mdproptools_tpu.io.lammps_dump import Frame


def calc_com(
    dump: Frame,
    num_mols: Sequence[int],
    num_atoms_per_mol: Sequence[int],
    mass: Optional[Sequence[float]] = None,
    atom_attributes: List[str] = ["xu", "yu", "zu"],
    calc_charge: bool = False,
) -> pd.DataFrame:
    """COM of each molecule from a Frame sorted by atom id.

    Returns a DataFrame indexed by (type, mol_id) with the mass-weighted
    mean of each attribute, the molecular mass, and (optionally) the
    molecular charge (``com_mols.py:5-62``).
    """
    system = System(num_mols, num_atoms_per_mol)
    if mass is not None:
        types = dump.col("type").astype(np.int64)
        masses = np.asarray(mass, np.float64)[types - 1]
    elif dump.has("mass"):
        masses = dump.col("mass").astype(np.float64)
    else:
        raise AssertionError("Missing atom masses in dump file.")

    mol_index = system.mol_index
    M = system.n_molecules
    mtot = np.zeros(M)
    np.add.at(mtot, mol_index, masses)
    data = {}
    for attr in atom_attributes:
        w = np.zeros(M)
        np.add.at(w, mol_index, masses * dump.col(attr))
        data[attr] = w / mtot
    data["mass"] = mtot
    if calc_charge:
        q = np.zeros(M)
        np.add.at(q, mol_index, dump.col("q"))
        data["q"] = q
    index = pd.MultiIndex.from_arrays(
        [system.mol_type_of_molecule,
         np.concatenate([np.arange(1, n + 1) for n in system.num_mols])],
        names=["type", "mol_id"],
    )
    return pd.DataFrame(data, index=index)
