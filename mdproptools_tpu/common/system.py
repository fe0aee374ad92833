"""
System topology: one dataclass replacing the ``num_mols`` /
``num_atoms_per_mol`` / ``mass`` / ``elements`` argument triples the
reference passes to every entry point (e.g. ``rdf_cn.py:385-396``,
``conductivity.py:51-62``).

All derived quantities are precomputed, fixed-shape numpy arrays so they
can be placed on device once and reused across frames:

- ``mol_type``  (N,) 1-based molecule-type per atom
- ``mol_id``    (N,) 1-based molecule index *within* its type
- ``mol_index`` (N,) 0-based global molecule index (segment ids for
  ``jax.ops.segment_sum``)
- ``altered_atom_type`` (N,) the reference's recalculated per-molecule
  atom ids (``rdf_cn.py:197-215``) as a vectorized closed form

Atoms are assumed sorted by LAMMPS atom id, matching the reference's
``sort_values("id")`` convention.
"""

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class System:
    num_mols: Tuple[int, ...]
    num_atoms_per_mol: Tuple[int, ...]
    mass: Optional[Tuple[float, ...]] = None  # per atom *type* (LAMMPS order)
    elements: Optional[Tuple[str, ...]] = None  # per atom type

    def __post_init__(self):
        object.__setattr__(self, "num_mols", tuple(int(n) for n in self.num_mols))
        object.__setattr__(
            self, "num_atoms_per_mol", tuple(int(n) for n in self.num_atoms_per_mol)
        )
        if self.mass is not None:
            object.__setattr__(self, "mass", tuple(float(m) for m in self.mass))
        if self.elements is not None:
            object.__setattr__(self, "elements", tuple(self.elements))
        if len(self.num_mols) != len(self.num_atoms_per_mol):
            raise ValueError("num_mols and num_atoms_per_mol must have equal length")

    # ---- sizes -------------------------------------------------------------
    @property
    def n_mol_types(self) -> int:
        return len(self.num_mols)

    @property
    def n_molecules(self) -> int:
        return int(sum(self.num_mols))

    @property
    def n_atoms(self) -> int:
        return int(
            sum(m * a for m, a in zip(self.num_mols, self.num_atoms_per_mol))
        )

    # ---- per-atom arrays (cached) -------------------------------------------
    def _per_atom(self):
        key = "_per_atom_cache"
        cached = self.__dict__.get(key)
        if cached is not None:
            return cached
        reps = np.array(
            [m * a for m, a in zip(self.num_mols, self.num_atoms_per_mol)], np.int64
        )
        mol_type = np.repeat(np.arange(1, self.n_mol_types + 1, dtype=np.int64), reps)
        # global 0-based molecule index
        apm = np.repeat(np.array(self.num_atoms_per_mol, np.int64),
                        np.array(self.num_mols, np.int64))
        mol_index = np.repeat(np.arange(self.n_molecules, dtype=np.int64), apm)
        # 1-based molecule id within its type
        first_mol_of_type = np.concatenate(
            [[0], np.cumsum(np.array(self.num_mols, np.int64))]
        )
        mol_id = mol_index - first_mol_of_type[mol_type - 1] + 1
        # altered atom type: per-molecule intra id offset by sum of previous
        # molecule types' atom counts (closed form of rdf_cn.py:197-215)
        intra = np.concatenate(
            [np.arange(1, a + 1, dtype=np.int64) for a in apm]
        ) if len(apm) else np.zeros(0, np.int64)
        offsets = np.concatenate(
            [[0], np.cumsum(np.array(self.num_atoms_per_mol, np.int64))]
        )
        altered = intra + offsets[mol_type - 1]
        out = {
            "mol_type": mol_type,
            "mol_id": mol_id,
            "mol_index": mol_index,
            "altered_atom_type": altered,
        }
        object.__setattr__(self, key, out)
        return out

    @property
    def mol_type(self) -> np.ndarray:
        return self._per_atom()["mol_type"]

    @property
    def mol_id(self) -> np.ndarray:
        return self._per_atom()["mol_id"]

    @property
    def mol_index(self) -> np.ndarray:
        return self._per_atom()["mol_index"]

    @property
    def altered_atom_type(self) -> np.ndarray:
        return self._per_atom()["altered_atom_type"]

    @property
    def n_altered_types(self) -> int:
        return int(sum(self.num_atoms_per_mol))

    @property
    def mol_type_of_molecule(self) -> np.ndarray:
        """(n_molecules,) 1-based molecule type of each global molecule."""
        return np.repeat(
            np.arange(1, self.n_mol_types + 1, dtype=np.int64),
            np.array(self.num_mols, np.int64),
        )

    def atom_masses(self, types: np.ndarray) -> np.ndarray:
        """Per-atom masses from 1-based atom types using the mass registry."""
        if self.mass is None:
            raise ValueError("System.mass is not set")
        m = np.asarray(self.mass, np.float64)
        return m[np.asarray(types, np.int64) - 1]


def altered_atom_types(
    atom_ids: np.ndarray,
    num_mols: Sequence[int],
    num_atoms_per_mol: Sequence[int],
) -> np.ndarray:
    """
    Vectorized closed form of the reference's per-molecule atom-id remap
    (``rdf_cn.py:197-215``): sorted 1-based atom ids -> new ids that
    distinguish the same chemical atom across molecule types.
    """
    ids = np.asarray(atom_ids, np.int64)
    num_mols = np.asarray(num_mols, np.int64)
    apm = np.asarray(num_atoms_per_mol, np.int64)
    block_end = np.cumsum(num_mols * apm)
    block_start = block_end - num_mols * apm
    mol_type0 = np.searchsorted(block_end, ids, side="left")  # 0-based type
    within = ids - block_start[mol_type0] - 1  # 0-based within block
    intra = within % apm[mol_type0] + 1
    offsets = np.concatenate([[0], np.cumsum(apm)])
    return intra + offsets[mol_type0]
