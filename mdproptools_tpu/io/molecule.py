"""
Minimal molecule container + XYZ/PDB readers (replaces the reference's
use of ``pymatgen.core.structure.Molecule`` in
``cluster_analysis.py:341-347`` — ``Molecule.from_file``,
``get_neighbors``, ``species`` — without the pymatgen dependency).
"""

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

_POSITION_ATOL = 1e-8


@dataclass(frozen=True)
class Site:
    species_string: str
    coords: np.ndarray  # (3,)

    def __eq__(self, other):
        if not isinstance(other, Site):
            return NotImplemented
        return self.species_string == other.species_string and np.allclose(
            self.coords, other.coords, atol=_POSITION_ATOL
        )

    def __str__(self):
        return self.species_string

    def distance(self, other: "Site") -> float:
        return float(np.linalg.norm(self.coords - other.coords))


class Molecule:
    """Ordered collection of sites. Supports ``mol[i]``, slicing (returns a
    list of sites), ``len``, ``in``, ``.species`` and ``.get_neighbors``."""

    def __init__(self, species: Sequence[str], coords: np.ndarray):
        self.species: List[str] = [str(s) for s in species]
        self.coords = np.asarray(coords, np.float64).reshape(len(self.species), 3)

    def __len__(self):
        return len(self.species)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return [
                Site(self.species[i], self.coords[i])
                for i in range(*idx.indices(len(self)))
            ]
        return Site(self.species[idx], self.coords[idx])

    def sites(self) -> List[Site]:
        return [Site(s, c) for s, c in zip(self.species, self.coords)]

    def get_neighbors(self, site: Site, r: float) -> List[Site]:
        """All sites within distance r of ``site``, excluding sites at the
        same position (non-periodic, like pymatgen's Molecule)."""
        d = np.linalg.norm(self.coords - site.coords[None, :], axis=1)
        out = []
        for i in np.nonzero((d <= r) & (d > _POSITION_ATOL))[0]:
            out.append(Site(self.species[i], self.coords[i]))
        return out

    # ---- IO -----------------------------------------------------------------
    @classmethod
    def from_file(cls, filename: str) -> "Molecule":
        """Read a molecule from a file by extension.

        KNOWN LIMIT vs the reference: pymatgen's ``Molecule.from_file``
        (used at ``cluster_analysis.py:341``) accepts further formats
        (mol/sdf/gjf/...) via openbabel; this parser covers XYZ and PDB
        — the two formats the reference's own tests and bundled data
        exercise. Other formats raise ValueError; convert externally.
        """
        low = filename.lower()
        if low.endswith(".xyz"):
            return cls.from_xyz(filename)
        if low.endswith(".pdb"):
            return cls.from_pdb(filename)
        raise ValueError(f"unsupported molecule file format: {filename}")

    @classmethod
    def from_xyz(cls, filename: str) -> "Molecule":
        with open(filename) as fh:
            lines = fh.read().splitlines()
        # first line may be an atom count; second a comment
        start = 0
        try:
            n = int(lines[0].split()[0])
            start = 2
        except (ValueError, IndexError):
            n = None
        species, coords = [], []
        for line in lines[start:]:
            parts = line.split()
            if len(parts) < 4:
                continue
            species.append(parts[0])
            coords.append([float(parts[1]), float(parts[2]), float(parts[3])])
            if n is not None and len(species) == n:
                break
        return cls(species, np.array(coords))

    @classmethod
    def from_pdb(cls, filename: str) -> "Molecule":
        species, coords = [], []
        with open(filename) as fh:
            for line in fh:
                if line.startswith(("ATOM", "HETATM")):
                    x = float(line[30:38])
                    y = float(line[38:46])
                    z = float(line[46:54])
                    elem = line[76:78].strip()
                    if not elem:
                        # fall back to atom-name column, stripped of digits
                        elem = "".join(
                            c for c in line[12:16].strip() if c.isalpha()
                        )[:2].capitalize()
                    species.append(elem)
                    coords.append([x, y, z])
        return cls(species, np.array(coords))

    def to_xyz(self, filename: str, comment: str = "") -> None:
        with open(filename, "w") as fh:
            fh.write(f"{len(self)}\n{comment}\n")
            for s, c in zip(self.species, self.coords):
                fh.write(f"{s} {c[0]:.10f} {c[1]:.10f} {c[2]:.10f}\n")
