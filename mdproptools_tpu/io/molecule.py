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

        Covers the plain-text formats pymatgen's ``Molecule.from_file``
        (used at ``cluster_analysis.py:341``) reads without openbabel:
        XYZ, PDB, Gaussian input (gjf/com/g03/g09/g16), MDL mol/sdf
        (V2000) and pymatgen-style JSON. Openbabel-only binary/esoteric
        formats raise ValueError; convert externally.
        """
        low = filename.lower()
        if low.endswith(".xyz"):
            return cls.from_xyz(filename)
        if low.endswith(".pdb"):
            return cls.from_pdb(filename)
        if low.endswith((".gjf", ".com", ".g03", ".g09", ".g16", ".inp")):
            return cls.from_gaussian_input(filename)
        if low.endswith((".mol", ".sdf")):
            return cls.from_mol(filename)
        if low.endswith(".json"):
            return cls.from_json(filename)
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

    @classmethod
    def from_gaussian_input(cls, filename: str) -> "Molecule":
        """Gaussian input: link0/route section, blank line, title, blank
        line, charge+multiplicity line, then ``El x y z`` rows until a
        blank line."""
        with open(filename) as fh:
            lines = fh.read().splitlines()

        def _is_charge_mult(line):
            parts = line.split()
            if len(parts) != 2:
                return False
            try:
                int(parts[0]), int(parts[1])
                return True
            except ValueError:
                return False

        # anchor on the charge/multiplicity line (two bare integers)
        # rather than counting the blank-separated link0/route/title
        # sections — robust to missing or folded sections
        i = next((k + 1 for k, line in enumerate(lines)
                  if _is_charge_mult(line)), 0)
        species, coords = [], []
        for line in lines[i:]:
            parts = line.split()
            if len(parts) < 4:
                break
            try:
                xyz = [float(parts[1]), float(parts[2]), float(parts[3])]
            except ValueError:
                break
            # element may carry Gaussian decorations (C(Fragment=1), C-0)
            el = parts[0].split("(")[0].split("-")[0]
            species.append(el)
            coords.append(xyz)
        if not species:
            raise ValueError(f"no atoms parsed from {filename}")
        return cls(species, np.array(coords))

    @classmethod
    def from_mol(cls, filename: str) -> "Molecule":
        """MDL mol/sdf (V2000): counts on line 4, then natoms rows of
        ``x y z El ...``."""
        with open(filename) as fh:
            lines = fh.read().splitlines()
        if len(lines) < 4:
            raise ValueError(f"truncated mol file: {filename}")
        n = int(lines[3][:3])
        if n <= 0:
            raise ValueError(
                f"mol file declares {n} atoms (V3000 or malformed counts "
                f"line): {filename}")
        if len(lines) < 4 + n:
            raise ValueError(
                f"truncated mol file: counts line declares {n} atoms but "
                f"only {len(lines) - 4} atom lines follow: {filename}")
        species, coords = [], []
        for line in lines[4 : 4 + n]:
            parts = line.split()
            species.append(parts[3])
            coords.append([float(parts[0]), float(parts[1]),
                           float(parts[2])])
        return cls(species, np.array(coords))

    @classmethod
    def from_json(cls, filename: str) -> "Molecule":
        """pymatgen ``Molecule.as_dict()`` JSON: ``sites`` list with
        per-site ``species`` (element + occupancy) and ``xyz``."""
        import json as _json

        with open(filename) as fh:
            d = _json.load(fh)
        sites = d["sites"] if isinstance(d, dict) else d
        species, coords = [], []
        for s in sites:
            sp = s["species"]
            species.append(sp[0]["element"] if isinstance(sp, list)
                           else str(sp))
            coords.append([float(v) for v in s["xyz"]])
        return cls(species, np.array(coords))

    def to_xyz(self, filename: str, comment: str = "") -> None:
        with open(filename, "w") as fh:
            fh.write(f"{len(self)}\n{comment}\n")
            for s, c in zip(self.species, self.coords):
                fh.write(f"{s} {c[0]:.10f} {c[1]:.10f} {c[2]:.10f}\n")
