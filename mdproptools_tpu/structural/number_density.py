"""
1-D number-density profiles vs distance from a surface.

API-compatible with the reference
``mdproptools/structural/number_density.py`` (``calc_number_density:30``):
per frame, bin the coordinates of each requested atom type along the
axis normal to the interface (defined by the min/max extent of the
surface atom type), normalize by slab volume, average over frames.

Fixes vs the reference (documented divergences):
- ``np.int`` (number_density.py:49) and ``np.product``
  (number_density.py:118) break on NumPy >= 1.24; replaced with ``int``
  / ``np.prod`` — semantics unchanged;
- the reference's negative bin indices (for ``dist_from_interface > 0``
  it shifts by the surface thickness, so in-surface atoms get negative
  bins that *wrap to the array tail* via Python indexing,
  number_density.py:93-96) are reproduced exactly with an explicit
  modulo, and like the reference an atom whose bin falls outside
  [-num_bins, num_bins) raises IndexError.
"""

import os

import numpy as np

from mdproptools_tpu.common.system import altered_atom_types
from mdproptools_tpu.io.lammps_dump import read_trajectory
from mdproptools_tpu.structural.rdf_cn import _radii, _save_rdf


def calc_number_density(
    dump_pattern,
    surface_atom,
    atom_types,
    bin_size,
    dist_from_interface,
    axis_norm_interface,
    num_mols=None,
    num_atoms_per_mol=None,
    working_dir=None,
    results_file="number_density.csv",
    save_mode=True,
):
    """Density profiles of ``atom_types`` vs distance from the
    ``surface_atom`` slab along x/y/z. Assumes a one-atom-type surface,
    like the reference (number_density.py:43)."""
    working_dir = working_dir or os.getcwd()
    traj = read_trajectory(os.path.join(working_dir, dump_pattern),
                           columns=["id", "type", "x", "y", "z"])
    num_bins = int(abs(dist_from_interface) / bin_size)
    atom_types = list(atom_types)
    partial_relations = np.array(
        [np.full(len(atom_types), surface_atom, dtype=np.int64), atom_types]
    )
    if num_mols and num_atoms_per_mol:
        ids = traj.col("id")[0].astype(np.int64)
        codes = altered_atom_types(ids, num_mols, num_atoms_per_mol)
    else:
        codes = traj.col("type")[0].astype(np.int64)

    axis_idx = {"x": 0, "y": 1, "z": 2}[axis_norm_interface]
    rho_part_sum = np.zeros((len(atom_types), num_bins))
    T = traj.n_frames
    coord_all = traj.col(axis_norm_interface)  # (T, N), one copy
    for t in range(T):
        coord = coord_all[t].copy()
        surface = coord[codes == surface_atom]
        if surface.size == 0:
            raise ValueError(
                f"no atoms of surface type {surface_atom} in frame {t}"
            )
        min_dist = surface.min()
        max_dist = surface.max()
        dist_range = max_dist - min_dist
        coord -= min_dist
        rho_part = np.zeros((len(atom_types), num_bins))
        for i, j in enumerate(atom_types):
            if dist_from_interface > 0:
                b = coord[(codes == j) & (coord < dist_from_interface)]
                b = b - dist_range
            else:
                b = coord[(codes == j) & (coord > dist_from_interface)]
            bins = np.trunc(b / bin_size).astype(np.int64)
            if bins.size and (bins.min() < -num_bins or
                              bins.max() >= num_bins):
                raise IndexError(
                    f"bin index out of range for atom type {j} (the "
                    "reference fails identically here); check "
                    "dist_from_interface/bin_size"
                )
            np.add.at(rho_part[i], bins % num_bins, 1)
        box_lengths = traj.box_lengths[t]
        cross_section = np.prod(
            [box_lengths[a] for a in range(3) if a != axis_idx]
        )
        rho_part_sum += rho_part / (cross_section * bin_size)
    rho_part_sum /= T
    return _save_rdf(
        _radii(bin_size, num_bins),
        partial_relations.T,
        os.path.join(working_dir, results_file),
        save_mode,
        rho_part_sum,
    )
