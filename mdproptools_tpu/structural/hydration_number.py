"""
Cation-water orientation angles and hydration factor.

API-compatible with the reference
``mdproptools/structural/hydration_number.py`` (``get_angle:13``,
``get_all_angles:35``, ``get_hydration_number:78``): for every cation
(by molecule type) and every water molecule whose first atom (oxygen)
lies within ``r_cut``, the cosine of the angle between the O->cation
vector and the water bisector vector (H1 + H2 - 2 O); the hydration
factor is the per-cation fraction of cosines < -0.72, averaged over
cations then frames.

Fixes vs the reference (documented divergences):
- the reference module cannot be imported as packaged (its ``from rdf_cn
  import ...`` at hydration_number.py:8 is not package-relative);
- a cation with no waters inside ``r_cut`` raises ZeroDivisionError in
  the reference (hydration_number.py:32); here it contributes 0 to the
  hydration factor and no angles.

The per-frame math is one vectorized (cations x waters) minimum-image
pass instead of the reference's per-cation pandas loop inside a process
pool (hydration_number.py:70-89).
"""

import os

import numpy as np
import pandas as pd

from mdproptools_tpu.common.system import System
from mdproptools_tpu.io.lammps_dump import read_trajectory


def _min_image(d, L):
    c = (d > L / 2) | (d < -L / 2)
    d = d.copy()
    d[c] -= np.sign(d[c]) * L
    return d


def get_hydration_number(
    dump_pattern,
    cation_type,
    water_type,
    r_cut,
    alter_atom_ids=False,
    num_mols=None,
    num_atoms_per_mol=None,
    working_dir=None,
):
    """Angle distribution + hydration factor; saves angles_df.csv.

    ``cation_type`` / ``water_type`` are 1-based MOLECULE types (the
    reference selects on its ``mol_type`` column,
    hydration_number.py:54-55)."""
    working_dir = working_dir or os.getcwd()
    traj = read_trajectory(os.path.join(working_dir, dump_pattern))
    system = System(num_mols, num_atoms_per_mol)
    mol_type = system.mol_type
    cation_sel = np.nonzero(mol_type == cation_type)[0]
    water_sel = np.nonzero(mol_type == water_type)[0]
    if cation_sel.size == 0 or water_sel.size == 0:
        raise ValueError("no atoms match cation_type/water_type")
    # water atoms grouped per molecule; first atom = coordinating (O),
    # atoms 2 and 3 define the bisector (hydration_number.py:60-67)
    napm = system.num_atoms_per_mol[water_type - 1]
    if napm < 3:
        raise ValueError("water molecule type must have >= 3 atoms")
    w_atoms = water_sel.reshape(-1, napm)  # (n_waters, atoms_per_water)

    all_cos = []
    factors = []
    n_frames = traj.n_frames
    pos_all = traj.cols(["x", "y", "z"])  # hoisted: cols() copies (T,N,3)
    for t in range(n_frames):
        pos = pos_all[t]
        lengths = traj.box_lengths[t]
        cat = pos[cation_sel]  # (C, 3)
        o = pos[w_atoms[:, 0]]  # (W, 3)
        vec = pos[w_atoms[:, 1]] + pos[w_atoms[:, 2]] - 2 * o  # (W, 3)
        # minimum-image cation - O displacement (reference _calc_rsq order:
        # head - others)
        d = cat[:, None, :] - o[None, :, :]  # (C, W, 3)
        for ax in range(3):
            d[:, :, ax] = _min_image(d[:, :, ax], lengths[ax])
        rsq = np.sum(d * d, axis=2)
        within = rsq < r_cut**2
        dot = np.einsum("cwk,wk->cw", d, vec)
        norm1 = np.sqrt(rsq)
        norm2 = np.linalg.norm(vec, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = dot / (norm1 * norm2[None, :])
        frame_factor = 0.0
        for c in range(cat.shape[0]):
            sel = within[c]
            vals = cos[c, sel]
            all_cos.extend(vals.tolist())
            if vals.size:
                frame_factor += (vals < -0.72).sum() / vals.size
        factors.append(frame_factor / cat.shape[0])

    angles_df = pd.DataFrame(all_cos, columns=["angles_distribution"])
    angles_df["hydration_factor"] = sum(factors) / len(factors)
    angles_df.to_csv(os.path.join(working_dir, "angles_df.csv"))
    return angles_df
