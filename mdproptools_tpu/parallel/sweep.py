"""
High-throughput multi-trajectory sweeps (BASELINE config: "batched
RDF/MSD/GK over 100+ trajectories frame-sharded across a mesh").

A sweep amortizes one compiled kernel across many trajectories of the
same system (same atom count/types — the usual replicate/ensemble
setting): the pair-kernel program is compiled once, each trajectory's
frames stream through it, and per-trajectory results return as one
stacked structure. With a mesh, each trajectory's frames additionally
shard over the ``frames`` axis (see ``mdproptools_tpu.parallel.mesh``).
"""

from typing import Optional, Sequence

import pandas as pd

from mdproptools_tpu.utilities.tracing import stage


def sweep_rdf(
    filenames: Sequence[str],
    r_cut,
    bin_size,
    num_types,
    mass,
    partial_relations,
    num_mols=None,
    num_atoms_per_mol=None,
    precision="fast",
    labels: Optional[Sequence[str]] = None,
) -> pd.DataFrame:
    """Atomic RDF for many trajectories; kernel compiled once.

    Returns a long-format DataFrame with a ``trajectory`` column
    prepended to the per-trajectory RDF columns.
    """
    from mdproptools_tpu.structural.rdf_cn import calc_atomic_rdf

    labels = list(labels) if labels is not None else [
        str(f) for f in filenames
    ]
    out = []
    for name, f in zip(labels, filenames):
        with stage("sweep_rdf", trajectory=name):
            df = calc_atomic_rdf(
                r_cut, bin_size, num_types, mass, partial_relations, f,
                num_mols=num_mols, num_atoms_per_mol=num_atoms_per_mol,
                save_mode=False, precision=precision,
            )
        df.insert(0, "trajectory", name)
        out.append(df)
    return pd.concat(out, ignore_index=True)


def sweep_msd(
    filenames: Sequence[str],
    msd_type="com",
    num_mols=None,
    num_atoms_per_mol=None,
    mass=None,
    timestep=1,
    units="real",
    precision="fast",
    labels: Optional[Sequence[str]] = None,
    dimension=3,
):
    """MSD + diffusion coefficients for many trajectories.

    Returns (msd_long, diffusion_long) DataFrames with a ``trajectory``
    column.
    """
    import os
    import tempfile

    from mdproptools_tpu.dynamical.diffusion import Diffusion

    labels = list(labels) if labels is not None else [
        str(f) for f in filenames
    ]
    msd_out, diff_out = [], []
    for name, f in zip(labels, filenames):
        outputs_dir, fname = os.path.split(f)
        d = Diffusion(timestep=timestep, units=units,
                      outputs_dir=outputs_dir or ".",
                      diff_dir=tempfile.mkdtemp(prefix="mdpt_sweep_"))
        with stage("sweep_msd", trajectory=name):
            msd, _ = d.get_msd_from_dump(
                fname, msd_type=msd_type, num_mols=num_mols,
                num_atoms_per_mol=num_atoms_per_mol, mass=mass,
                precision=precision,
            )
            diff = d.calc_diff(msd, dimension=dimension)
        msd.insert(0, "trajectory", name)
        diff = diff.reset_index(names="species")
        diff.insert(0, "trajectory", name)
        msd_out.append(msd)
        diff_out.append(diff)
    return (pd.concat(msd_out, ignore_index=True),
            pd.concat(diff_out, ignore_index=True))


def sweep_conductivity(
    filenames: Sequence[str],
    num_mols,
    num_atoms_per_mol,
    volume,
    mass=None,
    temp=298.15,
    timestep=1,
    units="real",
    tol=1e-4,
    precision="fast",
    labels: Optional[Sequence[str]] = None,
) -> pd.DataFrame:
    """Green-Kubo conductivity for many trajectories (replicates).

    Returns a DataFrame: one row per trajectory, sigma per molecule type
    plus total, and the ensemble mean/std rows appended.
    """
    import os

    from mdproptools_tpu.dynamical.conductivity import Conductivity

    labels = list(labels) if labels is not None else [
        str(f) for f in filenames
    ]
    rows = []
    for name, f in zip(labels, filenames):
        working_dir, fname = os.path.split(f)
        cond = Conductivity(
            fname, num_mols, num_atoms_per_mol, volume, mass=mass,
            temp=temp, timestep=timestep, units=units,
            working_dir=working_dir or ".", precision=precision,
        )
        with stage("sweep_cond", trajectory=name):
            j = cond.get_charge_flux()
            tot = cond.correlate_charge_flux(j)
            integ = cond.integrate_charge_flux_correlation(tot)
            ave, _ = cond.fit_curve(tot, integ, tol)
            sigma = cond.green_kubo(ave)
        rows.append([name] + list(sigma))
    cols = ["trajectory"] + [
        f"sigma_{i + 1}" for i in range(len(num_mols))
    ] + ["sigma_total"]
    df = pd.DataFrame(rows, columns=cols)
    stats = df.drop(columns="trajectory")
    df = pd.concat(
        [
            df,
            pd.DataFrame(
                [["mean"] + stats.mean().tolist(),
                 ["std"] + stats.std().tolist()],
                columns=cols,
            ),
        ],
        ignore_index=True,
    )
    return df
