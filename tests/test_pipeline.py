"""Shared-parse composite pipeline: one parse must produce EXACTLY the
same results as the three separate entry points (same streams, same
fold order — bit equality expected)."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from mdproptools_tpu import pipeline
from mdproptools_tpu.dynamical.conductivity import Conductivity
from mdproptools_tpu.dynamical.diffusion import Diffusion
from mdproptools_tpu.structural.rdf_cn import calc_atomic_rdf

MASS = [16.0, 12.01, 1.008, 14.01, 32.06, 16.0, 12.01, 19.0, 24.305]
NUM_MOLS = [591, 66, 33]
NUM_APM = [16, 15, 1]
RELS = [[8, 8], [1, 8]]
VOL = 49.182349 ** 3


@pytest.fixture(scope="module")
def five_frame_dir(mg_tfsi_dme_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe_dumps")
    for ts in [0, 50000, 100000, 150000, 200000]:
        shutil.copy(os.path.join(mg_tfsi_dme_dir, f"dump.nvt.{ts}.dump"), d)
    return str(d)


def test_pipeline_matches_separate_calls(five_frame_dir, tmp_path):
    out = pipeline.analyze(
        "dump.nvt.*.dump", 9, MASS, num_mols=NUM_MOLS,
        num_atoms_per_mol=NUM_APM,
        rdf=dict(r_cut=8.0, bin_size=0.2, partial_relations=RELS,
                 save_mode=False),
        msd=dict(msd_type="com", calc_diff=False),
        conductivity=dict(volume=VOL, fit=False),
        precision="strict", working_dir=five_frame_dir,
    )
    assert "sigma" not in out  # fit=False: 5 frames have no plateau

    want_rdf = calc_atomic_rdf(
        8.0, 0.2, 9, MASS, RELS, f"{five_frame_dir}/dump.nvt.*.dump",
        save_mode=False, precision="strict")
    pd.testing.assert_frame_equal(out["rdf"], want_rdf)

    d = Diffusion(timestep=1, units="real", outputs_dir=five_frame_dir,
                  diff_dir=str(tmp_path))
    want_msd, want_all = d.get_msd_from_dump(
        "dump.nvt.*.dump", msd_type="com", num_mols=NUM_MOLS,
        num_atoms_per_mol=NUM_APM, mass=MASS, precision="strict")
    pd.testing.assert_frame_equal(out["msd"], want_msd)
    pd.testing.assert_frame_equal(out["msd_all"], want_all)

    cond = Conductivity(
        "dump.nvt.*.dump", NUM_MOLS, NUM_APM, volume=VOL, mass=MASS,
        working_dir=five_frame_dir, precision="strict")
    j = cond.get_charge_flux()
    tot = cond.correlate_charge_flux(j)
    integ = cond.integrate_charge_flux_correlation(tot)
    np.testing.assert_array_equal(out["charge_flux_corr"], tot)
    np.testing.assert_array_equal(out["integral"], integ)


def test_pipeline_rejects_empty_request(five_frame_dir):
    with pytest.raises(ValueError, match="nothing to analyze"):
        pipeline.analyze("dump.nvt.*.dump", 9, MASS,
                         working_dir=five_frame_dir)


def test_analyze_empty_dict_runs_leg_with_defaults(five_frame_dir,
                                                   tmp_path):
    """msd={} means 'MSD with all defaults' (every key has a default) —
    it must run the leg, not be skipped as falsy. Legs with REQUIRED
    keys (rdf: r_cut/bin_size/relations; conductivity: volume) raise a
    clear ValueError up front instead of a mid-stream KeyError."""
    out = pipeline.analyze(
        "dump.nvt.*.dump", 9, MASS, num_mols=NUM_MOLS,
        num_atoms_per_mol=NUM_APM, msd={}, precision="strict",
        working_dir=five_frame_dir,
    )
    assert "msd" in out and "diffusion" in out

    with pytest.raises(ValueError, match="requires"):
        pipeline.analyze("dump.nvt.*.dump", 9, MASS, num_mols=NUM_MOLS,
                         num_atoms_per_mol=NUM_APM, rdf={},
                         working_dir=five_frame_dir)
    with pytest.raises(ValueError, match="volume"):
        pipeline.analyze("dump.nvt.*.dump", 9, MASS, num_mols=NUM_MOLS,
                         num_atoms_per_mol=NUM_APM, conductivity={},
                         working_dir=five_frame_dir)


def test_pipeline_residence_leg_matches_separate_call(five_frame_dir):
    """The residence_time= leg rides the shared parse and must be
    bit-identical to ResidenceTime.calc_auto_correlation (same stream,
    same fold order)."""
    from mdproptools_tpu.dynamical.residence_time import ResidenceTime

    out = pipeline.analyze(
        "dump.nvt.*.dump", 9, MASS, num_mols=NUM_MOLS,
        num_atoms_per_mol=NUM_APM,
        rdf=dict(r_cut=8.0, bin_size=0.2, partial_relations=RELS,
                 save_mode=False),
        residence_time=dict(r_cut=[(0.0, 2.8)],
                            partial_relations=[[9], [1]]),
        precision="strict", working_dir=five_frame_dir,
    )
    want = ResidenceTime(
        [(0.0, 2.8)], [[9], [1]], f"{five_frame_dir}/dump.nvt.*.dump",
        working_dir=five_frame_dir, precision="strict",
    ).calc_auto_correlation()
    pd.testing.assert_frame_equal(out["residence_corr"], want)


def test_pipeline_hydration_and_number_density_legs(five_frame_dir):
    """The hydration= and number_density= legs ride the shared parse and
    must be bit-identical to the standalone entry points."""
    from mdproptools_tpu.structural.hydration_number import (
        get_hydration_number,
    )
    from mdproptools_tpu.structural.number_density import (
        calc_number_density,
    )

    out = pipeline.analyze(
        "dump.nvt.*.dump", 9, MASS, num_mols=NUM_MOLS,
        num_atoms_per_mol=NUM_APM,
        hydration=dict(cation_type=3, water_type=1, r_cut=3.0),
        number_density=dict(surface_atom=9, atom_types=[1, 8],
                            bin_size=0.5, dist_from_interface=49.2,
                            axis_norm_interface="z", save_mode=False),
        precision="strict", working_dir=five_frame_dir,
    )
    want_h = get_hydration_number(
        "dump.nvt.*.dump", cation_type=3, water_type=1, r_cut=3.0,
        num_mols=NUM_MOLS, num_atoms_per_mol=NUM_APM,
        working_dir=five_frame_dir)
    pd.testing.assert_frame_equal(out["hydration"], want_h)
    want_nd = calc_number_density(
        "dump.nvt.*.dump", surface_atom=9, atom_types=[1, 8],
        bin_size=0.5, dist_from_interface=49.2, axis_norm_interface="z",
        working_dir=five_frame_dir, save_mode=False)
    pd.testing.assert_frame_equal(out["number_density"], want_nd)
