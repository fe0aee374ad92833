"""Capped-RSS segmented RDF runner (``parallel.segmented``) and the
``skip_frames`` stream seek it rides on.

The segmented runner exists because the tunneled TPU client retains
every uploaded byte in host RSS for the process lifetime
(``benchmarks/memory_probe.json``); on the cpu backend the process
boundary is semantically identical, so these tests pin the maths:
single-segment bit-equality with the direct entry point, and
multi-segment agreement to the f64 re-association ulp."""

import os

import numpy as np
import pandas as pd
import pytest

from mdproptools_tpu.io.lammps_dump import (
    iter_trajectory_blocks,
    read_trajectory,
)
from mdproptools_tpu.parallel.segmented import calc_atomic_rdf_segmented
from mdproptools_tpu.structural.rdf_cn import calc_atomic_rdf

MASS = [16.0, 12.01, 1.008, 14.01, 32.06, 16.0, 12.01, 19.0, 24.305]
RELATIONS = [[8, 8], [1, 4]]


def test_skip_frames_text_matches_slice(dump_pattern):
    full = read_trajectory(dump_pattern, columns=["id", "type", "x"])
    blocks = list(iter_trajectory_blocks(
        dump_pattern, columns=["id", "type", "x"], skip_frames=3,
        max_frames=2, cache=False))
    got = np.concatenate([b.data for b in blocks])
    np.testing.assert_array_equal(got, full.data[3:5])
    ts = np.concatenate([b.timesteps for b in blocks])
    np.testing.assert_array_equal(ts, full.timesteps[3:5])


def test_skip_frames_past_end_is_empty(dump_pattern):
    blocks = list(iter_trajectory_blocks(
        dump_pattern, columns=["id", "type", "x"], skip_frames=99,
        cache=False))
    assert blocks == []


def test_skip_frames_cache_matches_text(dump_pattern, tmp_path):
    from mdproptools_tpu.io.cache import build_cache, load_meta

    cdir = str(tmp_path / "cache")
    build_cache(dump_pattern, cdir, columns=["id", "type", "x", "y", "z"])
    meta = load_meta(dump_pattern, cdir)
    assert meta is not None
    from mdproptools_tpu.io.cache import iter_cached_blocks

    got = np.concatenate([
        b.data for b in iter_cached_blocks(
            meta, columns=["id", "type", "x", "y", "z"], skip_frames=2,
            max_frames=3)
    ])
    full = read_trajectory(dump_pattern,
                           columns=["id", "type", "x", "y", "z"])
    np.testing.assert_array_equal(got, full.data[2:5])


def test_entry_point_frame_window(dump_pattern, tmp_path):
    """calc_atomic_rdf over a [skip, skip+max) window == the same
    average computed from the full stream's per-frame rows."""
    df_win = calc_atomic_rdf(
        8.0, 0.1, 9, MASS, RELATIONS, dump_pattern,
        save_mode=False, skip_frames=2, max_frames=3)
    total, T = calc_atomic_rdf(
        8.0, 0.1, 9, MASS, RELATIONS, dump_pattern,
        save_mode=False, skip_frames=2, max_frames=3, _return_sum=True)
    assert T == 3
    np.testing.assert_array_equal(
        np.asarray(df_win["g_full(r)"]), total[0] / T)


def test_segmented_single_segment_bit_equal(dump_pattern):
    direct = calc_atomic_rdf(
        8.0, 0.1, 9, MASS, RELATIONS, dump_pattern, save_mode=False)
    seg = calc_atomic_rdf_segmented(
        8.0, 0.1, 9, MASS, RELATIONS, dump_pattern, save_mode=False,
        frames_per_process=100, platform="cpu")
    pd.testing.assert_frame_equal(direct, seg)


def test_segmented_multi_segment_strict_matches_to_ulp(dump_pattern):
    """Strict (f64 end-to-end) segmentation re-associates the f64
    accumulation at the two segment boundaries only: agreement to the
    last ulp. (The production TPU default — fast + exact-bins — folds
    per-frame f64 normalized rows and has the same property; plain
    fast-f32 re-chunks its in-block f32 device accumulation instead,
    tested separately below.)"""
    direct = calc_atomic_rdf(
        8.0, 0.1, 9, MASS, RELATIONS, dump_pattern, save_mode=False,
        precision="strict")
    seg = calc_atomic_rdf_segmented(
        8.0, 0.1, 9, MASS, RELATIONS, dump_pattern, save_mode=False,
        frames_per_process=3, precision="strict", platform="cpu")
    # 7 bundled frames -> segments of 3 + 3 + 1
    np.testing.assert_allclose(
        np.asarray(seg)[:, 1:], np.asarray(direct)[:, 1:],
        rtol=1e-13, atol=0)
    assert not np.asarray(seg.isna()).any()


def test_segmented_multi_segment_fast_f32_envelope(dump_pattern):
    """Plain fast-f32 (no exact-bins on cpu): segment boundaries
    re-chunk the per-block f32 device accumulation — differences stay
    inside the documented f32 envelope (~1e-6 relative)."""
    direct = calc_atomic_rdf(
        8.0, 0.1, 9, MASS, RELATIONS, dump_pattern, save_mode=False)
    seg = calc_atomic_rdf_segmented(
        8.0, 0.1, 9, MASS, RELATIONS, dump_pattern, save_mode=False,
        frames_per_process=3, platform="cpu")
    np.testing.assert_allclose(
        np.asarray(seg)[:, 1:], np.asarray(direct)[:, 1:],
        rtol=5e-6, atol=1e-5)


def test_segmented_rejects_bad_segment_size(dump_pattern):
    with pytest.raises(ValueError, match="frames_per_process"):
        calc_atomic_rdf_segmented(
            8.0, 0.1, 9, MASS, RELATIONS, dump_pattern,
            save_mode=False, frames_per_process=0, platform="cpu")


def test_upload_accounting_warns(monkeypatch, caplog):
    from mdproptools_tpu.utilities import device

    monkeypatch.setattr(device, "_uploaded_bytes", 0)
    monkeypatch.setattr(device, "_upload_warned", False)
    monkeypatch.setenv("MDPT_UPLOAD_WARN_GB", "0.000001")

    import jax

    # accounting is a no-op on cpu (no retention there); fake the
    # backend check
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    import logging

    with caplog.at_level(logging.WARNING, logger="mdproptools_tpu"):
        device.note_upload(10_000)
    assert device.uploaded_bytes() == 10_000
    assert any("segmented" in r.message for r in caplog.records)
