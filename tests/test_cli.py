"""CLI smoke tests (strict CPU path, tiny inputs)."""

import os

import numpy as np
import pytest

from mdproptools_tpu.cli import build_parser, main


def test_parser_builds_all_subcommands():
    ap = build_parser()
    for cmd in ["rdf", "cn", "msd", "conductivity", "viscosity",
                "residence", "clusters", "density", "hydration"]:
        with pytest.raises(SystemExit):
            ap.parse_args([cmd, "--help"])


def test_cli_rdf_end_to_end(mg_tfsi_dme_dir, tmp_path, capsys):
    out = str(tmp_path / "rdf.csv")
    rc = main([
        "rdf",
        "--dumps", os.path.join(mg_tfsi_dme_dir, "dump.nvt.0.dump"),
        "--r-cut", "5", "--bin-size", "0.1", "--num-types", "9",
        "--mass", "16,12.01,1.008,14.01,32.06,16,12.01,19,24.305",
        "--relations", "8-1,9-1",
        "--out", out, "--precision", "strict",
    ])
    assert rc == 0
    assert os.path.exists(out)
    import pandas as pd

    df = pd.read_csv(out)
    assert list(df.columns) == ["r ($\\AA$)", "g_full(r)", "g_8-1", "g_9-1"]
    assert len(df) == 50


def test_cli_analyze_composite(mg_tfsi_dme_dir, tmp_path, capsys):
    import shutil

    for ts in [0, 50000, 100000]:
        shutil.copy(os.path.join(mg_tfsi_dme_dir, f"dump.nvt.{ts}.dump"),
                    tmp_path)
    rc = main([
        "analyze",
        "--dumps", "dump.nvt.*.dump",
        "--num-types", "9",
        "--mass", "16,12.01,1.008,14.01,32.06,16,12.01,19,24.305",
        "--num-mols", "591,66,33", "--num-atoms-per-mol", "16,15,1",
        "--r-cut", "5", "--bin-size", "0.1", "--relations", "8-1,9-1",
        "--residence-shells", "0:2.8", "--residence-relations", "9-1",
        "--working-dir", str(tmp_path), "--precision", "strict",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "rdf.csv")
    assert os.path.exists(tmp_path / "auto_correlation.csv")
    captured = capsys.readouterr().out
    assert "diffusion" in captured  # MSD leg printed calc_diff output
    assert "residence C(t)" in captured


def test_cli_cache_build_and_reuse(mg_tfsi_dme_dir, tmp_path, capsys):
    """`mdpt cache` builds the columnar cache; a later CLI rdf run on
    the same pattern is served from it and matches the text-parse run
    exactly."""
    import shutil

    import pandas as pd

    for ts in [0, 50000, 100000]:
        shutil.copy(os.path.join(mg_tfsi_dme_dir, f"dump.nvt.{ts}.dump"),
                    tmp_path)
    pattern = str(tmp_path / "dump.nvt.*.dump")
    common = [
        "--r-cut", "5", "--bin-size", "0.1", "--num-types", "9",
        "--mass", "16,12.01,1.008,14.01,32.06,16,12.01,19,24.305",
        "--relations", "8-1,9-1", "--precision", "strict",
    ]
    out_text = str(tmp_path / "rdf_text.csv")
    assert main(["rdf", "--dumps", pattern, "--out", out_text,
                 *common]) == 0

    rc = main(["cache", "--dumps", pattern,
               "--columns", "id,type,x,y,z"])
    assert rc == 0
    assert "cache built at" in capsys.readouterr().out
    from mdproptools_tpu.io.cache import load_meta

    assert load_meta(pattern) is not None

    out_cached = str(tmp_path / "rdf_cached.csv")
    assert main(["rdf", "--dumps", pattern, "--out", out_cached,
                 *common]) == 0
    a = pd.read_csv(out_text)
    b = pd.read_csv(out_cached)
    np.testing.assert_array_equal(a.to_numpy(), b.to_numpy())


def test_cli_relations_parsing():
    from mdproptools_tpu.cli import _relations, _shells

    assert _relations("8-1,8-4") == [[8, 8], [1, 4]]
    assert _shells("0:2.6,1:3.2") == [(0.0, 2.6), (1.0, 3.2)]


def test_cli_sweep(tmp_path):
    import sys
    from pathlib import Path

    import numpy as np
    import pandas as pd

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from helpers import write_traj

    from mdproptools_tpu.cli import main

    rng = np.random.default_rng(5)
    box, n = 12.0, 64
    cols = ["id", "type", "x", "y", "z"]
    patterns = []
    for rep in range(2):
        d = tmp_path / f"rep{rep}"
        d.mkdir()
        frames, ts = [], list(range(0, 3000, 1000))
        for _ in ts:
            data = np.zeros((n, len(cols)))
            data[:, 0] = np.arange(1, n + 1)
            data[:, 1] = [1] * 32 + [2] * 32
            data[:, 2:5] = rng.uniform(0, box, (n, 3))
            frames.append(data)
        patterns.append(write_traj(str(d), ts, 0.0, box, cols, frames))
    out = tmp_path / "sweep.csv"
    rc = main(["sweep", "--dumps", *patterns, "--r-cut", "5", "--bin-size",
               "0.5", "--num-types", "2", "--mass", "1.0,2.0",
               "--relations", "1-2", "--precision", "strict",
               "--labels", "a,b", "--out", str(out)])
    assert rc == 0
    df = pd.read_csv(out)
    assert set(df["trajectory"]) == {"a", "b"}
    assert "g_1-2" in df.columns
