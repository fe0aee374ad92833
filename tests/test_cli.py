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


def test_cli_relations_parsing():
    from mdproptools_tpu.cli import _relations, _shells

    assert _relations("8-1,8-4") == [[8, 8], [1, 4]]
    assert _shells("0:2.6,1:3.2") == [(0.0, 2.6), (1.0, 3.2)]
