"""
LAMMPS thermo-log parser (replaces the reference's
``pymatgen...parse_lammps_log``, used at ``viscosity.py:211``,
``log.py:21``, ``diffusion.py:258``).

A log file contains one thermo section per run: a header line whose first
token is ``Step`` (one-line thermo style), followed by all-numeric rows,
terminated by the first non-numeric line (``Loop time of ...``, a
warning, or EOF). Returns one DataFrame per section, like the reference
parser.
"""

from typing import List

import numpy as np
import pandas as pd


def _is_numeric_row(tokens: List[str]) -> bool:
    if not tokens:
        return False
    for t in tokens:
        try:
            float(t)
        except ValueError:
            return False
    return True


def parse_lammps_log(filename: str) -> List[pd.DataFrame]:
    """Parse every thermo section of a LAMMPS log into DataFrames."""
    with open(filename, "r") as fh:
        lines = fh.read().splitlines()

    sections: List[pd.DataFrame] = []
    i = 0
    n = len(lines)
    while i < n:
        tokens = lines[i].split()
        if tokens and tokens[0] == "Step":
            header = tokens
            rows = []
            i += 1
            while i < n:
                row = lines[i].split()
                if len(row) == len(header) and _is_numeric_row(row):
                    rows.append(row)
                    i += 1
                else:
                    break
            if rows:
                data = np.array(rows, dtype=np.float64)
                sections.append(pd.DataFrame(data, columns=header))
        else:
            i += 1
    return sections


def write_lammps_log(filename: str, sections: List[pd.DataFrame]) -> None:
    """Write thermo sections in LAMMPS log format (used by the test suite
    to synthesize logs, since the bundled logs are git-LFS pointers)."""
    with open(filename, "w") as fh:
        fh.write("LAMMPS log (synthetic)\n")
        for df in sections:
            fh.write(" ".join(df.columns) + "\n")
            for _, row in df.iterrows():
                fh.write(" ".join(f"{v:.10g}" for v in row.to_numpy()) + "\n")
            fh.write("Loop time of 0.0 on 1 procs\n")
