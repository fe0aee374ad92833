"""
LAMMPS thermo-log parser (replaces the reference's
``pymatgen...parse_lammps_log``, used at ``viscosity.py:211``,
``log.py:21``, ``diffusion.py:258``).

Handles the thermo styles pymatgen's parser covers:

- ``one`` / ``custom`` styles: a header line of column names (any
  order — ``Step`` need not be first) followed by all-numeric rows,
  terminated by the first non-conforming line (``Loop time of ...`` or
  EOF). ``WARNING: ...`` lines interleaved MID-SECTION (real LAMMPS
  emits bond/neighbor warnings between thermo rows) are skipped without
  ending the section, and a truncated final row (a killed run writes a
  partial line) is dropped — both cases crash the reference's
  pymatgen ``pd.read_csv`` path;
- ``multi`` style: per-step blocks introduced by
  ``---- Step N ----- CPU = x (sec) ----`` followed by lines of
  ``Name = value`` triplets; consecutive step blocks form one section.

Returns one DataFrame per thermo section, like the reference parser.
"""

import re
from typing import List

import numpy as np
import pandas as pd

_IDENT = re.compile(r"^[A-Za-z_][\w\[\]/.\-]*$")
_MULTI_STEP = re.compile(
    r"^-+\s*Step\s+(\d+)\s*-+\s*CPU\s*=\s*([0-9.eE+-]+)\s*(?:\(sec\))?\s*-*"
)


def _is_numeric_row(tokens: List[str]) -> bool:
    if not tokens:
        return False
    for t in tokens:
        try:
            float(t)
        except ValueError:
            return False
    return True


def _is_header_row(tokens: List[str]) -> bool:
    """A plausible thermo header: >= 2 identifier-like tokens including
    a ``Step`` column (every LAMMPS thermo_style prints Step)."""
    return (
        len(tokens) >= 2
        and "Step" in tokens
        and all(_IDENT.match(t) for t in tokens)
    )


def parse_lammps_log(filename: str) -> List[pd.DataFrame]:
    """Parse every thermo section of a LAMMPS log into DataFrames."""
    with open(filename, "r") as fh:
        lines = fh.read().splitlines()

    sections: List[pd.DataFrame] = []
    i = 0
    n = len(lines)
    multi_rows: List[dict] = []  # accumulating 'multi' step blocks

    def flush_multi():
        nonlocal multi_rows
        if multi_rows:
            sections.append(pd.DataFrame(multi_rows))
            multi_rows = []

    while i < n:
        if not lines[i].strip():  # blank lines don't break a section
            i += 1
            continue
        tokens = lines[i].split()
        m = _MULTI_STEP.match(lines[i])
        if m:
            row = {"Step": float(m.group(1)), "CPU": float(m.group(2))}
            i += 1
            while i < n:
                parts = lines[i].replace("=", " = ").split()
                # lines of repeated "Name = value" triplets
                if (len(parts) >= 3 and len(parts) % 3 == 0
                        and all(parts[k] == "=" for k in range(1, len(parts), 3))
                        and all(_IDENT.match(parts[k])
                                for k in range(0, len(parts), 3))
                        and _is_numeric_row(parts[2::3])):
                    for k in range(0, len(parts), 3):
                        row[parts[k]] = float(parts[k + 2])
                    i += 1
                else:
                    break
            multi_rows.append(row)
            continue
        if (_is_header_row(tokens) and i + 1 < n
                and len(lines[i + 1].split()) == len(tokens)
                and _is_numeric_row(lines[i + 1].split())):
            flush_multi()
            header = tokens
            rows = []
            i += 1
            while i < n:
                row = lines[i].split()
                if len(row) == len(header) and _is_numeric_row(row):
                    rows.append(row)
                    i += 1
                elif (lines[i].startswith("WARNING:")
                      or not lines[i].strip()):
                    # LAMMPS interleaves warnings (and the odd blank
                    # line) between thermo rows; the section continues
                    i += 1
                else:
                    # terminator ("Loop time of ..."), a new section, or
                    # a truncated final row from a killed run (wrong
                    # width / cut mid-number) — either way the row is
                    # not data
                    break
            if rows:
                data = np.array(rows, dtype=np.float64)
                sections.append(pd.DataFrame(data, columns=header))
            continue
        flush_multi()
        i += 1
    flush_multi()
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
