"""
Multi-part LAMMPS thermo-log concatenation (reference:
``mdproptools/utilities/log.py:10-28``): glob the pattern, sort parts by
the wildcard integer, drop each part's duplicated last row (LAMMPS
repeats the final thermo line at restart), concatenate.
"""

import glob
import os
import re

import pandas as pd

from mdproptools_tpu.io.lammps_log import parse_lammps_log


def concat_log(log_pattern, step=None, working_dir=None):
    """Concatenate multi-part LAMMPS logs into one DataFrame.

    PRESERVED REFERENCE QUIRK (``log.py:26-27``): the VALUE of ``step``
    is ignored — any truthy ``step`` subsamples the concatenated log at
    a hardcoded stride of 50,000 rows starting at row 1, exactly as the
    reference does (``full_log.loc[range(1, n, 50000)]``). Pass
    ``step=None`` (default) to keep every row; do not expect
    ``step=10`` to mean a stride of 10.
    """
    working_dir = working_dir or os.getcwd()
    files = glob.glob(f"{working_dir}/{log_pattern}")
    if not files:
        raise FileNotFoundError(
            f"no log files match {log_pattern!r} in {working_dir}"
        )
    if len(files) > 1:
        pattern = ".*" + re.escape(log_pattern).replace(r"\*", "([0-9]+)")

        def key(f):
            m = re.match(pattern, f)
            return int(m.group(1)) if m else 0

        files = sorted(files, key=key)
    logs = [parse_lammps_log(f)[0] for f in files]
    # each part except the last repeats its final row at the start of the
    # next part -> drop it (log.py:22-23)
    logs = [l.iloc[:-1] for l in logs[:-1]] + [logs[-1]]
    full_log = pd.concat(logs, ignore_index=True)
    if step:
        full_log = full_log.loc[range(1, full_log.shape[0], 50000)]
    return full_log
