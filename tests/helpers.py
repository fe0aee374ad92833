"""Synthetic LAMMPS dump writer for tests."""

import numpy as np


def write_dump(path, timestep, box_lo, box_hi, columns, data):
    """Write one frame in LAMMPS dump format."""
    with open(path, "w") as fh:
        fh.write("ITEM: TIMESTEP\n%d\n" % timestep)
        fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % data.shape[0])
        fh.write("ITEM: BOX BOUNDS pp pp pp\n")
        for ax in range(3):
            fh.write(f"{box_lo:.16e} {box_hi:.16e}\n")
        fh.write("ITEM: ATOMS " + " ".join(columns) + " \n")
        for row in data:
            fh.write(" ".join(f"{v:.10g}" for v in row) + " \n")


def write_traj(dirpath, timesteps, box_lo, box_hi, columns, frames,
               prefix="dump.test"):
    """Write one dump file per frame: dump.test.<timestep>.dump."""
    paths = []
    for ts, data in zip(timesteps, frames):
        p = f"{dirpath}/{prefix}.{ts}.dump"
        write_dump(p, ts, box_lo, box_hi, columns, data)
        paths.append(p)
    return f"{dirpath}/{prefix}.*.dump"


def write_dump_mixed(path, timestep, box_lo, box_hi, columns, rows):
    """Write one frame whose ``rows`` are lists of already-formatted
    tokens (supports string columns like ``element``)."""
    with open(path, "w") as fh:
        fh.write("ITEM: TIMESTEP\n%d\n" % timestep)
        fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % len(rows))
        fh.write("ITEM: BOX BOUNDS pp pp pp\n")
        for ax in range(3):
            fh.write(f"{box_lo:.16e} {box_hi:.16e}\n")
        fh.write("ITEM: ATOMS " + " ".join(columns) + " \n")
        for row in rows:
            fh.write(" ".join(str(v) for v in row) + " \n")
