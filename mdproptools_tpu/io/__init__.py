from mdproptools_tpu.io.lammps_dump import (
    Box,
    Frame,
    Trajectory,
    parse_lammps_dumps,
    read_trajectory,
)
from mdproptools_tpu.io.lammps_log import parse_lammps_log, write_lammps_log
from mdproptools_tpu.io.molecule import Molecule, Site

__all__ = [
    "Box",
    "Frame",
    "Trajectory",
    "parse_lammps_dumps",
    "read_trajectory",
    "parse_lammps_log",
    "write_lammps_log",
    "Molecule",
    "Site",
]
