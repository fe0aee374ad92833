"""Generator for the realistic LAMMPS log fixtures in ``test_files/``.

The reference's own ``log.mixture_*`` fixtures are unmaterialized
git-LFS pointers (reference ``.gitattributes:1-2``), so these files are
authored to the genuine LAMMPS (29 Sep 2021) log format instead: full
banner, PPPM/neighbor setup noise, ``Per MPI rank memory allocation``
preamble, thermo sections, ``WARNING:`` lines interleaved BETWEEN
thermo rows, ``Loop time`` + MPI timing breakdown footers, and (for
``log.mixture_2``) a run killed mid-write whose final thermo row is
truncated. They pin ``io.lammps_log.parse_lammps_log``,
``utilities.log.concat_log``, ``Diffusion.get_msd_from_log`` and
``Viscosity.calc_avg_visc`` against the formats the reference's
pymatgen parser is supposed to handle (reference
``utilities/log.py:10-28``, ``dynamical/viscosity.py:209-212``).

Deterministic (seeded); re-running reproduces the committed files:

    python tests/io/gen_log_fixtures.py
"""

import os

import numpy as np

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "test_files")

rng = np.random.default_rng(20260820)

BANNER = """LAMMPS (29 Sep 2021 - Update 2)
OMP_NUM_THREADS environment is not set. Defaulting to 1 thread. (src/comm.cpp:98)
  using 1 OpenMP thread(s) per MPI task
Reading data file ...
  orthogonal box = (0.0000000 0.0000000 0.0000000) to (49.180000 49.180000 49.180000)
  2 by 1 by 2 MPI processor grid
  reading atoms ...
  10479 atoms
  reading velocities ...
  10479 velocities
Finding 1-2 1-3 1-4 neighbors ...
  special bond factors lj:    0        0        0.5
  special bond factors coul:  0        0        0.5
     4 = max # of 1-2 neighbors
     9 = max # of 1-3 neighbors
    18 = max # of 1-4 neighbors
    21 = max # of special neighbors
  special bonds CPU = 0.004 seconds
  read_data CPU = 0.210 seconds
"""

SETUP = """PPPM initialization ...
WARNING: Using 12-bit tables for long-range coulomb (../kspace.cpp:340)
  G vector (1/distance) = 0.27631538
  grid = 36 36 36
  stencil order = 5
  estimated absolute RMS force accuracy = 0.0033887194
  estimated relative force accuracy = 1.0204368e-05
  using double precision KISS FFT
  3d grid and FFT values/proc = 24389 11664
Neighbor list info ...
  update every 1 steps, delay 10 steps, check yes
  max neighbors/atom: 2000, page size: 100000
  master list distance cutoff = 14
  ghost atom cutoff = 14
  binsize = 7, bins = 8 8 8
Setting up Verlet run ...
  Unit style    : real
  Current step  : {step0}
  Time step     : 1
Per MPI rank memory allocation (min/avg/max) = 21.43 | 21.52 | 21.61 Mbytes
"""

FOOT = """Loop time of {loop:.4f} on 4 procs for {nsteps} steps with 10479 atoms

Performance: 18.200 ns/day, 1.320 hours/ns, 211.000 timesteps/s
99.1% CPU use with 4 MPI tasks x 1 OpenMP threads

MPI task timing breakdown:
Section |  min time  |  avg time  |  max time  |%varavg| %total
---------------------------------------------------------------
Pair    | 59.0000    | 59.0000    | 59.0000    |   0.4 |  62.30
Kspace  | 10.272     | 10.563     | 10.866     |   7.2 |  21.47
Neigh   | 4.0166     | 4.0646     | 4.1126     |   2.4 |   8.26
Comm    | 2.0927     | 2.5756     | 3.0585     |  19.0 |   5.23
Output  | 0.0169     | 0.0216     | 0.0263     |   2.6 |   0.04
Modify  | 1.0137     | 1.0461     | 1.0785     |   2.0 |   2.13
Other   |            | 0.2832     |            |       |   0.58

Nlocal:        2619.75 ave        2654 max        2581 min
Histogram: 1 0 0 0 1 0 1 0 0 1

Total # of neighbors = 5238894
Ave neighs/atom = 499.94217
Neighbor list builds = {nb}
Dangerous builds = 0
"""

WARN = ("WARNING: Bond/angle/dihedral extent > half of periodic box "
        "length (../domain.cpp:936)\n")

MIX_COLS = ["Step", "Temp", "Press", "Pxy", "Pxz", "Pyz", "PotEng",
            "KinEng", "TotEng", "c_msd[1]", "c_msd[2]", "c_msd[3]",
            "c_msd[4]", "Volume"]
MIX_STYLE = ("thermo_style custom step temp press pxy pxz pyz pe ke "
             "etotal c_msd[1] c_msd[2] c_msd[3] c_msd[4] vol\n")

# planted diffusivity for the msd columns: 1e-9 m^2/s = 1e-4 A^2/fs;
# per-axis msd = 2*D*t (timestep 1 fs)
D_A2FS = 1e-4


def mix_rows(steps):
    n = len(steps)
    t = steps.astype(float)
    out = np.empty((n, len(MIX_COLS)))
    out[:, 0] = steps
    out[:, 1] = 298.15 + rng.normal(0, 2.4, n)
    out[:, 2] = rng.normal(12.0, 180.0, n)
    out[:, 3:6] = rng.normal(0, 55.0, (n, 3))
    out[:, 6] = -25650.0 + rng.normal(0, 35.0, n)
    out[:, 7] = 9310.0 + rng.normal(0, 30.0, n)
    out[:, 8] = out[:, 6] + out[:, 7]
    msd_axes = (2 * D_A2FS * t)[:, None] * (
        1 + rng.normal(0, 0.02, (n, 3)))
    msd_axes[t == 0] = 0.0
    out[:, 9:12] = msd_axes
    out[:, 12] = msd_axes.sum(axis=1)
    out[:, 13] = 118949.58
    return out


def mix_fmt(row):
    vals = [f"{int(row[0]):12d}"]
    vals += [f"{v:14.5f}" for v in row[1:9]]
    vals += [f"{v:14.8f}" for v in row[9:13]]
    vals.append(f"{row[13]:14.5f}")
    return " ".join(vals)


def write_mixture():
    steps1 = np.arange(0, 35001, 1000)
    r1 = mix_rows(steps1)
    out = [BANNER, "compute msd all msd\n", MIX_STYLE,
           "thermo 1000\nrun 35000\n", SETUP.format(step0=0),
           " ".join(MIX_COLS) + "\n"]
    for k in range(len(steps1)):
        if k == 11:
            out.append(WARN)
        out.append(mix_fmt(r1[k]) + "\n")
    out.append(FOOT.format(loop=166.23, nsteps=35000, nb=1093))
    out.append("Total wall time: 0:03:51\n")
    with open(os.path.join(HERE, "log.mixture_1"), "w") as fh:
        fh.writelines(out)

    # part 2: restart re-prints part 1's final thermo row byte-identically
    # (the concat_log duplicate-drop contract), then the run is killed
    # mid-write at step 52000 -> truncated final row, no Loop time footer
    last_row = mix_fmt(r1[-1])
    steps2 = np.arange(36000, 52001, 1000)
    r2 = mix_rows(steps2)
    out = [BANNER, "read_restart restart.mixture.35000\n",
           "compute msd all msd\n", MIX_STYLE,
           "thermo 1000\nrun 52000 upto\n", SETUP.format(step0=35000),
           " ".join(MIX_COLS) + "\n", last_row + "\n"]
    for k in range(len(steps2)):
        if k == 5:
            out.append(WARN)
        line = mix_fmt(r2[k])
        if k == len(steps2) - 1:
            line = line[: len(line) // 2].rstrip()
        out.append(line + "\n")
    with open(os.path.join(HERE, "log.mixture_2"), "w") as fh:
        fh.writelines(out)


VISC_COLS = ["Step", "Temp", "Press", "Pxy", "Pxz", "Pyz", "PotEng",
             "KinEng", "TotEng", "Volume"]
VISC_STYLE = ("thermo_style custom step temp press pxy pxz pyz pe ke "
              "etotal vol\n")


def write_visc():
    for rep in (1, 2, 3):
        steps = np.arange(0, 20001, 100)
        n = len(steps)
        # AR(1) off-diagonal pressure, correlation time ~5 samples, so
        # the GK running integral plateaus positive (a physical shear
        # relaxation, unlike white noise whose integral random-walks)
        phi = np.exp(-1.0 / 5.0)
        sig = 55.0 * np.sqrt(1 - phi * phi)
        P = np.empty((3, n))
        P[:, 0] = rng.normal(0, 55.0, 3)
        for k in range(1, n):
            P[:, k] = phi * P[:, k - 1] + rng.normal(0, sig, 3)
        temp = 298.15 + rng.normal(0, 2.4, n)
        press = rng.normal(12.0, 180.0, n)
        pot = -25650.0 + rng.normal(0, 35.0, n)
        kin = 9310.0 + rng.normal(0, 30.0, n)
        out = [BANNER, VISC_STYLE, "thermo 100\nrun 20000\n",
               SETUP.format(step0=0), " ".join(VISC_COLS) + "\n"]
        for k in range(n):
            if rep == 2 and k == 60:
                out.append(WARN)
            vals = [f"{steps[k]:12d}"] + [
                f"{v:14.5f}" for v in (temp[k], press[k], P[0, k],
                                       P[1, k], P[2, k], pot[k], kin[k],
                                       pot[k] + kin[k], 118949.58)]
            out.append(" ".join(vals) + "\n")
        out.append(FOOT.format(loop=94.77 + rep, nsteps=20000, nb=625))
        out.append("Total wall time: 0:01:36\n")
        with open(os.path.join(HERE, f"log.visc_{rep}"), "w") as fh:
            fh.writelines(out)


def write_twostage():
    eq_cols = ["Step", "Temp", "Press", "PotEng", "KinEng", "TotEng",
               "Volume"]
    steps = np.arange(0, 10001, 1000)
    n = len(steps)
    out = [BANNER, "velocity all create 298.15 458726 dist gaussian\n",
           "fix nvt all nvt temp 298.15 298.15 100.0\n",
           "thermo 1000\nrun 10000\n", SETUP.format(step0=0),
           " ".join(eq_cols) + "\n"]
    pot = -25650.0 + rng.normal(0, 35.0, n)
    kin = 9310.0 + rng.normal(0, 30.0, n)
    for k in range(n):
        if k == 3:
            out.append(WARN)
        vals = [f"{steps[k]:12d}"] + [
            f"{v:14.5f}" for v in (298.15 + rng.normal(0, 2.4),
                                   rng.normal(12.0, 180.0), pot[k],
                                   kin[k], pot[k] + kin[k], 118949.58)]
        out.append(" ".join(vals) + "\n")
    out.append(FOOT.format(loop=47.3321, nsteps=10000, nb=312))
    out.append("unfix nvt\nfix nvt all nvt temp 298.15 298.15 100.0\n")
    out.append(VISC_STYLE)
    out.append("thermo 1000\nrun 25000\n")
    out.append(SETUP.format(step0=10000))
    steps2 = np.arange(10000, 35001, 1000)
    n2 = len(steps2)
    pot = -25650.0 + rng.normal(0, 35.0, n2)
    kin = 9310.0 + rng.normal(0, 30.0, n2)
    out.append(" ".join(VISC_COLS) + "\n")
    for k in range(n2):
        if k == 7:
            out.append(WARN)
        vals = [f"{steps2[k]:12d}"] + [
            f"{v:14.5f}" for v in (298.15 + rng.normal(0, 2.4),
                                   rng.normal(12.0, 180.0),
                                   rng.normal(0, 55.0),
                                   rng.normal(0, 55.0),
                                   rng.normal(0, 55.0), pot[k], kin[k],
                                   pot[k] + kin[k], 118949.58)]
        out.append(" ".join(vals) + "\n")
    out.append(FOOT.format(loop=118.902, nsteps=25000, nb=781))
    out.append("Total wall time: 0:02:47\n")
    with open(os.path.join(HERE, "log.twostage"), "w") as fh:
        fh.writelines(out)


if __name__ == "__main__":
    write_twostage()
    write_mixture()
    write_visc()
    print("fixtures written to", HERE)
