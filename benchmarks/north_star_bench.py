#!/usr/bin/env python
"""
North-star-shaped workload (BASELINE.json): RDF + MSD(com) + GK
conductivity over a 10k-frame x ~50k-atom trajectory, streamed
end-to-end on the real chip -> benchmarks/north_star.json.

Data: each of the 101 bundled Mg(TFSI)2/DME frames tiled 2x2x1 (exact
periodic replication -> 41,916 atoms; atom rows regrouped mol-major so
the molecular topology stays [DME x 2364, TFSI x 264, Mg x 132]),
written ONCE to a cache dir (~1.3 GB), then replicated 100x in
pseudo-time via symlinks -> 10,100 frames. The workload SHAPE (frame
count x atom count x streamed ingestion) is the point; the replicated
dynamics are not physical.

Legs run in separate processes (crash isolation for the tunneled TPU
worker, independent peak-RSS accounting):

    python benchmarks/north_star_bench.py synth   # build the dataset
    python benchmarks/north_star_bench.py rdf     # ~45-60 min on v5e
    python benchmarks/north_star_bench.py msd
    python benchmarks/north_star_bench.py gk
    python benchmarks/north_star_bench.py all     # synth + 3 legs

Each leg merges its row into benchmarks/north_star.json.
"""

import json
import os
import resource
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np  # noqa: E402

DATA_DIR = "/root/reference/data/mg_tfsi_dme"
CACHE = os.path.join(os.path.dirname(HERE), ".ns_data")  # tiled base
LINKS = os.path.join(os.path.dirname(HERE), ".ns_links")  # 10,100-frame view
OUT = os.path.join(HERE, "north_star.json")
MASS = [16.0, 12.01, 1.008, 14.01, 32.06, 16.0, 12.01, 19.0, 24.305]
NUM_MOLS = [591 * 4, 66 * 4, 33 * 4]
NUM_APM = [16, 15, 1]
REPLICAS = 100
COLS = ["id", "mol", "type", "q", "x", "y", "z", "xu", "yu", "zu",
        "vx", "vy", "vz"]
RELATIONS = [[8, 8, 8, 8], [1, 4, 6, 8]]


def _bundled_files():
    files = sorted(
        (f for f in os.listdir(DATA_DIR) if f.startswith("dump.nvt.")),
        key=lambda f: int(f.split(".")[2]),
    )
    step = int(files[1].split(".")[2]) - int(files[0].split(".")[2])
    span = int(files[-1].split(".")[2]) + step
    return files, span


def synth():
    """Tile each bundled frame 2x2x1, regroup atoms mol-major across
    replicas, renumber id/mol, write native-format dumps to CACHE."""
    from mdproptools_tpu.io.lammps_dump import parse_lammps_dumps

    os.makedirs(CACHE, exist_ok=True)
    files, span = _bundled_files()
    done = [f for f in os.listdir(CACHE) if f.startswith("dump.ns.")]
    if len(done) == len(files):
        print(f"synth: {len(done)} tiled frames already in {CACHE}")
    else:
        shifts = np.array([(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0)],
                          np.float64)
        # mol-major regroup: per species block, all 4 replicas in a row
        n1 = 591 * 16
        n2 = 66 * 15
        blocks = [(0, n1), (n1, n1 + n2), (n1 + n2, n1 + n2 + 33)]
        t0 = time.time()
        for f in files:
            fr = next(parse_lammps_dumps(os.path.join(DATA_DIR, f),
                                         columns=COLS))
            data = fr.data  # (N, 13) in COLS order, id-sorted
            L = fr.box.bounds[:, 1] - fr.box.bounds[:, 0]
            parts = []
            mol_base = 0
            for lo, hi in blocks:
                base = data[lo:hi]
                n_mol_block = len(np.unique(base[:, 1]))
                for r, s in enumerate(shifts):
                    rep = base.copy()
                    rep[:, 4:7] += s * L  # x y z (rewrapped below)
                    rep[:, 7:10] += s * L  # xu yu zu
                    rep[:, 1] += mol_base + r * n_mol_block
                    parts.append(rep)
                mol_base += 4 * n_mol_block
            out = np.concatenate(parts)
            # wrap x y z into the doubled box
            L2 = L * np.array([2.0, 2.0, 1.0])
            lo_b = fr.box.bounds[:, 0]
            out[:, 4:7] = (out[:, 4:7] - lo_b) % L2 + lo_b
            out[:, 0] = np.arange(1, out.shape[0] + 1)
            ts = fr.timestep
            path = os.path.join(CACHE, f"dump.ns.{ts}.dump")
            with open(path, "w") as fh:
                fh.write(f"ITEM: TIMESTEP\n{ts}\n"
                         f"ITEM: NUMBER OF ATOMS\n{out.shape[0]}\n"
                         "ITEM: BOX BOUNDS pp pp pp\n")
                for ax in range(3):
                    fh.write(f"{lo_b[ax]:.16e} {lo_b[ax] + L2[ax]:.16e}\n")
                fh.write("ITEM: ATOMS " + " ".join(COLS) + " \n")
                # %.6g: LAMMPS' own dump float format (compare any
                # reference dump.nvt.* row) — the tiled sums would
                # otherwise print up to 10 significant digits, a shape
                # no real dump has (and one that defeats the columnar
                # cache's decimal-exact encodings, measured round 5:
                # 28.8 GB/825 s with %.10g coords falling back to f64)
                np.savetxt(fh, out, fmt="%.6g")
            print(f"synth: wrote {path} ({time.time() - t0:.0f}s)",
                  flush=True)
    # symlink view: REPLICAS x in pseudo-time
    os.makedirs(LINKS, exist_ok=True)
    files_c = sorted(
        (f for f in os.listdir(CACHE) if f.startswith("dump.ns.")),
        key=lambda f: int(f.split(".")[2]),
    )
    n_links = 0
    for rep in range(REPLICAS):
        for f in files_c:
            ts = int(f.split(".")[2]) + rep * span
            link = os.path.join(LINKS, f"dump.ns.{ts}.dump")
            if not os.path.islink(link):
                os.symlink(os.path.join(CACHE, f), link)
            n_links += 1
    print(f"synth: {n_links} frame links in {LINKS}")


def _merge(leg, row):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            data = json.load(fh)
    data[leg] = row
    data["workload"] = (
        "10,100 frames x 41,916 atoms (bundled box tiled 2x2x1, "
        "symlink-replicated 100x in pseudo-time), streamed, fast/f32, "
        "TPU v5e behind the axon tunnel")
    data["extrapolation"] = (
        "single v5e chip measured; the implemented frames x atoms mesh "
        "(rdf_cn.set_mesh + parallel.sharded_rdf_relations, "
        "dryrun-verified) is linear in chips for RDF, and v5p is ~2x "
        "v5e per chip: 8x v5p projects to ~1/16 of the v5e RDF "
        "wall-clock; MSD/GK legs are parse-bound and scale with host "
        "fan-out, not chips")
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps({leg: row}), flush=True)


def _jax_setup():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import logging

    logging.basicConfig(level=logging.INFO)
    logging.getLogger("mdproptools_tpu").setLevel(logging.DEBUG)


def _cached() -> bool:
    """True when a valid columnar cache will serve this workload
    (``iter_trajectory_blocks(cache="auto")`` picks it up)."""
    from mdproptools_tpu.io import cache as _c

    return _c.load_meta(os.path.join(LINKS, "dump.ns.*.dump")) is not None


def _key(base: str) -> str:
    """Cached re-runs land in their own row (``<leg>_cached``) so the
    text-parse measurement is never overwritten."""
    return base + "_cached" if _cached() else base


def leg_cache():
    """Build the columnar cache for the 10,100-frame view (one text
    parse, paid once; every later leg reads binary blocks at page-cache
    speed via cache='auto')."""
    from mdproptools_tpu.io.cache import build_cache, default_cache_dir

    pattern = os.path.join(LINKS, "dump.ns.*.dump")
    t0 = time.time()
    cache_dir = build_cache(pattern)
    wall = time.time() - t0
    size = sum(
        os.path.getsize(os.path.join(cache_dir, f))
        for f in os.listdir(cache_dir))
    _merge("cache_build", {
        "wall_s": round(wall, 1),
        "ms_per_frame": round(wall / 10100 * 1000, 1),
        "gb_on_disk": round(size / 1e9, 2),
        "dir": os.path.relpath(cache_dir, os.path.dirname(HERE)),
        "note": ("one-time text parse + per-column binary block write "
                 "(mdpt cache); all 13 columns cached so every leg is "
                 "served"),
    })
    assert cache_dir == default_cache_dir(pattern)


def leg_rdf():
    _jax_setup()
    from mdproptools_tpu.structural.rdf_cn import calc_atomic_rdf

    pattern = os.path.join(LINKS, "dump.ns.*.dump")
    t0 = time.time()
    df = calc_atomic_rdf(
        20, 0.05, 9, MASS, RELATIONS, pattern,
        path_or_buff=os.path.join(LINKS, "rdf.csv"), precision="fast",
    )
    wall = time.time() - t0
    g_end = float(df["g_full(r)"].tail(20).mean())
    assert abs(g_end - 1.0) < 0.05, f"g(r->r_cut) = {g_end}"
    _merge(_key("rdf"), {
        "wall_s": round(wall, 1),
        "frames_per_s": round(10100 / wall, 2),
        "ms_per_frame": round(wall / 10100 * 1000, 1),
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "g_full_at_r_cut": round(g_end, 4),
        "bins": 400, "partials": 4, "r_cut": 20.0,
    })


def leg_msd():
    _jax_setup()
    from mdproptools_tpu.dynamical.diffusion import Diffusion

    t0 = time.time()
    d = Diffusion(timestep=1, units="real", outputs_dir=LINKS,
                  diff_dir=LINKS)
    msd, _ = d.get_msd_from_dump(
        "dump.ns.*.dump", msd_type="com", num_mols=NUM_MOLS,
        num_atoms_per_mol=NUM_APM, mass=MASS, precision="fast",
    )
    diff = d.calc_diff(msd, dimension=3, save=False, plot=False)
    wall = time.time() - t0
    assert np.isfinite(diff["diffusion (m2/s)"].to_numpy()).all()
    _merge(_key("msd_com"), {
        "wall_s": round(wall, 1),
        "frames_per_s": round(10100 / wall, 2),
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "molecules": int(sum(NUM_MOLS)),
    })


def leg_gk():
    _jax_setup()
    from mdproptools_tpu.dynamical.conductivity import Conductivity

    t0 = time.time()
    cond = Conductivity(
        "dump.ns.*.dump", NUM_MOLS, NUM_APM,
        volume=(49.182349 * 2) ** 2 * 49.182349, mass=MASS, temp=298.15,
        timestep=1, units="real", working_dir=LINKS, precision="fast",
    )
    j = cond.get_charge_flux()
    tot = cond.correlate_charge_flux(j)
    integ = cond.integrate_charge_flux_correlation(tot)
    ave = None
    for tol in (1e-4, 1e-2, 0.5, 1.0, 2.0):
        try:
            ave, _ = cond.fit_curve(tot, integ, tol=tol)
            break
        except ValueError:
            continue
    assert ave is not None, "plateau detection failed"
    sigma = cond.green_kubo(ave)
    wall = time.time() - t0
    assert np.isfinite(sigma).all()
    _merge(_key("gk_conductivity"), {
        "wall_s": round(wall, 1),
        "frames_per_s": round(10100 / wall, 2),
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
    })


def leg_composite():
    """RDF + MSD + GK from ONE parse (mdproptools_tpu.analyze): the
    composite's honest single-chip wall — the separate legs each re-read
    the 10,100 files, and the MSD/GK legs are parse-bound."""
    _jax_setup()
    from mdproptools_tpu import analyze

    t0 = time.time()
    out = analyze(
        os.path.join(LINKS, "dump.ns.*.dump"), 9, MASS,
        num_mols=NUM_MOLS, num_atoms_per_mol=NUM_APM,
        rdf=dict(r_cut=20.0, bin_size=0.05, partial_relations=RELATIONS,
                 save_mode=False),
        msd=dict(msd_type="com", calc_diff=True),
        conductivity=dict(volume=(49.182349 * 2) ** 2 * 49.182349,
                          fit=False),
        precision="fast", working_dir=LINKS,
    )
    wall = time.time() - t0
    g_end = float(out["rdf"]["g_full(r)"].tail(20).mean())
    assert abs(g_end - 1.0) < 0.05
    assert np.isfinite(
        out["diffusion"]["diffusion (m2/s)"].to_numpy()).all()
    assert np.isfinite(out["integral"]).all()
    _merge(_key("composite_one_parse"), {
        "wall_s": round(wall, 1),
        "frames_per_s": round(10100 / wall, 2),
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "g_full_at_r_cut": round(g_end, 4),
        "note": ("mdproptools_tpu.analyze: one streamed parse feeds all "
                 "three property streams; GK stops at the integral "
                 "(fit=False — the replicated pseudo-dynamics has no "
                 "physical plateau; the fit itself is millisecond host "
                 "work)"),
    })


def main():
    leg = sys.argv[1] if len(sys.argv) > 1 else "all"
    if leg == "synth":
        synth()
    elif leg == "cache":
        leg_cache()
    elif leg == "rdf":
        leg_rdf()
    elif leg == "msd":
        leg_msd()
    elif leg == "gk":
        leg_gk()
    elif leg == "composite":
        leg_composite()
    elif leg == "all":
        synth()
        for sub in ("rdf", "msd", "gk"):
            print(f"=== leg {sub} ===", flush=True)
            subprocess.run([sys.executable, __file__, sub], check=True)
        with open(OUT) as fh:
            data = json.load(fh)
        total = sum(data[k]["wall_s"]
                    for k in ("rdf", "msd_com", "gk_conductivity"))
        data["composite_wall_s"] = round(total, 1)
        with open(OUT, "w") as fh:
            json.dump(data, fh, indent=1)
        print(json.dumps({"composite_wall_s": total}))
    else:
        raise SystemExit(f"unknown leg {leg!r}")


if __name__ == "__main__":
    main()
