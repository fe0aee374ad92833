"""Reference API-surface parity, checked structurally.

The reference cannot be imported here (pymatgen/numba absent), so its
public surface is read with ``ast`` from the source at /root/reference:
every public module-level function/class (and public method) must exist
in the corresponding ``mdproptools_tpu`` module and accept at least the
reference's parameter names — the contract that lets reference users
switch imports (or use ``compat.install()``) without edits."""

import ast
import importlib
import inspect
import os
import warnings

import pytest

REF = "/root/reference/mdproptools"
MODULES = [
    ("structural.rdf_cn", "structural/rdf_cn.py"),
    ("structural.cluster_analysis", "structural/cluster_analysis.py"),
    ("structural.hydration_number", "structural/hydration_number.py"),
    ("structural.number_density", "structural/number_density.py"),
    ("dynamical.diffusion", "dynamical/diffusion.py"),
    ("dynamical.conductivity", "dynamical/conductivity.py"),
    ("dynamical.viscosity", "dynamical/viscosity.py"),
    ("dynamical.residence_time", "dynamical/residence_time.py"),
    ("common.com_mols", "common/com_mols.py"),
    ("utilities.log", "utilities/log.py"),
    ("utilities.plots", "utilities/plots.py"),
    ("utilities.fluctuations", "utilities/fluctuations.py"),
]


def _ref_surface(path):
    # The reference source has invalid escape sequences in docstrings
    # (e.g. '\A' for Angstrom); ast.parse re-emits their SyntaxWarnings.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        with open(os.path.join(REF, path)) as f:
            tree = ast.parse(f.read())
    out = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
            out[node.name] = [
                a.arg for a in node.args.args + node.args.kwonlyargs]
        elif isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
            meths = {}
            for m in node.body:
                if isinstance(m, ast.FunctionDef) and (
                        not m.name.startswith("_") or m.name == "__init__"):
                    meths[m.name] = [
                        a.arg
                        for a in m.args.args + m.args.kwonlyargs
                        if a.arg != "self"]
            out[node.name] = meths
    return out


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("mod,path", MODULES, ids=[m for m, _ in MODULES])
def test_reference_surface_covered(mod, path):
    ref = _ref_surface(path)
    ours = importlib.import_module(f"mdproptools_tpu.{mod}")
    problems = []
    for name, spec in ref.items():
        obj = getattr(ours, name, None)
        if obj is None:
            problems.append(f"{name}: missing")
            continue
        if isinstance(spec, dict):
            for mname, margs in spec.items():
                mobj = getattr(obj, mname, None)
                if mobj is None:
                    problems.append(f"{name}.{mname}: missing method")
                    continue
                try:
                    params = set(inspect.signature(mobj).parameters)
                except (TypeError, ValueError):
                    continue
                gone = [a for a in margs if a not in params]
                if gone:
                    problems.append(
                        f"{name}.{mname}: missing params {gone}")
        else:
            try:
                params = set(inspect.signature(obj).parameters)
            except (TypeError, ValueError):
                continue
            gone = [a for a in spec if a not in params]
            if gone:
                problems.append(f"{name}: missing params {gone}")
    assert not problems, problems
