"""
Drop-in import compatibility with the reference package name.

The module tree mirrors the reference (``mdproptools.structural.rdf_cn``
-> ``mdproptools_tpu.structural.rdf_cn`` and so on, same public symbols,
argument names and artifact schemas — see PARITY.md), so existing
notebooks and scripts written against molmd/mdproptools can run
unchanged after one call:

    import mdproptools_tpu.compat
    mdproptools_tpu.compat.install()

    from mdproptools.structural.rdf_cn import calc_atomic_rdf  # works

``install()`` registers ``mdproptools_tpu`` under the name
``mdproptools`` in ``sys.modules`` (submodule imports resolve through
the aliased package's ``__path__``, so every ``mdproptools.*`` module
maps automatically). It refuses to shadow a real mdproptools
installation unless ``force=True``.
"""

import importlib
import importlib.util
import sys


def install(force: bool = False) -> None:
    """Alias this package as ``mdproptools`` in ``sys.modules``.

    Raises RuntimeError if a real mdproptools distribution is importable
    (or already imported) and ``force`` is False.
    """
    existing = sys.modules.get("mdproptools")
    pkg = importlib.import_module("mdproptools_tpu")
    if existing is not None and existing is not pkg and not force:
        raise RuntimeError(
            "a different 'mdproptools' module is already imported; "
            "pass force=True to shadow it"
        )
    if existing is None and not force:
        try:
            spec = importlib.util.find_spec("mdproptools")
        except (ImportError, ValueError):
            spec = None
        if spec is not None:
            raise RuntimeError(
                "a real mdproptools distribution is installed; "
                "pass force=True to shadow it"
            )
    sys.modules["mdproptools"] = pkg
    # re-point any submodules already imported under the canonical name
    for name, mod in list(sys.modules.items()):
        if name.startswith("mdproptools_tpu.") and mod is not None:
            sys.modules["mdproptools" + name[len("mdproptools_tpu"):]] = mod


def uninstall() -> None:
    """Remove the alias (no-op if ``mdproptools`` is not this package)."""
    pkg = sys.modules.get("mdproptools_tpu")
    if sys.modules.get("mdproptools") is pkg:
        for name in [n for n in sys.modules if n == "mdproptools"
                     or n.startswith("mdproptools.")]:
            del sys.modules[name]
