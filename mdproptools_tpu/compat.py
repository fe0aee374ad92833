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

``install()`` registers a meta-path finder that resolves every
``mdproptools[.xxx]`` import to the canonical ``mdproptools_tpu[.xxx]``
module INSTANCE (one module object under both names — module-level state
such as kernel caches and test hooks is shared no matter which name was
imported first). It refuses to shadow a real mdproptools installation
unless ``force=True``.
"""

import importlib
import importlib.abc
import importlib.util
import sys

_ALIAS = "mdproptools"
_CANONICAL = "mdproptools_tpu"


class _AliasLoader(importlib.abc.Loader):
    """Loader that 'creates' the already-imported canonical module.

    ``create_module`` returning an existing module makes the import
    system register that same instance under the alias name; the
    canonical import metadata (``__spec__``/``__loader__``), which
    ``module_from_spec`` overwrites with the alias spec, is restored in
    ``exec_module`` so the canonical module is left untouched.
    """

    def __init__(self, canonical_name):
        self._canonical = canonical_name
        self._saved = None

    def create_module(self, spec):
        mod = importlib.import_module(self._canonical)
        self._saved = (getattr(mod, "__spec__", None),
                       getattr(mod, "__loader__", None))
        return mod

    def exec_module(self, module):
        module.__spec__, module.__loader__ = self._saved


class _AliasFinder(importlib.abc.MetaPathFinder):
    """Resolves ``mdproptools`` / ``mdproptools.*`` to the canonical
    ``mdproptools_tpu`` modules (same instances, shared state)."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname != _ALIAS and not fullname.startswith(_ALIAS + "."):
            return None
        canonical = _CANONICAL + fullname[len(_ALIAS):]
        try:
            canonical_spec = importlib.util.find_spec(canonical)
        except (ImportError, ValueError):
            return None
        if canonical_spec is None:
            return None
        return importlib.util.spec_from_loader(
            fullname,
            _AliasLoader(canonical),
            is_package=canonical_spec.submodule_search_locations is not None,
        )


_FINDER = _AliasFinder()


def install(force: bool = False) -> None:
    """Alias this package as ``mdproptools`` via a meta-path finder.

    Raises RuntimeError if a real mdproptools distribution is importable
    (or already imported) and ``force`` is False.
    """
    existing = sys.modules.get(_ALIAS)
    pkg = importlib.import_module(_CANONICAL)
    if existing is not None and existing is not pkg and not force:
        raise RuntimeError(
            "a different 'mdproptools' module is already imported; "
            "pass force=True to shadow it"
        )
    if existing is None and not force:
        try:
            spec = importlib.util.find_spec(_ALIAS)
        except (ImportError, ValueError):
            spec = None
        if spec is not None:
            raise RuntimeError(
                "a real mdproptools distribution is installed; "
                "pass force=True to shadow it"
            )
    if force and existing is not None and existing is not pkg:
        # drop the foreign module tree so the finder resolves fresh
        for name in [n for n in sys.modules if n == _ALIAS
                     or n.startswith(_ALIAS + ".")]:
            del sys.modules[name]
    if _FINDER not in sys.meta_path:
        sys.meta_path.insert(0, _FINDER)
    # alias eagerly so `sys.modules['mdproptools']` is present immediately
    sys.modules[_ALIAS] = pkg
    for name, mod in list(sys.modules.items()):
        if name.startswith(_CANONICAL + ".") and mod is not None:
            sys.modules[_ALIAS + name[len(_CANONICAL):]] = mod


def uninstall() -> None:
    """Remove the alias and finder (no-op if ``mdproptools`` is not this
    package)."""
    pkg = sys.modules.get(_CANONICAL)
    if sys.modules.get(_ALIAS) is pkg:
        for name in [n for n in sys.modules if n == _ALIAS
                     or n.startswith(_ALIAS + ".")]:
            del sys.modules[name]
    if _FINDER in sys.meta_path:
        sys.meta_path.remove(_FINDER)
