from mdproptools_tpu.common import constants
from mdproptools_tpu.common.system import System, altered_atom_types

__all__ = ["constants", "System", "altered_atom_types"]
