from mdproptools_tpu.common import constants
from mdproptools_tpu.common.com_mols import calc_com
from mdproptools_tpu.common.system import System, altered_atom_types

__all__ = ["constants", "System", "altered_atom_types", "calc_com"]
