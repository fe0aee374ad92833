from mdproptools_tpu.utilities.fluctuations import plot_fluctuations
from mdproptools_tpu.utilities.log import concat_log
from mdproptools_tpu.utilities.plots import set_axis

__all__ = ["concat_log", "set_axis", "plot_fluctuations"]
