from mdproptools_tpu.utilities.fluctuations import plot_fluctuations
from mdproptools_tpu.utilities.log import concat_log
from mdproptools_tpu.utilities.plots import set_axis
from mdproptools_tpu.utilities.tracing import enable_logging, profile_trace, stage

__all__ = ["concat_log", "set_axis", "plot_fluctuations", "enable_logging",
           "stage", "profile_trace"]
