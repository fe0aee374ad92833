from mdproptools_tpu.dynamical.conductivity import Conductivity
from mdproptools_tpu.dynamical.diffusion import Diffusion
from mdproptools_tpu.dynamical.residence_time import Displacement, ResidenceTime
from mdproptools_tpu.dynamical.viscosity import Viscosity

__all__ = ["Conductivity", "Diffusion", "ResidenceTime", "Displacement",
           "Viscosity"]
