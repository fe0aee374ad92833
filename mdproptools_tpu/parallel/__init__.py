from mdproptools_tpu.parallel.sweep import (
    sweep_conductivity,
    sweep_msd,
    sweep_rdf,
)
from mdproptools_tpu.parallel.mesh import (
    make_mesh,
    sharded_charge_flux,
    sharded_msd_per_type,
    sharded_rdf_hist,
    sharded_rdf_relations,
)

__all__ = ["make_mesh", "sharded_rdf_hist", "sharded_rdf_relations",
           "sharded_msd_per_type", "sharded_charge_flux", "sweep_rdf",
           "sweep_msd", "sweep_conductivity"]
