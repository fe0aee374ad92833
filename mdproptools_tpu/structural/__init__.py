from mdproptools_tpu.structural.cluster_analysis import (
    get_clusters,
    get_unique_configurations,
)
from mdproptools_tpu.structural.hydration_number import get_hydration_number
from mdproptools_tpu.structural.number_density import calc_number_density
from mdproptools_tpu.structural.rdf_cn import (
    calc_atomic_cn,
    calc_atomic_rdf,
    calc_intermolecular_rdf,
    calc_molecular_cn,
    calc_molecular_rdf,
)

__all__ = [
    "calc_atomic_rdf",
    "calc_atomic_cn",
    "calc_molecular_rdf",
    "calc_molecular_cn",
    "calc_intermolecular_rdf",
    "get_clusters",
    "get_unique_configurations",
    "get_hydration_number",
    "calc_number_density",
]
