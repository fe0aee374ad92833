from mdproptools_tpu.ops import acf, com, fits, pairs, pbc

__all__ = ["acf", "com", "fits", "pairs", "pbc"]
