from nusiprop_tpu.models import grids, kernels, masses, mixing, sources, transport

__all__ = ["grids", "kernels", "masses", "mixing", "sources", "transport"]
