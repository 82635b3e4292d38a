from nusiprop_tpu.ops import specfun, quadrature

__all__ = ["specfun", "quadrature"]
