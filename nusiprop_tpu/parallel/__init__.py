from nusiprop_tpu.parallel import scan

__all__ = ["scan"]
