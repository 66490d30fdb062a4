"""Scalar NumPy reference renderer (executable spec for the TPU engine)."""

from bauklank_tpu.refdsp.renderer import render_offline

__all__ = ["render_offline"]
