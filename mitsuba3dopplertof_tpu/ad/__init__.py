"""Differentiable-rendering layer (the reference's mitsuba.ad package:
src/python/python/ad/). Re-exports the AD-integrator family and the
low-level gradient entry points."""

from ..render.ad import render_grad, value_and_render_grad, DIFF_FIELDS
from . import integrators
from .optimizers import Optimizer, SGD, Adam

__all__ = ["render_grad", "value_and_render_grad", "DIFF_FIELDS",
           "integrators", "Optimizer", "SGD", "Adam"]
