"""Test scaffolding (reference src/python/python/test/)."""
from . import util

__all__ = ["util"]
