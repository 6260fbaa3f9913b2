"""mi.test.util scaffolding (reference src/python/python/test/util.py)."""

import os

import numpy as np
import jax.numpy as jnp

from mitsuba3dopplertof_tpu.test.util import (find_resource,
                                              fresolver_append_path,
                                              check_vectorization)
from mitsuba3dopplertof_tpu.core.fresolver import file_resolver


def test_find_resource():
    p = find_resource("tests")
    assert os.path.isdir(p) and p.endswith("tests")


@fresolver_append_path
def test_fresolver_append_path_inside():
    paths = file_resolver().paths
    here = os.path.dirname(os.path.realpath(__file__))
    assert here in paths


def test_fresolver_restored():
    here = os.path.dirname(os.path.realpath(__file__))
    before = list(file_resolver().paths)

    @fresolver_append_path
    def inner():
        assert here in file_resolver().paths
    inner()
    assert file_resolver().paths == before


def test_tmpfile_fixture(tmpfile):
    assert os.path.exists(tmpfile)


def test_check_vectorization():
    check_vectorization(lambda a, b: jnp.sin(a) * b + a * a, arg_dims=[1, 1])
