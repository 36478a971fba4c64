"""Alias module: kvxopt_tpu.modeling mirrors the reference's
kvxopt.modeling import path (src/python/modeling.py)."""

from .models.modeling import (  # noqa: F401
    variable, affine, constraint, op, dot, sum, max, min, pwl,
    pwl_scalar)
