"""Modeling layer: the PWL DSL and MPS I/O."""

from .modeling import (  # noqa: F401
    variable, affine, constraint, op, dot, sum, max, min, pwl)
