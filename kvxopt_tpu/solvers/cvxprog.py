"""Nonlinear convex solvers cp/cpl/gp (implementation in progress)."""


def cp(*args, **kwargs):
    raise NotImplementedError


def cpl(*args, **kwargs):
    raise NotImplementedError


def gp(*args, **kwargs):
    raise NotImplementedError
