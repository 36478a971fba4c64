"""conelp and natural-form wrappers (implementation in progress)."""


def conelp(*args, **kwargs):
    raise NotImplementedError


def lp(*args, **kwargs):
    raise NotImplementedError


def socp(*args, **kwargs):
    raise NotImplementedError


def sdp(*args, **kwargs):
    raise NotImplementedError
