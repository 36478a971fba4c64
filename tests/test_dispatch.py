"""Executor dispatch policy (config.dispatch_device and the solver
front-end wiring).

On the CPU-only test backend the dispatcher must be a no-op (the
default backend IS the host), and the policy function must honor the
threshold/override semantics the docs promise.
"""

import numpy as np

import jax

from kvxopt_tpu import config, solvers


def test_dispatch_noop_on_host_backend():
    # tests run with jax_platforms=cpu: there is no distinct accelerator
    assert config.accelerator_is_host()
    assert config.dispatch_device(1) is None
    assert config.dispatch_device(10 ** 9) is None


def test_threshold_semantics(monkeypatch):
    monkeypatch.setattr(config, "accelerator_is_host", lambda: False)
    sentinel = object()
    monkeypatch.setattr(config, "host_device", lambda: sentinel)
    monkeypatch.setattr(config, "host_dispatch_threshold", 512)
    assert config.dispatch_device(511) is sentinel
    assert config.dispatch_device(512) is None
    monkeypatch.setattr(config, "host_dispatch_threshold", 0)
    assert config.dispatch_device(1) is None, "0 disables host dispatch"


def test_solves_unaffected_by_dispatch_context():
    """A solve through the front end under an explicit default_device
    context (what the dispatcher does) matches the plain solve."""
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    plain = solvers.lp(c, G, h)
    with jax.default_device(jax.devices("cpu")[0]):
        ctxed = solvers.lp(c, G, h)
    assert plain["status"] == ctxed["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(plain["x"]),
                               np.asarray(ctxed["x"]), atol=1e-9)


def test_profile_option_writes_trace(tmp_path):
    """options['profile'] captures a jax.profiler trace of the solve
    (SURVEY §5 dev hook)."""
    import os
    import numpy as np
    from kvxopt_tpu.solvers import qp
    rng = np.random.default_rng(0)
    n, m = 6, 9
    M = rng.standard_normal((n, n))
    P = M @ M.T + n * np.eye(n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    h = G @ rng.standard_normal(n) + rng.uniform(0.5, 1.5, m)
    d = str(tmp_path / "trace")
    sol = qp(P, q, G, h, options={"profile": d})
    assert sol["status"] == "optimal"
    found = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert found, "no trace files written"
