"""cp/cpl/gp nonlinear solvers."""

import numpy as np
import jax.numpy as jnp

from kvxopt_tpu.solvers import cp, cpl, gp
from kvxopt_tpu.solvers.cvxprog import oracle_from_function


def test_cp_unconstrained_quadratic():
    # minimize (x-1)^2 + (y-2)^2
    def F(x=None, z=None):
        if x is None:
            return 0, jnp.zeros(2)
        f = jnp.array([(x[0] - 1.0) ** 2 + (x[1] - 2.0) ** 2])
        Df = jnp.array([[2 * (x[0] - 1.0), 2 * (x[1] - 2.0)]])
        if z is None:
            return f, Df
        H = z[0] * 2.0 * jnp.eye(2)
        return f, Df, H

    sol = cp(F)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [1.0, 2.0], atol=1e-4)


def test_cp_log_barrier_domain():
    # minimize -log(x) + x  -> x* = 1, f* = 1 (domain x > 0)
    def F(x=None, z=None):
        if x is None:
            return 0, jnp.array([0.5])
        f = jnp.array([-jnp.log(x[0]) + x[0]])
        Df = jnp.array([[-1.0 / x[0] + 1.0]])
        if z is None:
            return f, Df
        return f, Df, z[0] * jnp.array([[1.0 / x[0] ** 2]])

    sol = cp(F)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [1.0], atol=1e-5)
    np.testing.assert_allclose(sol["primal objective"], 1.0, atol=1e-5)


def test_cpl_linear_objective_nonlinear_constraint():
    # minimize -x - y  s.t. x^2 + y^2 <= 1  -> x = y = 1/sqrt(2)
    c = np.array([-1.0, -1.0])

    def F(x=None, z=None):
        if x is None:
            return 1, jnp.zeros(2)
        f = jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0])
        Df = jnp.array([[2 * x[0], 2 * x[1]]])
        if z is None:
            return f, Df
        return f, Df, z[0] * 2.0 * jnp.eye(2)

    sol = cpl(c, F)
    assert sol["status"] == "optimal"
    r = 1.0 / np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(sol["x"]), [r, r], atol=1e-5)


def test_cpl_with_linear_cone_constraints():
    # minimize -x - y s.t. x^2 + y^2 <= 1, y <= 0.5
    c = np.array([-1.0, -1.0])

    def F(x=None, z=None):
        if x is None:
            return 1, jnp.zeros(2)
        f = jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0])
        Df = jnp.array([[2 * x[0], 2 * x[1]]])
        if z is None:
            return f, Df
        return f, Df, z[0] * 2.0 * jnp.eye(2)

    G = np.array([[0.0, 1.0]])
    h = np.array([0.5])
    sol = cpl(c, F, G, h)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    np.testing.assert_allclose(x[1], 0.5, atol=1e-5)
    np.testing.assert_allclose(x[0], np.sqrt(1 - 0.25), atol=1e-5)


def test_oracle_from_function():
    # same circle problem via autodiff oracle
    c = np.array([-1.0, -1.0])
    F = oracle_from_function(
        lambda x: jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0]), np.zeros(2))
    sol = cpl(c, F)
    assert sol["status"] == "optimal"
    r = 1.0 / np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(sol["x"]), [r, r], atol=1e-5)


def test_gp_symmetric():
    # minimize e^x + e^-x (log form) -> x = 0, value log 2
    K = [2]
    F = np.array([[1.0], [-1.0]])
    g = np.zeros(2)
    sol = gp(K, F, g)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [0.0], atol=1e-5)
    np.testing.assert_allclose(sol["primal objective"], np.log(2.0),
                               atol=1e-5)


def test_gp_constrained():
    # minimize x + y s.t. e^-x + e^-y <= 1  -> x = y = log 2
    K = [1, 2]
    F = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    g = np.zeros(3)
    sol = gp(K, F, g)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               [np.log(2.0), np.log(2.0)], atol=1e-5)


def test_gp_box_volume():
    # the userguide gp example (doc/source/solvers.rst): maximize box
    # volume h*w*d with wall/floor area and aspect-ratio limits.
    Aflr, Awall = 1000.0, 100.0
    alpha, beta, gamma, delta = 0.5, 2.0, 0.5, 2.0
    # variables (log h, log w, log d)
    K = [1, 2, 1, 1, 1, 1]
    Fm = np.array([
        [-1.0, -1.0, -1.0],   # objective: minimize -log(hwd)
        [1.0, 1.0, 0.0],      # (2/Awall) hw
        [1.0, 0.0, 1.0],      # (2/Awall) hd
        [0.0, 1.0, 1.0],      # (1/Aflr) wd
        [-1.0, 1.0, 0.0],     # alpha w/h <= ... h/w >= alpha: alpha*w/h<=1
        [1.0, -1.0, 0.0],     # h/(beta w) <= 1
        [0.0, -1.0, 1.0],     # gamma d/w ... w/d bounds
    ])
    g = np.log(np.array([1.0, 2.0 / Awall, 2.0 / Awall, 1.0 / Aflr,
                         alpha, 1.0 / beta, gamma]))
    # merge rows per block: K = [1, 2, 1, 1, 1, 1] -> F rows 7? fix: last
    # aspect constraint only one-sided here for simplicity.
    sol = gp(K, Fm, g)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    h, w, d = np.exp(x)
    assert 2 * (h * w + h * d) <= Awall * (1 + 1e-6)
    assert w * d <= Aflr * (1 + 1e-6)
    # oracle check with scipy on the log-domain convex form
    from scipy.optimize import minimize

    def obj(v):
        return -(v[0] + v[1] + v[2])

    cons = [
        {"type": "ineq", "fun": lambda v: -np.log(
            np.exp(v[0] + v[1] + np.log(2 / Awall)) +
            np.exp(v[0] + v[2] + np.log(2 / Awall)))},
        {"type": "ineq", "fun": lambda v: -(v[1] + v[2] + np.log(1 / Aflr))},
        {"type": "ineq", "fun": lambda v: -(-v[0] + v[1] + np.log(alpha))},
        {"type": "ineq", "fun": lambda v: -(v[0] - v[1] + np.log(1 / beta))},
        {"type": "ineq", "fun": lambda v: -(-v[1] + v[2] + np.log(gamma))},
    ]
    ref = minimize(obj, np.zeros(3), constraints=cons, method="SLSQP")
    np.testing.assert_allclose(sol["primal objective"], ref.fun, atol=1e-4)


def test_cpl_operator_G_custom_kkt():
    """Operator-form G + custom kktsolver through the nonlinear path —
    the customization contract extended to cpl."""
    from jax.scipy.linalg import cho_factor, cho_solve
    c = np.array([-1.0, -1.0])
    n = 2

    def F(x=None, z=None):
        if x is None:
            return 1, jnp.zeros(2)
        f = jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0])
        Df = jnp.array([[2 * x[0], 2 * x[1]]])
        if z is None:
            return f, Df
        return f, Df, z[0] * 2.0 * jnp.eye(2)

    # constraint y <= 0.5 expressed as operator G
    def G(v, trans=False):
        if trans:
            return jnp.array([0.0, v[0]])
        return jnp.array([v[1]])

    h = np.array([0.5])
    Gd = jnp.array([[0.0, 1.0]])

    def kktsolver(W, H=None, Df=None):
        d = W.d  # (mnl + 1,) = (dnl scaling, l scaling)
        Geff = jnp.concatenate([Df, Gd], axis=0)
        Gs = Geff / d[:, None]
        K = H + Gs.T @ Gs
        C = cho_factor(K, lower=True)

        def solve(bx, by, bz):
            bzs = bz / d
            ux = cho_solve(C, bx + Gs.T @ bzs)
            uz = (Gs @ ux - bzs) / d
            return ux, jnp.zeros((0,), bx.dtype), uz

        return solve

    from kvxopt_tpu.solvers import cpl
    sol = cpl(c, F, G, h, kktsolver=kktsolver)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    np.testing.assert_allclose(x[1], 0.5, atol=1e-5)
    np.testing.assert_allclose(x[0], np.sqrt(1 - 0.25), atol=1e-5)


def test_cpl_soc_cone_constraint():
    # minimize -x0 s.t. x0^2+x1^2 <= 4 (nonlinear) and x in SOC
    from kvxopt_tpu.cones import ConeDims
    from kvxopt_tpu.solvers import cpl
    c = np.array([-1.0, 0.0])

    def F(x=None, z=None):
        if x is None:
            return 1, jnp.zeros(2)
        f = jnp.array([x[0] ** 2 + x[1] ** 2 - 4.0])
        Df = jnp.array([[2 * x[0], 2 * x[1]]])
        if z is None:
            return f, Df
        return f, Df, z[0] * 2.0 * jnp.eye(2)

    # -x in SOC^2: |x1| <= x0
    G = -np.eye(2)
    h = np.zeros(2)
    sol = cpl(c, F, G, h, dims=ConeDims(l=0, q=(2,)))
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [2.0, 0.0],
                               atol=1e-4)


def test_cp_pytree_vector_space():
    """cp over a structured pytree x-space {'a','b'} (the reference's
    third customization level, cvxprog.py xnewcopy/xdot/xscal/xaxpy)
    agrees with the dense path.  The custom kktsolver densifies the
    extended-space operators via ravel_pytree."""
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree
    from kvxopt_tpu.solvers import cp
    from kvxopt_tpu.solvers.cvxprog import oracle_from_function

    n1, n2 = 2, 3
    n = n1 + n2
    a = np.linspace(0.3, 0.7, n1)
    bshift = np.linspace(-0.4, 0.4, n2)

    # dense reference: f0(x) = sum exp(x[:n1]-a) + sum (x[n1:]+b)^2
    def f0_flat(x):
        return (jnp.sum(jnp.exp(x[:n1] - a)) +
                jnp.sum((x[n1:] + bshift) ** 2) +
                0.1 * jnp.sum(x ** 2))

    Fd = oracle_from_function(lambda x: jnp.atleast_1d(f0_flat(x)) * 1.0,
                              np.zeros(n))

    # cp needs mnl+1 rows with f0 first; oracle_from_function builds a
    # 1-row oracle => mnl = 0
    def Fdense(x=None, z=None):
        if x is None:
            m, x0 = Fd()
            return m - 1, x0
        return Fd(x) if z is None else Fd(x, z)

    sol_dense = cp(Fdense)
    assert sol_dense["status"] == "optimal"

    # pytree-space oracle: x = {'a': (n1,), 'b': (n2,)}
    x0_tree = {"a": jnp.zeros(n1), "b": jnp.zeros(n2)}

    def f0_tree(x):
        return (jnp.sum(jnp.exp(x["a"] - a)) +
                jnp.sum((x["b"] + bshift) ** 2) +
                0.1 * (jnp.sum(x["a"] ** 2) + jnp.sum(x["b"] ** 2)))

    grad_f0 = jax.grad(f0_tree)

    def Ftree(x=None, z=None):
        if x is None:
            return 0, x0_tree
        val = jnp.atleast_1d(f0_tree(x))
        g = grad_f0(x)

        def Df(u, trans=False):
            if trans:  # R^1 -> x-space
                return jax.tree_util.tree_map(lambda t: u[0] * t, g)
            return jnp.atleast_1d(
                sum(jnp.vdot(gl, ul) for gl, ul in
                    zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(u))))

        if z is None:
            return val, Df

        def Hop(u):
            _, hvp = jax.jvp(grad_f0, (x,), (u,))
            return jax.tree_util.tree_map(lambda t: z[0] * t, hvp)

        return val, Df, Hop

    def kktsolver(W, H=None, Df=None):
        # densify the extended-space operators through ravel_pytree
        proto = (x0_tree, jnp.zeros(()))
        flat0, unravel = ravel_pytree(proto)
        ntot = flat0.shape[0]
        eye = np.eye(ntot)
        cols_H = []
        cols_D = []
        for i in range(ntot):
            ei = unravel(jnp.asarray(eye[i]))
            cols_H.append(ravel_pytree(H(ei))[0])
            cols_D.append(Df(ei))
        Hd = jnp.stack(cols_H, axis=1)
        Dd = jnp.stack(cols_D, axis=0).reshape(ntot, -1).T  # (mnl+1, ntot)
        d = W.d
        Gs = Dd / d[:, None]
        K = Hd + Gs.T @ Gs + 1e-12 * jnp.eye(ntot)
        L = jnp.linalg.cholesky(K)

        def solve(bx, by, bz):
            bxf, _ = ravel_pytree(bx)
            bzs = bz / d
            f = bxf + Gs.T @ bzs
            u = jax.scipy.linalg.solve_triangular(L, f, lower=True)
            ux = jax.scipy.linalg.solve_triangular(L.T, u, lower=False)
            uz = (Gs @ ux - bzs) / d
            return unravel(ux), by, uz

        return solve

    sol_tree = cp(Ftree, kktsolver=kktsolver, xnewcopy=lambda u: u)
    assert sol_tree["status"] == "optimal"
    xcat = np.concatenate([np.asarray(sol_tree["x"]["a"]),
                           np.asarray(sol_tree["x"]["b"])])
    np.testing.assert_allclose(xcat, np.asarray(sol_dense["x"]),
                               atol=1e-6)
