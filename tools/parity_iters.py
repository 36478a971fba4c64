"""Iteration-count parity study vs the reference solver (VERDICT r2 #8).

Runs the userguide example set through this package and through the
reference kvxopt (built by tools/build_reference.py) at identical default
tolerances, and prints a table of iteration counts and objectives.

Usage: python tools/parity_iters.py   (runs on CPU for determinism)
"""

import sys

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    from tools.build_reference import build
    prefix = build()
    assert prefix, "reference build failed"
    sys.path.insert(0, prefix)
    from kvxopt import solvers as ref, matrix
    ref.options["show_progress"] = False
    from kvxopt_tpu import solvers as ours

    rows = []

    def add(name, mine, theirs, key="primal objective"):
        def g(sol):
            v = sol.get(key)
            return float(v) if v is not None else float("nan")
        rows.append((name, mine["iterations"], theirs["iterations"],
                     g(mine), g(theirs),
                     mine["status"], theirs["status"]))

    # userguide LP (doc/source/coneprog.rst)
    c = np.array([-4., -5.])
    G = np.array([[2., 1., -1., 0.], [1., 2., 0., -1.]]).T
    h = np.array([3., 3., 0., 0.])
    add("lp (userguide)", ours.lp(c, G, h),
        ref.lp(matrix(c), matrix(np.asfortranarray(G)), matrix(h)))

    # userguide SOCP
    c = np.array([-2., 1., 5.])
    G1 = np.array([[12., 13., 12.], [6., -3., -12.], [-5., -5., 6.]]).T
    h1 = np.array([-12., -3., -2.])
    G2 = np.array([[3., 3., -1., 1.], [-6., -6., -9., 19.],
                   [10., -2., -2., -3.]]).T
    h2 = np.array([27., 0., 3., -42.])
    add("socp (userguide)",
        ours.socp(c, Gq=[G1, G2], hq=[h1, h2]),
        ref.socp(matrix(c), Gq=[matrix(np.asfortranarray(G1)),
                                matrix(np.asfortranarray(G2))],
                 hq=[matrix(h1), matrix(h2)]))

    # userguide SDP
    c = np.array([1., -1., 1.])
    G1 = np.array([[-7., -11., -11., 3.], [7., -18., -18., 8.],
                   [-2., -8., -8., 1.]]).T
    G2 = np.array([[-21., -11., 0., -11., 10., 8., 0., 8., 5.],
                   [0., 10., 16., 10., -10., -10., 16., -10., 3.],
                   [-5., 2., -17., 2., -6., 8., -17., 8., 6.]]).T
    h1 = np.array([[33., -9.], [-9., 26.]])
    h2 = np.array([[14., 9., 40.], [9., 91., 10.], [40., 10., 15.]])
    add("sdp (userguide)",
        ours.sdp(c, Gs=[G1, G2], hs=[h1, h2]),
        ref.sdp(matrix(c), Gs=[matrix(np.asfortranarray(G1)),
                               matrix(np.asfortranarray(G2))],
                hs=[matrix(np.asfortranarray(h1)),
                    matrix(np.asfortranarray(h2))]))

    # userguide QP (small random least-squares-like)
    rng = np.random.default_rng(0)
    n, m = 10, 20
    P = (lambda M: M @ M.T + np.eye(n))(rng.standard_normal((n, n)))
    q = rng.standard_normal(n)
    Gq = rng.standard_normal((m, n))
    hq = Gq @ rng.standard_normal(n) + rng.uniform(0.5, 1.5, m)
    add("qp (random l-cone)",
        ours.qp(P, q, Gq, hq),
        ref.qp(matrix(np.asfortranarray(P)), matrix(q),
               matrix(np.asfortranarray(Gq)), matrix(hq)))

    # l1 approximation LP (chap8 l1.py structure)
    m2, n2 = 40, 12
    A = rng.standard_normal((m2, n2)); b = rng.standard_normal(m2)
    cc = np.concatenate([np.zeros(n2), np.ones(m2)])
    GG = np.block([[A, -np.eye(m2)], [-A, -np.eye(m2)]])
    hh = np.concatenate([b, -b])
    add("l1 approx LP",
        ours.lp(cc, GG, hh),
        ref.lp(matrix(cc), matrix(np.asfortranarray(GG)), matrix(hh)))

    # boeing2 (MPS)
    import os
    if os.path.exists("/root/reference/tests/boeing2.mps"):
        from kvxopt_tpu.models.modeling import op
        lpop = op(); lpop.fromfile("/root/reference/tests/boeing2.mps")
        cvec, const0, Gb, hb, Ab, bb = lpop._build_lp()[:6]
        add("boeing2.mps LP",
            ours.lp(cvec, Gb, hb, Ab, bb),
            ref.lp(matrix(cvec), matrix(np.asfortranarray(Gb)),
                   matrix(hb), matrix(np.asfortranarray(Ab)),
                   matrix(bb)))

    print(f"{'problem':22s} {'iters':>11s} {'objective (ours/ref)':>42s} "
          f"{'status':>18s}")
    for nm, i1, i2, o1, o2, s1, s2 in rows:
        print(f"{nm:22s} {i1:4d} vs {i2:3d} {o1:20.8f} {o2:20.8f}"
              f" {s1:>9s}/{s2:9s}")


if __name__ == "__main__":
    main()
