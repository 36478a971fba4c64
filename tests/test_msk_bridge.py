"""MOSEK bridge tests against a fake in-process `mosek` module.

The commercial `mosek` package is not installable here, so these tests
install a minimal fake Task API whose `optimize()` delegates to this
package's own native solvers, then drive the full bridge
(kvxopt_tpu/msk.py) through it.  This validates everything the bridge
owns — problem assembly (bounds, rows, cones, barvar triplets), solution
extraction (solutionslice indexing, packed-lower-triangle barxj
expansion), and the solvers.lp/socp/qp dispatch mapping into the
reference solution dict (reference coneprog.py:2908-3036) — while the
sign conventions themselves follow the reference's msk.py.
"""

import enum
import sys
import types
import unittest

import numpy as np


def _make_fake_mosek():
    mod = types.ModuleType("mosek")

    class boundkey(enum.Enum):
        fr, up, fx, lo = range(4)

    class objsense(enum.Enum):
        minimize, maximize = range(2)

    class streamtype(enum.Enum):
        log, msg = range(2)

    class solitem(enum.Enum):
        xx, suc, slc = range(3)

    class soltype(enum.Enum):
        bas, itr, itg = range(3)

    class solsta(enum.Enum):
        optimal, unknown, prim_infeas_cer, dual_infeas_cer = range(4)

    class variabletype(enum.Enum):
        type_int = 0

    class conetype(enum.Enum):
        quad = 0

    class iparam(enum.Enum):
        log, mio_mode = range(2)

    class miomode(enum.Enum):
        satisfied = 0

    class Task:
        def __init__(self):
            self.numvar = 0
            self.numcon = 0
            self.cj = {}
            self.varbound = {}
            self.arows = {}
            self.conbound = {}
            self.qobj = None
            self.cones = []
            self.barvardims = []
            self.barc = []
            self.bara = []
            self.vartypes = {}
            self.objsense = objsense.minimize
            self.params = {}
            self._sol = None
            self._barx = []

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def set_Stream(self, *a):
            pass

        def putintparam(self, p, v):
            self.params[p] = v

        putdouparam = putstrparam = putintparam

        def appendvars(self, n):
            self.numvar += n

        def appendcons(self, m):
            self.numcon += m

        def putcj(self, j, v):
            self.cj[j] = v

        def putvarbound(self, j, bk, lo, hi):
            self.varbound[j] = bk

        def putarow(self, i, cols, vals):
            self.arows[i] = (list(cols), list(vals))

        def putconbound(self, i, bk, lo, hi):
            self.conbound[i] = (bk, lo, hi)

        def putqobj(self, rows, cols, vals):
            self.qobj = (list(rows), list(cols), list(vals))

        def putobjsense(self, s):
            self.objsense = s

        def appendcone(self, ct, par, members):
            self.cones.append(list(members))

        def appendbarvars(self, dims):
            self.barvardims = list(dims)

        def putbarcblocktriplet(self, num, bj, bk, bl, bv):
            self.barc = list(zip(bj, bk, bl, bv))

        def putbarablocktriplet(self, num, ai, aj, ak, al, av):
            self.bara = list(zip(ai, aj, ak, al, av))

        def putvartypelist(self, idx, types_):
            self.vartypes = dict(zip(idx, types_))

        def writetask(self, f):
            pass

        writedata = writetask

        def solutionsummary(self, *a):
            pass

        def _dense(self):
            """Recorded constraint rows as a dense (numcon, numvar)."""
            M = np.zeros((self.numcon, self.numvar))
            for i, (cols, vals) in self.arows.items():
                M[i, cols] = vals
            return M

        def optimize(self):
            import kvxopt_tpu.solvers as solvers
            cvec = np.array([self.cj.get(j, 0.0)
                             for j in range(self.numvar)])
            if self.objsense is objsense.minimize:
                # primal lp/qp/ilp form: up rows → G, fx rows → A
                M = self._dense()
                gi = [i for i in range(self.numcon)
                      if self.conbound[i][0] is boundkey.up]
                ei = [i for i in range(self.numcon)
                      if self.conbound[i][0] is boundkey.fx]
                G, h = M[gi], np.array([self.conbound[i][2] for i in gi])
                A, b = M[ei], np.array([self.conbound[i][2] for i in ei])
                if self.qobj:
                    r, c, v = self.qobj
                    P = np.zeros((self.numvar, self.numvar))
                    P[r, c] = v
                    P = P + np.tril(P, -1).T
                    sol = solvers.qp(P, cvec, G, h,
                                     A if len(ei) else None,
                                     b if len(ei) else None)
                else:
                    sol = solvers.lp(cvec, G, h,
                                     A if len(ei) else None,
                                     b if len(ei) else None)
                x = np.asarray(sol["x"]).reshape(-1)
                z = np.asarray(sol["z"]).reshape(-1)
                y = (np.asarray(sol["y"]).reshape(-1)
                     if sol["y"] is not None and len(ei) else np.zeros(0))
                suc = np.zeros(self.numcon)
                slc = np.zeros(self.numcon)
                suc[gi] = z
                suc[ei] = np.maximum(y, 0.0)
                slc[ei] = np.maximum(-y, 0.0)
                self._sol = {solitem.xx: x, solitem.suc: suc,
                             solitem.slc: slc}
            else:
                # dual cone form: reconstruct the original conelp data
                GT = self._dense()           # (n, dimx) = Gl'
                dimx = self.numvar
                n = self.numcon
                ml = sum(1 for j in range(dimx)
                         if self.varbound[j] is boundkey.lo)
                mq = [len(m) for m in self.cones]
                ms = self.barvardims
                hl = -cvec
                c = -np.array([self.conbound[i][2] for i in range(n)])
                sdim = sum(k * k for k in ms)
                G = np.zeros((dimx + sdim, n))
                G[:dimx] = GT.T
                h = np.concatenate([hl, np.zeros(sdim)])
                base = dimx
                for (bj, bk, bl, bv) in self.barc:
                    ofs = base + sum(k * k for k in ms[:bj])
                    k_s = ms[bj]
                    h[ofs + bl * k_s + bk] = -bv
                    h[ofs + bk * k_s + bl] = -bv
                for (ai, aj, ak, al, av) in self.bara:
                    ofs = base + sum(k * k for k in ms[:aj])
                    k_s = ms[aj]
                    G[ofs + al * k_s + ak, ai] = av
                    G[ofs + ak * k_s + al, ai] = av
                dims = {"l": ml, "q": mq, "s": list(ms)}
                sol = solvers.conelp(c, G, h, dims)
                x = np.asarray(sol["x"]).reshape(-1)
                z = np.asarray(sol["z"]).reshape(-1)
                self._sol = {solitem.xx: z[:dimx],
                             solitem.suc: np.maximum(x, 0.0),
                             solitem.slc: np.maximum(-x, 0.0)}
                self._barx = []
                ofs = dimx
                for k_s in ms:
                    Zs = z[ofs:ofs + k_s * k_s].reshape(k_s, k_s,
                                                        order="F")
                    packed = [Zs[i, j] for j in range(k_s)
                              for i in range(j, k_s)]
                    self._barx.append(packed)
                    ofs += k_s * k_s

        def getsolsta(self, st):
            return solsta.optimal

        def getsolutionslice(self, st, item, first, last, out):
            out[0:last - first] = list(self._sol[item][first:last])

        def getbarxj(self, st, j, out):
            out[0:len(out)] = self._barx[j]

    class Env:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def Task(self, a=0, b=0):
            return Task()

    for name, obj in (("boundkey", boundkey), ("objsense", objsense),
                      ("streamtype", streamtype), ("solitem", solitem),
                      ("soltype", soltype), ("solsta", solsta),
                      ("variabletype", variabletype),
                      ("conetype", conetype), ("iparam", iparam),
                      ("miomode", miomode), ("Env", Env), ("Task", Task)):
        setattr(mod, name, obj)
    return mod


class TestMosekBridge(unittest.TestCase):

    @classmethod
    def setUpClass(cls):
        cls._saved = sys.modules.get("mosek")
        sys.modules["mosek"] = _make_fake_mosek()
        sys.modules.pop("kvxopt_tpu.msk", None)
        import kvxopt_tpu.msk  # noqa: F401

    @classmethod
    def tearDownClass(cls):
        sys.modules.pop("kvxopt_tpu.msk", None)
        if cls._saved is None:
            sys.modules.pop("mosek", None)
        else:
            sys.modules["mosek"] = cls._saved

    # the reference's doc LP (examples/doc/chap8/lp.py)
    C = np.array([-4.0, -5.0])
    G = np.array([[2.0, 1.0], [1.0, 2.0], [-1.0, 0.0], [0.0, -1.0]])
    H = np.array([3.0, 3.0, 0.0, 0.0])

    def test_lp_matches_native(self):
        import kvxopt_tpu.solvers as solvers
        ref = solvers.lp(self.C, self.G, self.H)
        sol = solvers.lp(self.C, self.G, self.H, solver="mosek")
        self.assertEqual(sol["status"], "optimal")
        np.testing.assert_allclose(sol["x"], np.asarray(ref["x"]).ravel(),
                                   atol=1e-5)
        np.testing.assert_allclose(sol["z"], np.asarray(ref["z"]).ravel(),
                                   atol=1e-4)
        self.assertLess(sol["primal infeasibility"], 1e-6)
        self.assertLess(sol["dual infeasibility"], 1e-6)
        self.assertAlmostEqual(sol["primal objective"], -9.0, places=5)

    def test_lp_with_equalities(self):
        import kvxopt_tpu.solvers as solvers
        A = np.array([[1.0, 1.0]])
        b = np.array([1.5])
        ref = solvers.lp(self.C, self.G, self.H, A, b)
        sol = solvers.lp(self.C, self.G, self.H, A, b, solver="mosek")
        self.assertEqual(sol["status"], "optimal")
        np.testing.assert_allclose(sol["x"], np.asarray(ref["x"]).ravel(),
                                   atol=1e-5)
        np.testing.assert_allclose(sol["y"], np.asarray(ref["y"]).ravel(),
                                   atol=1e-4)

    def test_qp_matches_native(self):
        import kvxopt_tpu.solvers as solvers
        P = np.array([[2.0, 0.5], [0.5, 1.0]])
        q = np.array([1.0, -1.0])
        ref = solvers.qp(P, q, self.G, self.H)
        sol = solvers.qp(P, q, self.G, self.H, solver="mosek")
        self.assertEqual(sol["status"], "optimal")
        np.testing.assert_allclose(sol["x"], np.asarray(ref["x"]).ravel(),
                                   atol=1e-5)
        self.assertAlmostEqual(sol["primal objective"],
                               float(ref["primal objective"]), places=5)

    def test_conelp_lq_and_sdp_block(self):
        from kvxopt_tpu import msk
        import kvxopt_tpu.solvers as solvers
        import mosek
        # l (2) + s (2x2) cone problem; maximizing x1+x2 keeps it bounded
        # (the box rows only bound x from above) with the SDP block active
        # at the optimum, so the dual s-block multiplier is nonzero.
        dims = {"l": 2, "q": [], "s": [2]}
        G = np.vstack([np.array([[1.0, 0.0], [0.0, 1.0]]),
                       np.array([[1.0, 0.0], [0.0, 0.5],
                                 [0.0, 0.5], [1.0, 1.0]])])
        h = np.array([2.0, 2.0, 3.0, 0.2, 0.2, 3.0])
        c = np.array([-1.0, -1.0])
        ref = solvers.conelp(c, G, h, dims)
        solsta, x, z = msk.conelp(c, G, h, dims)
        self.assertIs(solsta, mosek.solsta.optimal)
        np.testing.assert_allclose(np.asarray(x).ravel(),
                                   np.asarray(ref["x"]).ravel(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(z).ravel(),
                                   np.asarray(ref["z"]).ravel(), atol=1e-4)

    def test_socp_matches_native(self):
        import kvxopt_tpu.solvers as solvers
        # userguide SOCP shape: 1 linear row + one q cone
        c = np.array([-2.0, 1.0])
        Gl = np.array([[1.0, 1.0]])
        hl = np.array([4.0])
        Gq = [np.array([[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]])]
        hq = [np.array([2.0, 0.0, 0.0])]
        ref = solvers.socp(c, Gl, hl, Gq, hq)
        sol = solvers.socp(c, Gl, hl, Gq, hq, solver="mosek")
        self.assertEqual(sol["status"], "optimal")
        np.testing.assert_allclose(np.asarray(sol["x"]).ravel(),
                                   np.asarray(ref["x"]).ravel(), atol=1e-4)
        self.assertEqual(len(sol["zq"]), 1)
        np.testing.assert_allclose(np.asarray(sol["zq"][0]).ravel(),
                                   np.asarray(ref["zq"][0]).ravel(),
                                   atol=1e-4)

    def test_ilp_records_integers(self):
        from kvxopt_tpu import msk
        import mosek
        # LP with an integral optimal vertex; checks the itg plumbing
        c = np.array([-1.0, -1.0])
        G = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
        h = np.array([3.0, 2.0, 0.0, 0.0])
        solsta, x = msk.ilp(c, G, h, I={0, 1})
        self.assertIs(solsta, mosek.solsta.optimal)
        np.testing.assert_allclose(np.asarray(x).ravel(), [3.0, 2.0],
                                   atol=1e-5)


if __name__ == "__main__":
    unittest.main()
