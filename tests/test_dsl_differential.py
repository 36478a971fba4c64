"""Differential test of the modeling DSL against the reference.

Each case builds the same optimization problem through this package's
DSL and through the reference's `kvxopt.modeling` (compiled from
/root/reference by tools/build_reference.py) and compares status and
optimal objective value.  This is the DSL-level analogue of the
solver-level iteration-parity study (tools/parity_iters.py) and of the
reference's own dual-path oracle strategy (SURVEY.md section 4).
"""

import sys

import numpy as np
import pytest

from kvxopt_tpu.models import modeling as om


@pytest.fixture(scope="module")
def refmod():
    sys.path.insert(0, ".")
    from tools.build_reference import build
    prefix = build()
    if prefix is None:
        pytest.skip("reference oracle unavailable")
    if prefix not in sys.path:
        sys.path.insert(0, prefix)
    import kvxopt
    from kvxopt import modeling, solvers
    solvers.options["show_progress"] = False
    return kvxopt, modeling


_rng = np.random.default_rng(0)
_A = _rng.standard_normal((6, 3))
_b = _rng.standard_normal(6)


def _mk(kv, arr):
    arr = np.asarray(arr, dtype=float)
    return np.asarray(arr) if kv is None else kv.matrix(arr)


# each case: (name, builder(mod, x, kv) -> (objective, constraints))
CASES = [
    ("sum_abs", lambda mod, x, kv:
        (mod.sum(abs(_mk(kv, _A) * x - _mk(kv, _b.reshape(-1, 1)))),
         [x <= 2, x >= -2])),
    ("max_plus_affine", lambda mod, x, kv:
        (mod.max(x) + mod.sum(x), [x >= -1, x <= 1])),
    ("nested_max", lambda mod, x, kv:
        (mod.max(mod.max(abs(x)), 0.5),
         [x >= -3, x <= 3, mod.sum(x) == 1])),
    ("pwl_constraint", lambda mod, x, kv:
        (mod.sum(x), [mod.max(abs(x)) <= 2, mod.sum(x) >= -5])),
    ("min_ge_side", lambda mod, x, kv:
        (-mod.sum(x), [mod.min(x) >= -1, x <= 4])),
    ("scaled_pwl", lambda mod, x, kv:
        (2 * mod.sum(abs(x)) + mod.sum(x),
         [x >= -2, x <= 2, mod.sum(x) <= -1])),
    ("sum_list", lambda mod, x, kv:
        (mod.sum([x[0], x[1], 1.0]), [x >= -1, x <= 1])),
    ("abs_sum_mix", lambda mod, x, kv:
        (mod.sum(abs(x)) + mod.max(x),
         [mod.sum(x) == 1, x <= 5, x >= -5])),
    ("dot_obj", lambda mod, x, kv:
        (mod.dot(_mk(kv, np.ones((3, 1))), x), [x >= -1, x <= 1])),
]


@pytest.mark.parametrize("name,builder", CASES, ids=[c[0] for c in CASES])
def test_dsl_case_matches_reference(refmod, name, builder):
    kv, rm = refmod
    results = []
    for mod, kvx in ((rm, kv), (om, None)):
        x = mod.variable(3)
        obj, cons = builder(mod, x, kvx)
        p = mod.op(obj, cons)
        p.solve()
        assert p.status == "optimal", (name, p.status)
        results.append(float(np.asarray(p.objective.value())
                             .reshape(-1)[0]))
    assert abs(results[0] - results[1]) < 1e-5, (name, results)


def test_nonconvex_objective_rejected(refmod):
    """-2*max(x) is concave; both implementations must refuse it
    (reference modeling.py: 'must be a scalar affine or convex PWL')."""
    kv, rm = refmod
    for mod in (rm, om):
        x = mod.variable(3)
        with pytest.raises(TypeError):
            mod.op(-2 * mod.max(x), [x >= 0, x <= 1]).solve()
