"""Examples as integration tests (the reference's docs-as-tests pattern,
tests/test_examples.py: executes the chap8 example scripts and asserts
status/solution values)."""

import os
import sys

import numpy as np
import pytest

EXDIR = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, EXDIR)


def test_lp_example():
    import lp as ex
    sol = ex.main()
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [1.0, 1.0],
                               atol=1e-6)
    np.testing.assert_allclose(sol["primal objective"], -9.0, atol=1e-6)


def test_l1_example():
    import l1 as ex
    sol = ex.main()
    assert sol["status"] == "optimal"


def test_portfolio_example():
    import portfolio as ex
    out = ex.main(n=6, nmu=4)
    assert (out["batch_status"] == 1).all()
    # returns should be decreasing in risk aversion (mu increasing)
    assert out["returns"][0] >= out["returns"][-1] - 1e-6


def test_mcsdp_example():
    import mcsdp as ex
    sol = ex.main(n=12)
    assert sol["status"] == "optimal"


def test_qcl1_example():
    import qcl1 as ex
    sol = ex.main()
    assert sol["status"] == "optimal"


def test_acent_example():
    import acent as ex
    sol = ex.main()
    assert sol["status"] == "optimal"


def test_chebyshev_example():
    import chebyshev as ex
    sol = ex.main()
    assert sol["status"] == "optimal"


def test_robls_example():
    import robls as ex
    sol = ex.main()
    assert sol["status"] == "optimal"
