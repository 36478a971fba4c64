"""Build a minimal importable copy of the reference kvxopt for use as a
behavioral oracle in benchmarks and parity studies.

Compiles only the reference's self-contained C extensions — base (with
dense/sparse), blas, lapack, misc_solvers — against the system
libblas/liblapack; the SuiteSparse/FFTW/GSL wrappers and external-solver
bridges are not built (their imports are stubbed where needed).  The
pure-Python solver stack (coneprog/cvxprog/misc/modeling) runs unmodified
on top.

This is tooling, not product code: nothing from /root/reference is copied
into kvxopt_tpu.  The build lands in a scratch prefix (default
/tmp/kvxopt_ref) and is imported only by bench.py (the "reference CPU"
column) and docs/parity studies.

Usage:
    python tools/build_reference.py [--prefix /tmp/kvxopt_ref]
    sys.path.insert(0, prefix); import kvxopt
"""

import argparse
import os
import shutil
import subprocess
import sys

REF = os.environ.get("KVXOPT_REFERENCE", "/root/reference")

SETUP = """
from setuptools import setup, Extension
SRC = {src!r}
kw = dict(libraries=[":libblas.so.3", ":liblapack.so.3"],
          library_dirs=["/usr/lib/x86_64-linux-gnu"], include_dirs=[SRC])
setup(name="kvxopt", version="1.3.2",
      ext_modules=[
          Extension("kvxopt.base",
                    [f"{{SRC}}/base.c", f"{{SRC}}/dense.c",
                     f"{{SRC}}/sparse.c"], **kw),
          Extension("kvxopt.blas", [f"{{SRC}}/blas.c"], **kw),
          Extension("kvxopt.lapack", [f"{{SRC}}/lapack.c"], **kw),
          Extension("kvxopt.misc_solvers",
                    [f"{{SRC}}/misc_solvers.c"], **kw),
      ],
      packages=["kvxopt"], package_dir={{"kvxopt": "kvxopt"}})
"""


def build(prefix="/tmp/kvxopt_ref", quiet=True):
    """Build (or reuse) the oracle; returns the prefix to put on sys.path,
    or None if the reference tree or toolchain is unavailable."""
    marker = os.path.join(prefix, "kvxopt", "misc_solvers.cpython-%d%d-x86_64-linux-gnu.so"
                          % sys.version_info[:2])
    if os.path.exists(marker):
        return prefix
    if not os.path.isdir(os.path.join(REF, "src", "C")):
        return None
    os.makedirs(os.path.join(prefix, "kvxopt"), exist_ok=True)
    pkg = os.path.join(prefix, "kvxopt")
    for py in os.listdir(os.path.join(REF, "src", "python")):
        if py.endswith(".py"):
            shutil.copy(os.path.join(REF, "src", "python", py), pkg)
    # stub the cholmod import (not built; only used by sparse-KKT paths)
    misc = os.path.join(pkg, "misc.py")
    src = open(misc).read()
    src = src.replace(
        "from kvxopt import base, blas, lapack, cholmod, misc_solvers",
        "from kvxopt import base, blas, lapack, misc_solvers\ncholmod = None")
    open(misc, "w").write(src)
    with open(os.path.join(prefix, "setup_min.py"), "w") as f:
        f.write(SETUP.format(src=os.path.join(REF, "src", "C")))
    try:
        subprocess.run(
            [sys.executable, "setup_min.py", "build_ext", "--inplace"],
            cwd=prefix, check=True,
            capture_output=quiet)
    except subprocess.CalledProcessError:
        return None
    return prefix if os.path.exists(marker) else None


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", default="/tmp/kvxopt_ref")
    args = ap.parse_args()
    out = build(args.prefix, quiet=False)
    print("built:", out)
