"""Generate per-module API reference pages (docs/api/*.md) from the
package's own signatures and docstrings — the same autodoc practice the
reference uses (its Sphinx manual under doc/source/*.rst pairs prose
with the extension docstrings).

Run from the repo root:  python tools/gen_api_docs.py
"""

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MODULES = [
    ("kvxopt_tpu.base", "Dense and sparse matrices",
     ["matrix", "spmatrix", "sparse", "spdiag", "normal", "uniform",
      "setseed", "getseed", "exp", "log", "sqrt", "mul", "div", "emul",
      "ediv", "min", "max"]),
    ("kvxopt_tpu.blas", "BLAS level 1/2/3", None),
    ("kvxopt_tpu.lapack", "LAPACK drivers", None),
    ("kvxopt_tpu.solvers", "Cone and nonlinear solvers",
     ["conelp", "coneqp", "lp", "qp", "socp", "sdp", "cp", "cpl", "gp",
      "options"]),
    ("kvxopt_tpu.models.modeling", "Modeling DSL",
     ["op", "variable", "constraint", "dot", "sum", "max", "min"]),
    ("kvxopt_tpu.cones", "Cone operations (NT scalings)", None),
    ("kvxopt_tpu.kkt", "KKT factorization strategies",
     ["make_kkt_solver", "mixed_spd_solver", "cond_any"]),
    ("kvxopt_tpu.parallel", "Batched and sharded solvers", None),
    ("kvxopt_tpu.umfpack", "UMFPACK-style sparse LU", None),
    ("kvxopt_tpu.klu", "KLU-style sparse LU (BTF + refactorization)",
     None),
    ("kvxopt_tpu.cholmod", "CHOLMOD-style sparse Cholesky", None),
    ("kvxopt_tpu.amd", "AMD ordering", None),
    ("kvxopt_tpu.fftw", "FFT transforms", None),
    ("kvxopt_tpu.gsl", "RNG (gsl interface)", None),
    ("kvxopt_tpu.glpk", "GLPK bridge (lp / ilp)", None),
    ("kvxopt_tpu.osqp", "OSQP-style ADMM QP", None),
    ("kvxopt_tpu.msk", "MOSEK bridge", None),
    ("kvxopt_tpu.dsdp", "DSDP interface", None),
    ("kvxopt_tpu.gurobi", "Gurobi bridge", None),
    ("kvxopt_tpu.printing", "Printing options", None),
]


def _public(mod, names):
    if names is not None:
        out = []
        for n in names:
            if hasattr(mod, n):
                out.append((n, getattr(mod, n)))
        return out
    names = getattr(mod, "__all__", None) or [
        n for n in dir(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        m = getattr(obj, "__module__", "")
        if callable(obj) and not (m or "").startswith("kvxopt_tpu"):
            continue
        out.append((n, obj))
    return out


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _doc(obj):
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(undocumented)*"


def emit(modname, title, names, outdir):
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}` — {title}", ""]
    md = inspect.getdoc(mod)
    if md:
        lines += [md, ""]
    seen_ids = {}
    for name, obj in _public(mod, names):
        if inspect.isclass(obj):
            lines += [f"## class `{name}{_sig(obj)}`", "", _doc(obj), ""]
            for mn, mobj in inspect.getmembers(obj):
                if mn.startswith("_") or not callable(mobj):
                    continue
                if getattr(mobj, "__doc__", None):
                    lines += [f"### `{name}.{mn}{_sig(mobj)}`", "",
                              _doc(mobj), ""]
        elif callable(obj):
            alias = seen_ids.get(id(obj))
            if alias:
                lines += [f"## `{name}` — alias of `{alias}`", ""]
                continue
            seen_ids[id(obj)] = name
            lines += [f"## `{name}{_sig(obj)}`", "", _doc(obj), ""]
        else:
            lines += [f"## `{name}`", "",
                      f"`{type(obj).__name__}` value.", ""]
    short = modname.split(".")[-1]
    path = os.path.join(outdir, f"{short}.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    nsym = sum(1 for ln in lines if ln.startswith("## "))
    return short, nsym


def main():
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "api")
    os.makedirs(outdir, exist_ok=True)
    index = ["# API reference", "",
             "Generated from the package's signatures and docstrings "
             "by `tools/gen_api_docs.py` (re-run after changing "
             "docstrings).", ""]
    total = 0
    for modname, title, names in MODULES:
        try:
            short, nsym = emit(modname, title, names, outdir)
        except ImportError as e:
            # optional backends (e.g. msk needs the mosek package)
            print(f"skip {modname}: {e}")
            continue
        index.append(f"- [`{modname}`]({short}.md) — {title} "
                     f"({nsym} symbols)")
        total += nsym
    index += ["", f"Total documented symbols: {total}"]
    with open(os.path.join(outdir, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(MODULES)} pages, {total} symbols -> {outdir}")


if __name__ == "__main__":
    main()
