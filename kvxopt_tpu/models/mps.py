"""MPS problem-file I/O for the modeling DSL (reference
modeling.py:2640 tofile, :2760 fromfile).

Supports NAME/ROWS (N,L,G,E)/COLUMNS/RHS/RANGES/BOUNDS
(UP,LO,FX,FR,MI,PL)/ENDATA, fixed- or free-format.  Reading installs one
vector variable (one entry per MPS column) plus the row constraints into
the given op; writing emits the canonicalized LP."""

import numpy as np


def read_mps(problem, f):
    from .modeling import variable, affine

    close = False
    if isinstance(f, str):
        f = open(f, "r")
        close = True
    try:
        lines = f.read().splitlines()
    finally:
        if close:
            f.close()

    name = ""
    section = None
    rows = {}        # row name -> type
    row_order = []
    obj_row = None
    cols = {}        # col name -> index
    col_order = []
    entries = []     # (rowname, colname, value)
    rhs = {}
    ranges = {}
    bounds = {}      # col -> [lo, up]

    for raw in lines:
        if not raw.strip() or raw.lstrip().startswith("*"):
            continue
        if not raw[0].isspace():
            parts = raw.split()
            section = parts[0].upper()
            if section == "NAME":
                name = parts[1] if len(parts) > 1 else ""
            if section == "ENDATA":
                break
            continue
        parts = raw.split()
        if section == "ROWS":
            rtype, rname = parts[0].upper(), parts[1]
            rows[rname] = rtype
            if rtype == "N":
                if obj_row is None:
                    obj_row = rname
            else:
                row_order.append(rname)
        elif section == "COLUMNS":
            if len(parts) >= 2 and parts[1].upper() == "'MARKER'":
                continue  # integer markers unsupported (LP relaxation)
            cname = parts[0]
            if cname not in cols:
                cols[cname] = len(col_order)
                col_order.append(cname)
            for i in range(1, len(parts) - 1, 2):
                entries.append((parts[i], cname, float(parts[i + 1])))
        elif section == "RHS":
            for i in range(1, len(parts) - 1, 2):
                rhs[parts[i]] = float(parts[i + 1])
        elif section == "RANGES":
            for i in range(1, len(parts) - 1, 2):
                ranges[parts[i]] = float(parts[i + 1])
        elif section == "BOUNDS":
            btype = parts[0].upper()
            cname = parts[2]
            val = float(parts[3]) if len(parts) > 3 else 0.0
            lo, up = bounds.get(cname, [0.0, np.inf])
            if btype == "UP":
                up = val
                if val < 0 and lo == 0.0:
                    lo = -np.inf
            elif btype == "LO":
                lo = val
            elif btype == "FX":
                lo = up = val
            elif btype == "FR":
                lo, up = -np.inf, np.inf
            elif btype == "MI":
                lo = -np.inf
            elif btype == "PL":
                up = np.inf
            else:
                raise ValueError(f"unsupported bound type {btype}")
            bounds[cname] = [lo, up]

    n = len(col_order)
    x = variable(n, name=name or "x")
    # build row coefficient matrix
    ridx = {r: i for i, r in enumerate(row_order)}
    M = np.zeros((len(row_order), n))
    cobj = np.zeros(n)
    for rname, cname, val in entries:
        j = cols[cname]
        if rname == obj_row:
            cobj[j] = val
        elif rname in ridx:
            M[ridx[rname], j] = val

    problem.objective = affine({x: cobj.reshape(1, -1)}, np.zeros(1))
    problem._constraints = []

    for rname in row_order:
        i = ridx[rname]
        row_aff = affine({x: M[i:i + 1, :]}, np.zeros(1))
        rtype = rows[rname]
        rv = rhs.get(rname, 0.0)
        if rtype == "E":
            if rname in ranges:
                r = ranges[rname]
                lo = rv + min(0.0, r)
                hi = rv + max(0.0, r)
                c1 = row_aff <= hi
                c2 = row_aff >= lo
                c1.name, c2.name = rname, rname + "_lo"
                problem._constraints += [c1, c2]
            else:
                c = row_aff == rv
                c.name = rname
                problem._constraints.append(c)
        elif rtype == "L":
            c = row_aff <= rv
            c.name = rname
            problem._constraints.append(c)
            if rname in ranges:
                c2 = row_aff >= rv - abs(ranges[rname])
                c2.name = rname + "_rng"
                problem._constraints.append(c2)
        elif rtype == "G":
            c = row_aff >= rv
            c.name = rname
            problem._constraints.append(c)
            if rname in ranges:
                c2 = row_aff <= rv + abs(ranges[rname])
                c2.name = rname + "_rng"
                problem._constraints.append(c2)

    # bounds
    lo = np.zeros(n)
    up = np.full(n, np.inf)
    for cname, (l, u) in bounds.items():
        lo[cols[cname]] = l
        up[cols[cname]] = u
    for cname in col_order:
        j = cols[cname]
        if cname not in bounds:
            lo[j], up[j] = 0.0, np.inf
    finite_lo = np.isfinite(lo)
    finite_up = np.isfinite(up)
    if finite_lo.any():
        idx = np.where(finite_lo)[0]
        sel = np.zeros((len(idx), n))
        sel[np.arange(len(idx)), idx] = 1.0
        c = affine({x: sel}, np.zeros(len(idx))) >= lo[idx]
        c.name = "_bounds_lo"
        problem._constraints.append(c)
    if finite_up.any():
        idx = np.where(finite_up)[0]
        sel = np.zeros((len(idx), n))
        sel[np.arange(len(idx)), idx] = 1.0
        c = affine({x: sel}, np.zeros(len(idx))) <= up[idx]
        c.name = "_bounds_up"
        problem._constraints.append(c)
    problem.name = name
    return problem


def write_mps(problem, f):
    """Emit the canonicalized LP.  Inequality rows carry the originating
    constraint's name when it has one (suffixed by the row index within
    the constraint); all variables are written free (the canonical form
    encodes bounds as rows)."""
    close = False
    if isinstance(f, str):
        f = open(f, "w")
        close = True
    try:
        (cvec, const0, G, h, A, b, var_index, ineq_rows, varlist,
         con_aux) = problem._build_lp()
        n = len(cvec)
        rownames = [f"GROW{i}" for i in range(G.shape[0])]
        for c, _aux in con_aux:
            if c in ineq_rows and c.name:
                s0, m = ineq_rows[c]
                base = "".join(ch for ch in c.name if ch.isalnum())[:6]
                for k in range(m):
                    rownames[s0 + k] = f"{base}_{k}" if m > 1 else base
        f.write(f"NAME          {problem.name or 'KVXOPT'}\n")
        f.write("ROWS\n")
        f.write(" N  COST\n")
        for name in rownames:
            f.write(f" L  {name}\n")
        mA = A.shape[0] if A is not None else 0
        for i in range(mA):
            f.write(f" E  AROW{i}\n")
        f.write("COLUMNS\n")
        for j in range(n):
            if cvec[j] != 0.0:
                f.write(f"    X{j}  COST  {cvec[j]:.17g}\n")
            for i in range(G.shape[0]):
                if G[i, j] != 0.0:
                    f.write(f"    X{j}  {rownames[i]}  {G[i, j]:.17g}\n")
            for i in range(mA):
                if A[i, j] != 0.0:
                    f.write(f"    X{j}  AROW{i}  {A[i, j]:.17g}\n")
        f.write("RHS\n")
        for i in range(G.shape[0]):
            if h[i] != 0.0:
                f.write(f"    RHS  {rownames[i]}  {h[i]:.17g}\n")
        for i in range(mA):
            if b[i] != 0.0:
                f.write(f"    RHS  AROW{i}  {b[i]:.17g}\n")
        f.write("BOUNDS\n")
        for j in range(n):
            f.write(f" FR BND  X{j}\n")
        f.write("ENDATA\n")
    finally:
        if close:
            f.close()
