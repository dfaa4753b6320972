"""PDB coordinate file reader/writer.

Reference: src/gromacs/fileio/pdbio.cpp — ATOM/HETATM fixed columns,
coordinates in Angstrom (GROMACS stores nm: /10 on read, *10 on write),
CRYST1 cell (a b c alpha beta gamma) converted to/from the GROMACS
lower-triangular box matrix (matrix_convert semantics), MODEL/ENDMDL
frames, TER records ignored on read.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

_A2NM = 0.1


def box_from_cryst1(a: float, b: float, c: float, alpha: float,
                    beta: float, gamma: float) -> np.ndarray:
    """CRYST1 lengths (nm) + angles (deg) -> lower-triangular box matrix
    (reference: pdbio.cpp matrix_convert)."""
    if a * b * c == 0.0:
        return np.zeros((3, 3))
    ca, cb, cg = (math.cos(math.radians(v)) for v in (alpha, beta, gamma))
    sg = math.sin(math.radians(gamma))
    box = np.zeros((3, 3))
    box[0, 0] = a
    box[1, 0] = b * cg
    box[1, 1] = b * sg
    box[2, 0] = c * cb
    box[2, 1] = c * (ca - cb * cg) / sg
    box[2, 2] = math.sqrt(max(c * c - box[2, 0] ** 2 - box[2, 1] ** 2, 0.0))
    # squash numerical dust so rectangular cells stay exactly diagonal
    box[np.abs(box) < 1e-9] = 0.0
    return box


def cryst1_from_box(box: np.ndarray) -> Tuple[float, ...]:
    """Box matrix (nm, rows = a/b/c vectors) -> (a, b, c, alpha, beta,
    gamma) with lengths in nm, angles in degrees."""
    b = np.asarray(box, np.float64)
    la, lb, lc = (np.linalg.norm(b[i]) for i in range(3))
    if la * lb * lc == 0.0:
        return 1.0, 1.0, 1.0, 90.0, 90.0, 90.0

    def ang(u, v):
        return math.degrees(math.acos(
            np.clip(np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v)),
                    -1.0, 1.0)))
    return la, lb, lc, ang(b[1], b[2]), ang(b[0], b[2]), ang(b[0], b[1])


def parse_pdb(text: str, model: int = 0):
    """Returns (names, resnames, x (N,3) nm, v=None, box (3,3) nm) for
    the model-th MODEL (or the whole file when no MODEL records).
    Velocities don't exist in PDB; the tuple matches read_gro's."""
    names: List[str] = []
    resnames: List[str] = []
    xs: List[List[float]] = []
    box = np.zeros((3, 3))
    cur_model = 0
    seen_model = False
    for line in text.splitlines():
        rec = line[:6]
        if rec == "CRYST1":
            a, b, c = (float(line[6:15]), float(line[15:24]),
                       float(line[24:33]))
            al, be, ga = (float(line[33:40]), float(line[40:47]),
                          float(line[47:54]))
            box = box_from_cryst1(a * _A2NM, b * _A2NM, c * _A2NM,
                                  al, be, ga)
        elif rec == "MODEL ":
            if seen_model:
                cur_model += 1
            seen_model = True
        elif rec in ("ATOM  ", "HETATM") and cur_model == model:
            names.append(line[12:16].strip())
            resnames.append(line[17:21].strip())
            xs.append([float(line[30:38]) * _A2NM,
                       float(line[38:46]) * _A2NM,
                       float(line[46:54]) * _A2NM])
        elif rec == "ENDMDL" and cur_model == model and xs:
            break
    if not xs:
        raise ValueError(f"no ATOM records (model {model})")
    return names, resnames, np.asarray(xs, np.float64), None, box


def read_pdb(path: str, model: int = 0):
    with open(path) as f:
        return parse_pdb(f.read(), model)


def parse_pdb_atoms(text: str, model: int = 0):
    """Like parse_pdb but also returns residue sequence numbers:
    (names, resnames, resids, x, box) — the pdb2gmx input view."""
    names, resnames, x, _, box = parse_pdb(text, model)
    resids = []
    cur_model = 0
    seen_model = False
    for line in text.splitlines():
        rec = line[:6]
        if rec == "MODEL ":
            if seen_model:
                cur_model += 1
            seen_model = True
        elif rec in ("ATOM  ", "HETATM") and cur_model == model:
            resids.append(int(line[22:26]))
        elif rec == "ENDMDL" and cur_model == model and resids:
            break
    return names, resnames, resids, x, box


def read_pdb_frames(path: str):
    """All MODELs of a multi-model PDB as a list of coordinate arrays
    (nm) plus the shared (names, resnames, box)."""
    with open(path) as f:
        text = f.read()
    n_models = max(text.count("ENDMDL"), 1)
    names = resnames = box = None
    frames = []
    for m in range(n_models):
        names, resnames, x, _, box = parse_pdb(text, m)
        frames.append(x)
    return names, resnames, frames, box


def write_pdb(path: str, title: str, names: List[str],
              resnames: List[str], x: np.ndarray,
              box: Optional[np.ndarray] = None,
              resids: Optional[List[int]] = None,
              bfactors: Optional[np.ndarray] = None,
              append_model: Optional[int] = None):
    """Write one structure (or, with append_model=k, append MODEL k to
    an open trajectory-style PDB).  Coordinates in nm -> Angstrom."""
    mode = "a" if append_model is not None and append_model > 1 else "w"
    x = np.asarray(x, np.float64)
    with open(path, mode) as f:
        if mode == "w":
            f.write(f"TITLE     {title}\n")
            if box is not None and np.asarray(box).any():
                a, b, c, al, be, ga = cryst1_from_box(box)
                f.write(f"CRYST1{a / _A2NM:9.3f}{b / _A2NM:9.3f}"
                        f"{c / _A2NM:9.3f}{al:7.2f}{be:7.2f}{ga:7.2f} "
                        f"P 1           1\n")
        if append_model is not None:
            f.write(f"MODEL     {append_model:4d}\n")
        for i in range(len(names)):
            nm = names[i]
            # column quirk (pdbio.cpp): names <4 chars are indented one
            # unless they start with a digit (e.g. 1HH1)
            field = nm if (len(nm) >= 4 or (nm and nm[0].isdigit())) \
                else " " + nm
            rid = (resids[i] if resids is not None else i + 1) % 10000
            bf = float(bfactors[i]) if bfactors is not None else 0.0
            # exact standard columns: name 13-16, altLoc 17, resName
            # 18-21 (GROMACS allows 4 chars), chainID 22, resSeq 23-26,
            # iCode 27, x at 31 (pdbio.cpp gmx_fprintf_pdb_atomline)
            f.write(f"ATOM  {(i + 1) % 100000:5d} {field:<4.4s} "
                    f"{resnames[i]:<4.4s} {rid:4d}    "
                    f"{x[i, 0] / _A2NM:8.3f}{x[i, 1] / _A2NM:8.3f}"
                    f"{x[i, 2] / _A2NM:8.3f}{1.0:6.2f}{bf:6.2f}\n")
        if append_model is not None:
            f.write("ENDMDL\n")
        else:
            f.write("TER\nENDMDL\n")


def read_structure(path: str):
    """Extension-dispatched coordinate reader: .gro, .pdb or .g96,
    returning the read_gro tuple (names, resnames, x, v-or-None, box)."""
    low = path.lower()
    if low.endswith(".pdb"):
        return read_pdb(path)
    if low.endswith(".g96"):
        from .g96io import read_g96
        return read_g96(path)
    from .groio import read_gro
    return read_gro(path)
