"""GROMOS-96 coordinate file (.g96) reader/writer.

Reference: src/gromacs/fileio/g96io.cpp — block-structured text:
TITLE / POSITION (or POSITIONRED) / VELOCITY (or VELOCITYRED) / BOX,
each terminated by END.  POSITION rows are
"%5d %-5s %-5s%7d%15.9f%15.9f%15.9f" (resnr resname name atomnr x y z);
the RED variants carry bare coordinate triples.  BOX holds 3 (diagonal)
or 9 (full triclinic, GROMOS order) reals.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def parse_g96(text: str):
    """Returns (names, resnames, x, v or None, box) like read_gro."""
    names: List[str] = []
    resnames: List[str] = []
    xs: List[List[float]] = []
    vs: List[List[float]] = []
    box = np.zeros((3, 3))
    block = None
    for raw in text.splitlines():
        if raw.startswith("#"):
            continue
        s = raw.strip()
        if block is None:
            if s in ("TITLE", "POSITION", "POSITIONRED", "VELOCITY",
                     "VELOCITYRED", "BOX", "TIMESTEP"):
                block = s
            continue
        if s == "END":
            block = None
            continue
        if block in ("POSITION", "VELOCITY"):
            resnames_t = raw[5:11].strip()
            name_t = raw[11:17].strip()
            vals = [float(t) for t in raw[24:].split()[:3]]
            if block == "POSITION":
                resnames.append(resnames_t)
                names.append(name_t)
                xs.append(vals)
            else:
                vs.append(vals)
        elif block in ("POSITIONRED", "VELOCITYRED"):
            vals = [float(t) for t in s.split()[:3]]
            if block == "POSITIONRED":
                names.append("X")
                resnames.append("MOL")
                xs.append(vals)
            else:
                vs.append(vals)
        elif block == "BOX":
            b = [float(t) for t in s.split()]
            box[0, 0], box[1, 1], box[2, 2] = b[0], b[1], b[2]
            if len(b) >= 9:
                # GROMOS order: xx yy zz xy xz yx yz zx zy
                (box[0, 1], box[0, 2], box[1, 0],
                 box[1, 2], box[2, 0], box[2, 1]) = b[3:9]
    if not xs:
        raise ValueError("g96: no POSITION block")
    x = np.asarray(xs, np.float64)
    v = np.asarray(vs, np.float64) if len(vs) == len(xs) else None
    return names, resnames, x, v, box


def read_g96(path: str):
    with open(path) as f:
        return parse_g96(f.read())


def write_g96(path: str, title: str, names, resnames, x,
              v: Optional[np.ndarray], box,
              resids: Optional[List[int]] = None):
    x = np.asarray(x, np.float64)
    with open(path, "w") as f:
        f.write(f"TITLE\n{title}\nEND\n")
        f.write("POSITION\n")
        for i in range(len(names)):
            rid = (resids[i] if resids is not None else i + 1) % 100000
            f.write(f"{rid:5d} {resnames[i]:<5.5s} {names[i]:<5.5s}"
                    f"{(i + 1) % 10000000:7d}"
                    f"{x[i, 0]:15.9f}{x[i, 1]:15.9f}{x[i, 2]:15.9f}\n")
        f.write("END\n")
        if v is not None:
            v = np.asarray(v, np.float64)
            f.write("VELOCITY\n")
            for i in range(len(names)):
                rid = (resids[i] if resids is not None else i + 1) % 100000
                f.write(f"{rid:5d} {resnames[i]:<5.5s} {names[i]:<5.5s}"
                        f"{(i + 1) % 10000000:7d}"
                        f"{v[i, 0]:15.9f}{v[i, 1]:15.9f}"
                        f"{v[i, 2]:15.9f}\n")
            f.write("END\n")
        b = np.asarray(box, np.float64)
        f.write("BOX\n")
        vals = [b[0, 0], b[1, 1], b[2, 2]]
        if np.abs(b - np.diag(np.diag(b))).max() > 0:
            vals += [b[0, 1], b[0, 2], b[1, 0],
                     b[1, 2], b[2, 0], b[2, 1]]
        f.write(" " + " ".join(f"{val:14.9f}" for val in vals) + "\n")
        f.write("END\n")
