"""Energy time-series analysis — the `gmx energy` analogue
(reference: src/gromacs/gmxana/gmx_energy.cpp): statistics of the energy
terms written by mdrun (.ener.csv) with block-averaged error estimates."""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def read_ener_csv(path: str):
    """Returns (header list, (T, ncol) array)."""
    with open(path) as f:
        first = f.readline().strip()
    header = first.lstrip("# ").split()
    data = np.genfromtxt(path)
    if data.ndim == 1:
        data = data[None, :]
    return header, data


def block_average_error(x: np.ndarray, nblocks: int = 5) -> float:
    """Error estimate from block averages (reference: gmx energy -ee)."""
    n = len(x) // nblocks
    if n < 1:
        return float("nan")
    means = [x[i * n:(i + 1) * n].mean() for i in range(nblocks)]
    return float(np.std(means, ddof=1) / np.sqrt(nblocks))


def energy_statistics(path: str, terms: Sequence[str] = ("epot", "ekin",
                                                         "temp", "pres"),
                      skip_frac: float = 0.1) -> Dict[str, dict]:
    if path.endswith(".edr"):
        # GROMACS binary energy file (ours or a stock build's)
        from ..io.edrio import read_edr
        names, units, frames = read_edr(path)
        data = np.stack([fr.ener for fr in frames])
        header = list(names)
        terms = header          # report every stored term
    else:
        header, data = read_ener_csv(path)
    t0 = int(len(data) * skip_frac)
    out = {}
    for term in terms:
        if term not in header:
            continue
        col = data[t0:, header.index(term)]
        out[term] = {
            "average": float(col.mean()),
            "err_est": block_average_error(col),
            "rmsd": float(col.std()),
            "drift": float(np.polyfit(np.arange(len(col)), col, 1)[0]
                           * len(col)) if len(col) > 2 else 0.0,
        }
    return out


def print_statistics(stats: Dict[str, dict]):
    print(f"{'Energy':<12}{'Average':>14}{'Err.Est.':>12}{'RMSD':>12}"
          f"{'Tot-Drift':>12}")
    for term, s in stats.items():
        print(f"{term:<12}{s['average']:>14.4f}{s['err_est']:>12.4f}"
              f"{s['rmsd']:>12.4f}{s['drift']:>12.4f}")
