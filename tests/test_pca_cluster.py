"""covar/anaeig PCA + gromos clustering tests
(reference: gmxana/gmx_covar.cpp, gmx_cluster.cpp)."""
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.analysis.pca import (covar, gromos_cluster,
                                              project, rmsd_matrix)


def _cube_plus_oscillator(amp=0.2, n_frames=40):
    """8 rigid cube corners + 1 atom oscillating along z with known
    amplitude; the only PCA mode is that oscillation."""
    g = np.array([[i, j, k] for i in (0, 1) for j in (0, 1)
                  for k in (0, 1)], float)
    xref = np.concatenate([g, [[0.5, 0.5, 0.5]]])
    frames = []
    for t in range(n_frames):
        f = xref.copy()
        f[8, 2] += amp * np.cos(2 * np.pi * t / n_frames)
        frames.append(f)
    return frames, xref


def test_covar_single_mode():
    frames, xref = _cube_plus_oscillator(amp=0.2)
    vals, vecs, mean = covar(frames, xref)
    # one dominant mode; <cos^2> = 1/2.  COM removal spreads the
    # displacement (8/9 on atom 8, -1/9 on the others), total variance
    # factor 64/81 + 8/81 = 8/9
    expect = 0.5 * 0.2 ** 2 * 8 / 9
    np.testing.assert_allclose(vals[0], expect, rtol=0.1)
    assert vals[1] < 0.02 * vals[0]
    # the dominant eigenvector is the z displacement of atom 8
    v0 = vecs[:, 0].reshape(-1, 3)
    assert abs(v0[8, 2]) > 0.9
    # projections trace the cosine
    p = project(frames, xref, vecs, mean, n_proj=1)
    c = np.cos(2 * np.pi * np.arange(len(frames)) / len(frames))
    corr = np.corrcoef(p[:, 0], c)[0, 1]
    assert abs(corr) > 0.999


def test_covar_trace_equals_msf():
    """Trace of the covariance = total mean-square fluctuation."""
    rng = np.random.RandomState(0)
    xref = rng.rand(6, 3)
    frames = [xref + 0.01 * rng.randn(6, 3) for _ in range(50)]
    vals, _, _ = covar(frames, xref)
    from gromacs_fep_gpu_tpu.analysis.traj import fitted_stack
    stack = fitted_stack(frames, xref)
    msf = ((stack - stack.mean(0)) ** 2).sum(-1).mean(0).sum()
    np.testing.assert_allclose(vals.sum(), msf, rtol=1e-8)


def test_rmsd_matrix_and_gromos_cluster():
    # two well-separated conformations, a few frames of each
    a = np.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    b = a.copy()
    b[3] = [0.5, 0.5, 1.5]                    # distinct shape
    rng = np.random.RandomState(1)
    frames = []
    truth = []
    for k in range(10):
        base = a if k % 2 == 0 else b
        frames.append(base + 0.005 * rng.randn(4, 3))
        truth.append(k % 2)
    m = rmsd_matrix(frames)
    assert np.allclose(m, m.T) and np.allclose(np.diag(m), 0.0)
    # in-class RMSD tiny, between-class large
    labels, centers = gromos_cluster(m, cutoff=0.05)
    assert labels.max() == 1
    truth = np.asarray(truth)
    same = (labels == labels[0])
    assert (same == (truth == truth[0])).all()
    assert len(centers) == 2


def test_cluster_cli(tmp_path, monkeypatch, capsys):
    from gromacs_fep_gpu_tpu.cli import main
    from gromacs_fep_gpu_tpu.io.trrio import write_trr_frame
    from gromacs_fep_gpu_tpu.io.xvgio import read_xvg

    monkeypatch.chdir(tmp_path)
    box = np.diag([3.0, 3.0, 3.0]).astype(np.float32)
    a = np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.5, 1.5, 0.5]],
                 np.float32)
    b = a.copy()
    b[2] = [1.2, 1.2, 1.2]
    for k in range(6):
        write_trr_frame("t.trr", a if k < 3 else b, box, step=k,
                        time=0.002 * k)
    main(["cluster", "-f", "t.trr", "-cutoff", "0.05", "-o", "cl.xvg"])
    out = capsys.readouterr().out
    assert "2 clusters" in out
    cl, _ = read_xvg("cl.xvg")
    assert set(cl[:, 1]) == {0.0, 1.0}


def test_rotacf_analytic():
    """A vector rotating uniformly in a plane: C1(t) = cos(w t),
    C2(t) = P2(cos w t) (reference: gmx rotacf)."""
    from gromacs_fep_gpu_tpu.analysis.traj import rotacf
    w = 2 * np.pi / 40
    frames = []
    for t in range(200):
        a = w * t
        frames.append(np.array([[0.0, 0.0, 0.0],
                                [np.cos(a), np.sin(a), 0.0]]))
    pairs = np.array([[0, 1]])
    c1 = rotacf(frames, pairs, order=1, nlags=60)
    lags = np.arange(60)
    np.testing.assert_allclose(c1, np.cos(w * lags), atol=1e-10)
    c2 = rotacf(frames, pairs, order=2, nlags=60)
    cc = np.cos(w * lags)
    np.testing.assert_allclose(c2, (3 * cc * cc - 1) / 2, atol=1e-10)


def test_traj_rotacf_cli(tmp_path, monkeypatch):
    from gromacs_fep_gpu_tpu.cli import main
    from gromacs_fep_gpu_tpu.io.trrio import write_trr_frame
    from gromacs_fep_gpu_tpu.io.xvgio import read_xvg

    monkeypatch.chdir(tmp_path)
    box = np.diag([3.0, 3.0, 3.0]).astype(np.float32)
    for k in range(8):
        a = 2 * np.pi * k / 8
        x = np.array([[1.0, 1.0, 1.0],
                      [1.0 + 0.2 * np.cos(a), 1.0 + 0.2 * np.sin(a),
                       1.0]], np.float32)
        write_trr_frame("t.trr", x, box, step=k, time=0.002 * k)
    main(["traj", "-f", "t.trr", "-sel", "2", "-o", "x.xvg"])
    d, legends = read_xvg("x.xvg")
    assert d.shape == (8, 4) and "X atom 2" in legends
    np.testing.assert_allclose(d[0, 1], 1.2, atol=1e-4)
    main(["rotacf", "-f", "t.trr", "-sel", "1 2", "-P", "1",
          "-o", "r.xvg"])
    r, _ = read_xvg("r.xvg")
    np.testing.assert_allclose(r[1, 1], np.cos(2 * np.pi / 8), atol=1e-4)
