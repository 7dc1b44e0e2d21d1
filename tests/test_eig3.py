"""Branch-free analytic symmetric 3x3 eigensolver (ops/eig3.py), the
TPU-native replacement for the reference's dsyevh3 (3x3-C/)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynearthsol_tpu.ops.eig3 import eigh3_c, eigvals3_c


def _cases():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5000, 3, 3)) * 10 ** rng.uniform(
        -3, 8, size=(5000, 1, 1))
    A = (A + A.transpose(0, 2, 1)) / 2
    A[0] = np.eye(3) * 5.0
    A[1] = np.diag([2.0, 2.0, 7.0])
    A[2] = np.zeros((3, 3))
    A[3] = np.diag([1e8, 1e8, 1e8])
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    A[4] = R @ np.diag([3.0, 3.0, -1.0]) @ R.T
    A[5] = R @ np.diag([1.0, 1.0 + 1e-9, 2.0]) @ R.T
    return A


def test_eigh3_matches_numpy():
    A = _cases()
    comps = tuple(jnp.asarray(c) for c in
                  (A[:, 0, 0], A[:, 1, 1], A[:, 2, 2],
                   A[:, 0, 1], A[:, 0, 2], A[:, 1, 2]))
    (l0, l1, l2), (v0, v1, v2) = jax.jit(eigh3_c)(*comps)
    lam = np.stack([np.asarray(l0), np.asarray(l1), np.asarray(l2)], 1)
    ref = np.linalg.eigvalsh(A)
    scale = np.abs(ref).max(axis=1) + 1e-12
    assert (np.abs(lam - ref).max(axis=1) / scale).max() < 1e-7
    assert (np.diff(lam, axis=1) >= -1e-9 * scale[:, None]).all()

    V = np.stack([np.stack([np.asarray(c) for c in v], 1)
                  for v in (v0, v1, v2)], 1)  # (N, k, comp)
    for k in range(3):
        Av = np.einsum("nij,nj->ni", A, V[:, k])
        res = np.abs(Av - lam[:, k, None] * V[:, k]).max(axis=1) / scale
        assert res.max() < 1e-7, k
    G = np.einsum("nki,nli->nkl", V, V)
    assert np.abs(G - np.eye(3)).max() < 1e-12


def test_eigvals_only():
    A = _cases()
    l0, l1, l2 = eigvals3_c(
        *(jnp.asarray(c) for c in (A[:, 0, 0], A[:, 1, 1], A[:, 2, 2],
                                   A[:, 0, 1], A[:, 0, 2], A[:, 1, 2])))
    lam = np.stack([np.asarray(l0), np.asarray(l1), np.asarray(l2)], 1)
    ref = np.linalg.eigvalsh(A)
    scale = np.abs(ref).max(axis=1) + 1e-12
    assert (np.abs(lam - ref).max(axis=1) / scale).max() < 1e-7
