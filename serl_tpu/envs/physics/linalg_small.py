"""Unrolled fixed-size linear algebra for the physics hot loop.

`jnp.linalg.solve` / `jax.scipy.linalg.cho_factor` / `inv` / `det` on tiny
(3x3..7x7) matrices lower to column-by-column loops (internal `lax.scan` +
dynamic slicing) that XLA cannot fuse; on TPU every one of those inner loop
iterations pays a fixed dispatch cost that ends up dominating the physics
substep (the reference instead calls LAPACK inside MuJoCo's C core, where tiny
solves are cheap — on TPU the idiomatic equivalent is full unrolling).

These routines unroll the factorizations at trace time for a static n read
off the shape, producing pure elementwise arithmetic on the batched leading
axes — the whole solve fuses into the surrounding substep kernel.

All functions take (..., n, n) / (..., n) operands and are vmap-transparent.
SPD factorizations clamp the pivot so near-singular inputs degrade gracefully
instead of producing NaNs (callers handle damping explicitly, mirroring the
reference's det-threshold pinv fallback in franka_sim opspace.py:156-161).
"""

import jax.numpy as jnp

_PIVOT_EPS = 1e-12


def _unpack(M):
    n = M.shape[-1]
    return n, [[M[..., i, j] for j in range(n)] for i in range(n)]


def chol_unrolled(M):
    """Lower-triangular Cholesky factor of an SPD matrix as an n x n list of
    batched scalars (entries above the diagonal are None)."""
    n, m = _unpack(M)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = m[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, _PIVOT_EPS))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_solve_cols(L, cols):
    """Solve L L^T x = b for each column b in `cols` (list of length-n lists
    of batched scalars). Returns solved columns in the same layout."""
    n = len(L)
    out = []
    for b in cols:
        y = [None] * n
        for i in range(n):
            s = b[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        out.append(x)
    return out


def solve_spd(M, b):
    """x = M^-1 b for SPD M: (..., n, n), (..., n) -> (..., n)."""
    n = M.shape[-1]
    L = chol_unrolled(M)
    (x,) = _chol_solve_cols(L, [[b[..., i] for i in range(n)]])
    return jnp.stack(x, axis=-1)


def solve_spd_mat(M, B):
    """X = M^-1 B for SPD M: (..., n, n), (..., n, k) -> (..., n, k)."""
    n, k = B.shape[-2], B.shape[-1]
    L = chol_unrolled(M)
    cols = _chol_solve_cols(
        L, [[B[..., i, c] for i in range(n)] for c in range(k)]
    )
    rows = [[cols[c][i] for c in range(k)] for i in range(n)]
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


def inv_spd(M):
    """M^-1 for SPD M via the unrolled Cholesky factor."""
    n = M.shape[-1]
    L = chol_unrolled(M)
    zero = jnp.zeros_like(L[0][0])
    one = jnp.ones_like(L[0][0])
    eye_cols = [
        [one if i == c else zero for i in range(n)] for c in range(n)
    ]
    cols = _chol_solve_cols(L, eye_cols)
    return jnp.stack(
        [jnp.stack([cols[c][i] for c in range(n)], axis=-1) for i in range(n)],
        axis=-2,
    )


def det_spd(M):
    """det(M) for (near-)SPD M = prod diag(L)^2; saturates to ~0 (instead of
    going negative) for singular inputs, which is what the det-threshold
    damping test needs."""
    L = chol_unrolled(M)
    d = L[0][0] * L[0][0]
    for i in range(1, len(L)):
        d = d * (L[i][i] * L[i][i])
    return d


def solve3(A, b):
    """General 3x3 solve via the adjugate (12 mults + cross products)."""
    r0, r1, r2 = A[..., 0, :], A[..., 1, :], A[..., 2, :]
    c0 = jnp.cross(r1, r2)
    det = jnp.sum(r0 * c0, axis=-1, keepdims=True)
    c1 = jnp.cross(r2, r0)
    c2 = jnp.cross(r0, r1)
    # A^-1 has COLUMNS c0, c1, c2 (scaled by 1/det): r_i . c_j = det * d_ij
    return (
        c0 * b[..., 0:1] + c1 * b[..., 1:2] + c2 * b[..., 2:3]
    ) / det
