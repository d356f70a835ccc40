"""Complex band algebra on realified vectors, using only REAL device ops.

The split engine stores a complex Bloch band psi = x + i y as one real
vector u = (x; y) of length 2 nG.  Round 1 ran the eigensolver on 2 nb such
vectors per nb physical bands (the doubled-real spectrum pairing), paying
TWO complex H-applies per band.  This module supplies the complex-structured
subspace algebra - Gram matrices, CholQR, Rayleigh-Ritz - on nb realified
vectors directly, so the eigensolver needs exactly ONE apply per band:

  * complex Gram <u_a | u_b> as a split pair (Gr, Gi), from half-einsums;
  * complex Cholesky / triangular solves through the INTERLEAVED real
    embedding  a+ib -> [[a, -b], [b, a]]  (the embedding of a complex
    lower-triangular matrix with real diagonal is real lower-triangular,
    so real cholesky(E(G)) == E(chol(G)) exactly);
  * complex Hermitian eigendecomposition through the STACKED embedding
    M = [[Hr, -Hi], [Hi, Hr]]: eigenvalues come in exact J-degenerate
    pairs whose 2D real eigenspaces are the embeddings {z, iz} of ONE
    complex eigenvector; a deterministic tiny diagonal perturbation
    separates distinct complex eigenvalues past the eigh noise floor so
    that taking every second column recovers one complex eigenvector per
    pair even inside (physically common) degenerate band clusters.

All functions take/return REAL arrays only - this is the complex linear
algebra layer for TPU backends without complex dtype support.
"""
import jax
import jax.numpy as jnp


def halves(U):
    nG = U.shape[-1] // 2
    return U[..., :nG], U[..., nG:]


def join(xr, xi):
    return jnp.concatenate([xr, xi], axis=-1)


def apply_J(U):
    """u -> realification of i*psi: (x; y) -> (-y; x)."""
    x, y = halves(U)
    return jnp.concatenate([-y, x], axis=-1)


def cgram(A, B):
    """Complex Gram <A_a|B_b> over G: ([nk,na,2nG],[nk,nb,2nG]) -> (Gr, Gi)."""
    ar, ai = halves(A)
    br, bi = halves(B)
    Gr = jnp.einsum("kag,kbg->kab", ar, br) + jnp.einsum("kag,kbg->kab", ai, bi)
    Gi = jnp.einsum("kag,kbg->kab", ar, bi) - jnp.einsum("kag,kbg->kab", ai, br)
    return Gr, Gi


def crotate(Cr, Ci, S):
    """X_j = sum_a C[a,j] S_a with complex C: [nk,ns,nj] x [nk,ns,2nG]."""
    sr, si = halves(S)
    xr = jnp.einsum("kaj,kag->kjg", Cr, sr) - jnp.einsum("kaj,kag->kjg", Ci, si)
    xi = jnp.einsum("kaj,kag->kjg", Cr, si) + jnp.einsum("kaj,kag->kjg", Ci, sr)
    return join(xr, xi)


def cmatsmall(Ar, Ai, Br, Bi, conj_a=False):
    """Small complex matmul A @ B on [nk, m, n] split pairs (host-size)."""
    if conj_a:
        Ai = -Ai
    Cr = Ar @ Br - Ai @ Bi
    Ci = Ar @ Bi + Ai @ Br
    return Cr, Ci


def interleave_mat(Gr, Gi):
    """[nk,n,n] split -> [nk,2n,2n] real with 2x2 blocks [[r,-i],[i,r]]."""
    nk, n, _ = Gr.shape
    M4 = jnp.stack([jnp.stack([Gr, -Gi], axis=-1),
                    jnp.stack([Gi, Gr], axis=-1)], axis=-2)  # [nk,a,b,c,d]
    return M4.transpose(0, 1, 3, 2, 4).reshape(nk, 2 * n, 2 * n)


def stacked_mat(Gr, Gi):
    """[nk,n,n] split -> [[Gr,-Gi],[Gi,Gr]] [nk,2n,2n]."""
    top = jnp.concatenate([Gr, -Gi], axis=-1)
    bot = jnp.concatenate([Gi, Gr], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _flip_imag(U):
    """Realified conjugation: (x; y) -> (x; -y)."""
    x, y = halves(U)
    return jnp.concatenate([x, -y], axis=-1)


def ctriangular_solve_bands(L_emb, U):
    """Apply conj(L)^{-1} (complex lower-tri L, via its interleaved real
    embedding L_emb [nk, 2nb, 2nb]) to the band axis of U [nk, nb, 2nG]."""
    nk, nb, twoG = U.shape
    nG = twoG // 2
    # conj(A) z == conj(A conj(z)): flip imag halves around the real solve
    V = _flip_imag(U).reshape(nk, nb, 2, nG).reshape(nk, 2 * nb, nG)
    V = jax.lax.linalg.triangular_solve(L_emb, V, left_side=True, lower=True)
    V = V.reshape(nk, nb, 2, nG).reshape(nk, nb, 2 * nG)
    return _flip_imag(V)


def ortho_qr_csplit(U, passes=2):
    """Complex CholeskyQR2 on realified bands (rows of U)."""
    meps = float(jnp.finfo(U.dtype).eps)
    nb = U.shape[1]
    for _ in range(passes):
        Gr, Gi = cgram(U, U)
        eps = 10 * meps * jnp.trace(Gr, axis1=-2, axis2=-1)[:, None, None]
        M = interleave_mat(Gr, Gi)
        M = M + eps * jnp.eye(2 * nb, dtype=M.dtype)
        L = jnp.linalg.cholesky(M)
        Un = ctriangular_solve_bands(L, U)
        bad = jnp.any(jnp.isnan(Un))
        U = jnp.where(bad, _ortho_canonical_csplit(jnp.where(
            jnp.isnan(U), 0.0, U)), Un)
    return U


def ceigh_pairs(Hr, Hi, perturb=0.0, perturb_diag=False):
    """eigh of a complex Hermitian [nk,n,n] split pair via the stacked
    embedding.  Returns (w [nk,n] ascending, (Pr, Pi) [nk,n,n] complex
    eigenvectors).  perturb > 0 adds a deterministic diagonal ramp to split
    J-pair clusters (use when complex degeneracies are expected and only
    the spanned subspace matters).  perturb_diag=True scales the ramp by
    each diagonal entry instead of the global magnitude - REQUIRED when the
    caller rank-filters the eigenvalues afterwards (Gram matrices): exact
    zero rows then stay exactly at zero instead of being inflated past the
    filter threshold."""
    nk, n, _ = Hr.shape
    if perturb:
        # split J-pair clusters: the per-pair gaps must sit well ABOVE the
        # eigh cluster-resolution noise (~n*eps*|H|) or every-other column
        # selection can hit the same complex ray twice (rank collapse).
        # Cross-gap Ritz rotation of order perturb/gap is harmless - the
        # spanned subspace is what matters and callers recompute exact
        # Rayleigh quotients afterwards.
        ramp = jnp.arange(1, n + 1, dtype=Hr.dtype) / n
        if perturb_diag:
            base = jnp.abs(jnp.diagonal(Hr, axis1=-2, axis2=-1))  # [nk, n]
        else:
            base = jnp.max(jnp.abs(Hr), axis=(-2, -1))[:, None] + 1e-30
        Hr = Hr + jax.vmap(jnp.diag)(perturb * ramp[None, :] * base)
    M = stacked_mat((Hr + Hr.transpose(0, 2, 1)) / 2,
                    (Hi - Hi.transpose(0, 2, 1)) / 2)
    w, W = jnp.linalg.eigh(M)
    cols = jnp.arange(n) * 2
    return w[:, cols], (W[:, :n, cols], W[:, n:, cols])


def ceigh_gram(Or, Oi, perturb):
    """Pair-split eigh of a Hermitian PSD Gram: eigenvalues are returned as
    EXACT Rayleigh quotients of the selected complex eigenvectors against
    the UNPERTURBED matrix.  The pair-splitting ramp shifts eigenvalues by
    ~perturb, which must never leak into the caller's rank filter (a true
    zero mode inflated past the threshold gets scale 1/sqrt(~0) and
    amplifies noise catastrophically)."""
    _, (Pr, Pi) = ceigh_pairs(Or, Oi, perturb=perturb, perturb_diag=True)
    OPr, OPi = cmatsmall(Or, Oi, Pr, Pi)
    s_true = jnp.einsum("knj,knj->kj", Pr, OPr) \
        + jnp.einsum("knj,knj->kj", Pi, OPi)
    return s_true, (Pr, Pi)


def rr_whiten_csplit(Or, Oi, Hr, Hi, pert, ridge_factor=10.0):
    """Rayleigh-Ritz via embedded-Cholesky whitening (deflation-free).

    Solves the complex pencil (Hred, O) on realified data: whiten with
    C = L^{-H} from the ridge-regularized interleaved embedding of O
    (exact complex Cholesky, NO eigh pair-selection on the possibly
    rank-deficient Gram), push null directions up continuously with
    shift * ridge * (O + ridge)^{-1} (for a good direction this term is
    O(ridge/s), for a null one it is ~shift), and run the pair-split eigh
    only on the resulting WELL-CONDITIONED reduced matrix.

    Returns (theta [nk, n], (Cr, Ci) [nk, n, n] complex coefficients
    combining the original S rows into Ritz vectors)."""
    nk, n, _ = Or.shape
    meps = float(jnp.finfo(Or.dtype).eps)
    Or = (Or + Or.transpose(0, 2, 1)) / 2
    Oi = (Oi - Oi.transpose(0, 2, 1)) / 2
    Hr = (Hr + Hr.transpose(0, 2, 1)) / 2
    Hi = (Hi - Hi.transpose(0, 2, 1)) / 2
    ridge = ridge_factor * meps * jnp.trace(Or, axis1=-2, axis2=-1)[
        :, None, None]
    M = interleave_mat(Or, Oi) + ridge * jnp.eye(2 * n, dtype=Or.dtype)
    L = jnp.linalg.cholesky(M)
    Hemb = interleave_mat(Hr, Hi)
    T = jax.lax.linalg.triangular_solve(L, Hemb, left_side=True, lower=True)
    Ht = jax.lax.linalg.triangular_solve(L, T.transpose(0, 2, 1),
                                         left_side=True, lower=True)
    A = jax.lax.linalg.triangular_solve(
        L, jnp.broadcast_to(jnp.eye(2 * n, dtype=Or.dtype),
                            (nk, 2 * n, 2 * n)),
        left_side=True, lower=True)
    K = A @ A.transpose(0, 2, 1)                 # (O + ridge)^{-1} embedded
    dmax = jnp.max(jnp.abs(jnp.diagonal(Ht, axis1=-2, axis2=-1)),
                   axis=-1)[:, None, None]
    Ht = Ht + (2 * dmax + 10.0) * ridge * K
    Ht = (Ht + Ht.transpose(0, 2, 1)) / 2
    Htr = Ht[:, 0::2, 0::2]
    Hti = Ht[:, 1::2, 0::2]
    theta, (Yr, Yi) = ceigh_pairs(Htr, Hti, perturb=pert)
    # coefficients C = L_c^{-H} Y: interleave Y, one real triangular solve
    Yint = jnp.stack([Yr, Yi], axis=2).reshape(nk, 2 * n, n)
    Z = jax.lax.linalg.triangular_solve(L, Yint, left_side=True, lower=True,
                                        transpose_a=True)
    return theta, (Z[:, 0::2, :], Z[:, 1::2, :])


def _ortho_canonical_csplit(U, rtol=1e-10):
    Gr, Gi = cgram(U, U)
    s, (Pr, Pi) = ceigh_gram(Gr, Gi, 1e4 * float(jnp.finfo(U.dtype).eps))
    smax = jnp.max(s, axis=-1, keepdims=True)
    good = s > rtol * jnp.maximum(smax, 1e-300)
    scale = jnp.where(good, 1.0 / jnp.sqrt(jnp.where(good, s, 1.0)), 0.0)
    Cr = Pr * scale[:, None, :]
    Ci = Pi * scale[:, None, :]
    # rows of U combined with conj(C)^T: X'_j = sum_a conj(C[a,j]) U_a
    return crotate(Cr, -Ci, U)
