"""Lattice / unit-cell geometry helpers (host-side numpy, also jnp-safe).

Conventions follow the reference plane-wave DFT code (DFTK
`src/structure.jl:1-61`, `src/Model.jl:395-437`):
  * `lattice` holds the real-space lattice vectors as *columns* (3x3, bohr).
  * the reciprocal lattice B satisfies B = 2*pi*inv(lattice'); G_cart = B @ G_red.
  * reduced <-> Cartesian transforms for vectors and covectors.

All functions work with either numpy or jax.numpy inputs (they only use
generic array ops), so the same code serves host setup and differentiable
(strain / stress) paths.
"""
import numpy as np


def compute_inverse_lattice(lattice):
    return np.linalg.inv(lattice) if isinstance(lattice, np.ndarray) else _inv(lattice)


def _inv(lattice):
    import jax.numpy as jnp
    return jnp.linalg.inv(lattice)


def lattice_n_dim(lattice):
    """Number of non-zero lattice vectors (columns); 2 for slabs-in-vacuum
    style 2D systems declared with a zero third vector (reference
    Model.jl:173)."""
    M = np.asarray(lattice, dtype=float)
    return int(sum(1 for c in range(3) if np.any(M[:, c] != 0)))


def block_inverse(lattice):
    """Matrix inverse honoring reduced dimensions: for a lattice with
    trailing zero columns, invert the leading n_dim x n_dim block and keep
    the rest zero (reference structure.jl:4-16; pinv without the SVD)."""
    M = np.asarray(lattice, dtype=float)
    nd = lattice_n_dim(M)
    if nd == 3:
        return np.linalg.inv(M)
    out = np.zeros((3, 3))
    out[:nd, :nd] = np.linalg.inv(M[:nd, :nd])
    return out


def compute_recip_lattice(lattice):
    """B with reciprocal lattice vectors as columns: B^T A = 2 pi I
    (restricted to the periodic dimensions for 1D/2D systems)."""
    if isinstance(lattice, np.ndarray):
        return 2 * np.pi * block_inverse(lattice).T
    import jax.numpy as jnp
    return 2 * jnp.pi * jnp.linalg.inv(lattice.T)


def compute_unit_cell_volume(lattice):
    """abs(det) over the periodic dimensions (length/area for 1D/2D,
    reference structure.jl:31-34)."""
    if isinstance(lattice, np.ndarray):
        M = np.asarray(lattice, dtype=float)
        nd = lattice_n_dim(M)
        return abs(np.linalg.det(M[:nd, :nd]))
    import jax.numpy as jnp
    return jnp.abs(jnp.linalg.det(lattice))


def diameter(lattice):
    """Diameter of the unit cell (longest vertex-to-vertex distance)."""
    diam = 0.0
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            for k in (-1, 0, 1):
                diam = max(diam, float(np.linalg.norm(lattice @ np.array([i, j, k]))))
    return diam


def estimate_integer_lattice_bounds(M, delta, shift=None):
    """Integer bounds (per axis) such that ||M x|| <= delta implies
    |x_i| <= bound_i.  Uses x_i = <M^-T e_i, M x> <= ||M^-T e_i|| * delta.
    Mirrors DFTK `src/structure.jl` estimate_integer_lattice_bounds.
    """
    M = np.asarray(M, dtype=float)
    inv_lattice_t = block_inverse(M).T      # handles reduced-dim lattices
    xlims = np.linalg.norm(inv_lattice_t, axis=0) * float(delta)
    if shift is not None:
        xlims = xlims + np.asarray(shift, dtype=float)
    tol = np.sqrt(np.finfo(float).eps)
    return [0 if x == 0 else int(np.ceil(x - tol)) for x in xlims]


# ---------------------------------------------------------------------------
# Reduced <-> Cartesian transforms (DFTK Model.jl:395-437 semantics)
# ---------------------------------------------------------------------------

def vector_red_to_cart(lattice, r_red):
    return lattice @ r_red


def vector_cart_to_red(lattice, r_cart):
    return compute_inverse_lattice(lattice) @ r_cart


def covector_red_to_cart(lattice, f_red):
    # covectors transform with inv(lattice)^T
    return compute_inverse_lattice(lattice).T @ f_red


def covector_cart_to_red(lattice, f_cart):
    return lattice.T @ f_cart


def recip_vector_red_to_cart(lattice, G_red):
    return compute_recip_lattice(lattice) @ G_red
