"""Micro-bench: whitening-factor variants for (80,15,15) SPD batches."""
import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from vins_rgbd_fast_tpu.ops import imu_preintegration as imupre

rng = np.random.default_rng(0)
B = 80
# realistic-ish: wildly varying scales per dim (bias walk vs pose)
scales = 10.0 ** rng.uniform(-6, 0, (B, 15))
A = rng.normal(0, 1, (B, 15, 15))
cov_np = np.einsum("bij,bkj->bik", A, A) + 15 * np.eye(15)
cov_np = scales[:, :, None] * cov_np * scales[:, None, :]
cov = jnp.asarray(cov_np.astype(np.float32))

REPS = 20


def timeit(name, fn, arg):
    out = fn(arg); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(REPS):
        out = fn(arg + (i * 1e-9))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    # check: W cov Wt == I
    W = np.asarray(out, np.float64)
    c = np.asarray(arg, np.float64)
    err = np.abs(np.einsum("bij,bjk,blk->bil", W, c, W) - np.eye(15)).max()
    print(f"{name:34s} {dt:8.2f} ms   max|WcovWt-I|={err:.2e}")


def v_chol_lax(c):
    L = jnp.linalg.cholesky(c)
    return jax.scipy.linalg.solve_triangular(
        L, jnp.broadcast_to(jnp.eye(15), c.shape), lower=True)


def v_unrolled(c):
    return jax.vmap(imupre._chol15_inv)(c)


def v_inv_newton_schulz(c, iters=30):
    d = jnp.sqrt(jnp.diagonal(c, axis1=-2, axis2=-1))
    dinv = 1.0 / d
    M = dinv[..., :, None] * c * dinv[..., None, :]  # unit-diagonal SPD
    # scale so eigenvalues in (0, 1]: ||M||_2 <= trace = 15
    t = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None]
    Mn = M / t
    I = jnp.broadcast_to(jnp.eye(15, dtype=c.dtype), c.shape)
    Y = Mn
    Z = I
    for _ in range(iters):
        T = 0.5 * (3.0 * I - Z @ Y)
        Y = Y @ T
        Z = T @ Z
    # Z ≈ Mn^{-1/2}; M^{-1/2} = Mn^{-1/2}/sqrt(t)
    W = Z / jnp.sqrt(t) * dinv[..., None, :]
    return W


def v_inv_lu_chol(c):
    # info = inv(cov) (LU); W = chol(info)^T
    info = jnp.linalg.inv(c)
    info = 0.5 * (info + jnp.swapaxes(info, -1, -2))
    L = jnp.linalg.cholesky(info)
    return jnp.swapaxes(L, -1, -2)


for name, f in [
    ("chol+solve_tri (lax)", v_chol_lax),
    ("unrolled chol15", v_unrolled),
    ("newton-schulz 30", lambda c: v_inv_newton_schulz(c, 30)),
    ("newton-schulz 18", lambda c: v_inv_newton_schulz(c, 18)),
    ("inv(LU)+chol", v_inv_lu_chol),
]:
    timeit(name, jax.jit(f), cov)
