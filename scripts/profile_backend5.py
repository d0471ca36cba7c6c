"""Decomposed preint/solve timings, min-of-N (noise-robust)."""
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

SEED = int.from_bytes(os.urandom(4), "little")
rng = np.random.default_rng(SEED)
print("seed", SEED)

B, W, MAXI = 8, 10, 32
noise = imupre.ImuNoise(*map(jnp.float32, (0.1, 0.01, 1e-4, 1e-5)))

dts = np.zeros((B, W, MAXI), np.float32)
dts[:, :, :20] = rng.uniform(0.004, 0.006, (B, W, 20))
accs = (rng.normal(0, 0.3, (B, W, MAXI + 1, 3)) + [0, 0, 9.8]).astype(np.float32)
gyrs = rng.normal(0, 0.2, (B, W, MAXI + 1, 3)).astype(np.float32)
ba = rng.normal(0, 0.02, (B, W, 3)).astype(np.float32)
bg = rng.normal(0, 0.005, (B, W, 3)).astype(np.float32)
args = tuple(map(jnp.asarray, (dts, accs, gyrs, ba, bg)))

REPS, SETS = 20, 5


def timeit(name, fn, make_args):
    out = fn(*make_args()); jax.block_until_ready(out)
    best = 1e9
    for _ in range(SETS):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*make_args())  # FRESH args per rep: axon result-caches
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:44s} {best*1e3:8.2f} ms")
    return out


def perturb():
    d = float(rng.normal(0, 1e-6))
    return (args[0], args[1] + d, args[2] + d, args[3], args[4])


vv = jax.vmap(jax.vmap(
    lambda d, a, g, b1, b2: imupre.preintegrate(d, a, g, b1, b2, noise)))
vv_ser = jax.vmap(jax.vmap(
    lambda d, a, g, b1, b2: imupre.preintegrate_serial(d, a, g, b1, b2, noise)))

f_dp = jax.jit(lambda *a: vv(*a).delta_p)
timeit("preint par: delta_p only (cov DCEd)", f_dp, perturb)
f_cov = jax.jit(lambda *a: vv(*a).covariance)
timeit("preint par: covariance", f_cov, perturb)
f_cov_s = jax.jit(lambda *a: vv_ser(*a).covariance)
timeit("preint SERIAL: covariance", f_cov_s, perturb)
f_all = jax.jit(lambda *a: jax.tree.map(lambda x: x.sum(), vv(*a)))
timeit("preint par: everything", f_all, perturb)

cov = jax.jit(lambda *a: vv(*a).covariance)(*args)
jax.block_until_ready(cov)
f_w = jax.jit(lambda c: imupre._chol15_inv(
    c + 1e-12 * jnp.eye(15, dtype=c.dtype)))
timeit("chol15_inv on (8,10,15,15)", f_w,
       lambda: (cov + float(rng.normal(0, 1e-12)),))
f_pw = jax.jit(lambda *a: imupre._chol15_inv(
    vv(*a).covariance + 1e-12 * jnp.eye(15)))
timeit("preint par + chol15_inv (fused)", f_pw, perturb)

# batched cholesky 172^2 revisited: lax vs unrolled-block variants
NXP = 172
A = rng.normal(0, 1, (B, NXP, NXP)).astype(np.float32)
Hs = jnp.asarray(np.einsum("bij,bkj->bik", A, A) + 10 * np.eye(NXP, dtype=np.float32))
gs = jnp.asarray(rng.normal(0, 1, (B, NXP)).astype(np.float32))
f_ch = jax.jit(lambda H, v: jax.scipy.linalg.cho_solve(
    (jnp.linalg.cholesky(H), True), v))
timeit("lax chol+solve (8,172,172)", f_ch,
       lambda: (Hs + float(rng.normal(0, 1e-6)) * jnp.eye(NXP)[None], gs))
f_lu = jax.jit(lambda H, v: jnp.linalg.solve(H, v[..., None])[..., 0])
timeit("lu solve (8,172,172)", f_lu,
       lambda: (Hs + float(rng.normal(0, 1e-6)) * jnp.eye(NXP)[None], gs))
