"""v12 on-TPU probe: small-shape lowering check, then exactness."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import arrow1_tpu  # noqa
from arrow1_tpu.kernels.compaction_v12 import compact_v12

R = int(sys.argv[1]) if len(sys.argv) > 1 else 256
band = int(sys.argv[2]) if len(sys.argv) > 2 else -1
nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
n = nsteps * R * 128
key = rng.integers(0, 1 << 40, n).astype(np.int64)
v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
f = rng.standard_normal(n).view(np.int64)  # f64 bit view
mask = rng.random(n) < 0.5
t0 = time.perf_counter()
(ok, ov, of), count = compact_v12(
    jnp.asarray(mask), (jnp.asarray(key), jnp.asarray(v), jnp.asarray(f)),
    rows=R, band=band)
cnt = int(jax.device_get(count))
t1 = time.perf_counter()
print(f"compile+run {t1-t0:.1f}s count={cnt} expect={int(mask.sum())}", flush=True)
assert cnt == int(mask.sum())
okh = np.asarray(jax.device_get(ok))[:cnt]
ovh = np.asarray(jax.device_get(ov))[:cnt]
ofh = np.asarray(jax.device_get(of))[:cnt]
np.testing.assert_array_equal(okh, key[mask])
np.testing.assert_array_equal(ovh, v[mask])
np.testing.assert_array_equal(ofh, f[mask])
print("EXACT on TPU", flush=True)
