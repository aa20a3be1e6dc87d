"""v9 exactness smoke on real TPU at a small shape (queue-gated)."""
import sys, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from arrow1_tpu.kernels.compaction_v9 import compact_v9

rng = np.random.default_rng(0)
for sel in (0.0, 0.13, 0.5, 1.0):
    n = 8 * 128 * 128  # R=8? use rows=8, t_tiles=8 -> step 8192
    key = rng.integers(0, 1 << 40, n).astype(np.int64)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    maskh = rng.random(n) < sel
    (ok, ov), cnt = compact_v9(jnp.asarray(maskh),
                               (jnp.asarray(key), jnp.asarray(v)),
                               rows=8, t_tiles=8)
    cnt = int(cnt)
    exact = (cnt == int(maskh.sum())
             and np.array_equal(np.asarray(ok[:cnt]), key[maskh])
             and np.array_equal(np.asarray(ov[:cnt]), v[maskh]))
    print(f"v9 smoke sel={sel}: cnt={cnt} exact={exact}", flush=True)
    if not exact:
        sys.exit(1)
print("v9 smoke: ALL EXACT", flush=True)
