"""TPU probe: compile-check + time compact_v4 vs compact_v3."""
import sys, time, json
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

LOG = open("/root/repo/benchmarks/r2/probe_v4.log", "a", buffering=1)
def log(*a):
    print(*a, file=LOG); print(*a, flush=True)

log("=== probe_v4 start", time.strftime("%H:%M:%S"), jax.devices())

from arrow1_tpu.kernels.compaction_v4 import compact_v4
from arrow1_tpu.kernels.compaction_v3 import compact_v3

def sync(x):
    return jax.device_get(x)

rng = np.random.default_rng(0)

# --- small exactness on TPU ---
n = 8192
m = jnp.asarray(rng.uniform(size=n) < 0.4)
a = jnp.asarray(rng.integers(-2**62, 2**62, n, dtype=np.int64))
b = jnp.asarray(rng.integers(-2**31, 2**31, n, dtype=np.int32))
t0 = time.time()
(ca, cb), cnt = compact_v4(m, (a, b), rows=8)
cnt = int(cnt)
log(f"v4 small compile+run {time.time()-t0:.1f}s")
mnp = np.asarray(m); anp = np.asarray(a); bnp = np.asarray(b)
assert cnt == mnp.sum()
np.testing.assert_array_equal(np.asarray(ca)[:cnt], anp[mnp])
np.testing.assert_array_equal(np.asarray(cb)[:cnt], bnp[mnp])
log("v4 small EXACT on TPU")

# --- 10M timing, 3-col flagship shape (i64,i64,f32-as-words ~ 5 words) ---
n = 10_000_000
NPAD = (n + 8192 - 1)//8192*8192  # lcm of all tile sizes
mN = jnp.asarray(np.concatenate([rng.uniform(size=n) < 0.3, np.zeros(NPAD-n, bool)]))
aN = jnp.asarray(np.concatenate([rng.integers(-2**62, 2**62, n, dtype=np.int64), np.zeros(NPAD-n, np.int64)]))
bN = jnp.asarray(np.concatenate([rng.integers(-2**62, 2**62, n, dtype=np.int64), np.zeros(NPAD-n, np.int64)]))
fN = jnp.asarray(np.concatenate([rng.normal(size=n), np.zeros(NPAD-n)]).astype(np.float32))

for name, fn, rows in [("v3", lambda: compact_v3(mN, (aN, bN, fN)), None),
                       ("v4_r8", lambda: compact_v4(mN, (aN, bN, fN), rows=8), 8),
                       ("v4_r16", lambda: compact_v4(mN, (aN, bN, fN), rows=16), 16),
                       ("v4_r32", lambda: compact_v4(mN, (aN, bN, fN), rows=32), 32),
                       ("v4_r64", lambda: compact_v4(mN, (aN, bN, fN), rows=64), 64)]:
    try:
        t0 = time.time()
        outs, cnt = fn()
        sync(outs[0][:8]); sync(cnt)
        log(f"{name} compile+first {time.time()-t0:.1f}s count={int(cnt)}")
        # timed runs
        ts = []
        for _ in range(5):
            t0 = time.time()
            outs, cnt = fn()
            sync(outs[0][:8]); sync(cnt)
            ts.append(time.time()-t0)
        best = min(ts)
        log(f"{name}: best {best*1e3:.2f} ms  ({n/best/1e6:.0f} M rows/s) all={['%.1f'%(t*1e3) for t in ts]}")
        # exactness spot check on first col
        canp = np.asarray(outs[0])[:int(cnt)]
        exp = np.asarray(aN)[np.asarray(mN)]
        np.testing.assert_array_equal(canp, exp)
        log(f"{name}: EXACT at 10M")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:500]}")
log("=== probe_v4 done", time.strftime("%H:%M:%S"))
