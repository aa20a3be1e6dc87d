import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

LOG = open("/root/repo/benchmarks/r2/time_compaction.log", "a", buffering=1)
def log(*a):
    print(*a, file=LOG); print(*a, flush=True)

from arrow1_tpu.kernels.compaction_v4 import compact_v4

def timeit(fn, *args, reps=5):
    out = fn(*args); jax.device_get(out)
    ts = []
    for _ in range(reps):
        t0 = time.time(); jax.device_get(fn(*args)); ts.append(time.time()-t0)
    return min(ts)

log("=== big-n timing", time.strftime("%H:%M:%S"))
tiny = jnp.zeros(8, jnp.float32)
floor = timeit(jax.jit(lambda x: x + 1), tiny)
log(f"dispatch floor: {floor*1e3:.1f} ms")

rng = np.random.default_rng(0)
n = 80_000_000
NP8 = (n + 16383)//16384*16384
m_np = np.zeros(NP8, bool); m_np[:n] = rng.uniform(size=n) < 0.3
a_np = np.zeros(NP8, np.int64); a_np[:n] = rng.integers(-2**62, 2**62, n, dtype=np.int64)
b_np = np.zeros(NP8, np.int64); b_np[:n] = rng.integers(-2**62, 2**62, n, dtype=np.int64)
f_np = np.zeros(NP8, np.float32); f_np[:n] = rng.normal(size=n).astype(np.float32)
mN, aN, bN, fN = map(jnp.asarray, (m_np, a_np, b_np, f_np))

@jax.jit
def sol_copy(m, a, b, f):
    outs = (jnp.flip(a), jnp.flip(b), jnp.flip(f))
    return tuple(o[:8] for o in outs), m.sum()
t = timeit(sol_copy, mN, aN, bN, fN)
log(f"XLA flip-copy 80M x 20B rw: {t*1e3:.1f} ms -> net {(t-floor)*1e3:.1f} ms = {80e6*40/(t-floor)/1e9:.0f} GB/s")

def wrap(fn, **kw):
    @jax.jit
    def g(m, a, b, f):
        outs, cnt = fn(m, (a, b, f), **kw)
        return tuple(o[:8] for o in outs), cnt
    return g

for name, rows in [("v4_r32", 32), ("v4_r64", 64), ("v4_r128", 128)]:
    try:
        fn = wrap(compact_v4, rows=rows)
        t = timeit(fn, mN, aN, bN, fN)
        net = t - floor
        log(f"{name}: {t*1e3:.2f} ms total, {net*1e3:.2f} ms net -> {n/net/1e6:.0f} M rows/s")
        # exactness
        outs, cnt = fn(mN, aN, bN, fN)
        assert int(cnt) == m_np.sum()
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
log("=== done", time.strftime("%H:%M:%S"))
