"""Proper TPU timing: one-dispatch programs (kernel + tiny consumer),
dispatch floor subtracted, vs a pure-copy speed-of-light reference."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import functools

LOG = open("/root/repo/benchmarks/r2/time_compaction.log", "a", buffering=1)
def log(*a):
    print(*a, file=LOG); print(*a, flush=True)

from arrow1_tpu.kernels.compaction_v3 import compact_v3
from arrow1_tpu.kernels.compaction_v4 import compact_v4

def timeit(fn, *args, reps=7):
    out = fn(*args); jax.device_get(out)          # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.time(); jax.device_get(fn(*args)); ts.append(time.time()-t0)
    return min(ts)

log("=== time_compaction", time.strftime("%H:%M:%S"))

# dispatch floor
tiny = jnp.zeros(8, jnp.float32)
floor = timeit(jax.jit(lambda x: x + 1), tiny)
log(f"dispatch floor: {floor*1e3:.1f} ms")

rng = np.random.default_rng(0)
n = 10_000_000
NP8 = (n + 8191)//8192*8192
sel_p = 0.3
mN = jnp.asarray(np.concatenate([rng.uniform(size=n) < sel_p, np.zeros(NP8-n, bool)]))
aN = jnp.asarray(np.concatenate([rng.integers(-2**62, 2**62, n, dtype=np.int64), np.zeros(NP8-n, np.int64)]))
bN = jnp.asarray(np.concatenate([rng.integers(-2**62, 2**62, n, dtype=np.int64), np.zeros(NP8-n, np.int64)]))
fN = jnp.asarray(np.concatenate([rng.normal(size=n), np.zeros(NP8-n)]).astype(np.float32))

# speed of light: read all 5 word streams + mask, write 5 streams (XLA fused)
@jax.jit
def sol_copy(m, a, b, f):
    outs = (a + 1, b + 1, f + 1)
    s = m.sum()
    return tuple(o[:8] for o in outs), s
t = timeit(sol_copy, mN, aN, bN, fN)
log(f"XLA copy (read 200MB, write 200MB... minus tiny outs — XLA may DCE copies; indicative only): {t*1e3:.1f} ms")

@jax.jit
def sol_copy2(m, a, b, f):
    # force real materialization: reverse makes copy non-elidable, sum consumes
    outs = (jnp.flip(a), jnp.flip(b), jnp.flip(f))
    return tuple(o[:8] for o in outs), m.sum()
t = timeit(sol_copy2, mN, aN, bN, fN)
log(f"XLA flip-copy 10M x (8+8+4)B rw: {t*1e3:.1f} ms -> {(t-floor)*1e3:.1f} ms net")

def wrap(fn, **kw):
    @jax.jit
    def g(m, a, b, f):
        outs, cnt = fn(m, (a, b, f), **kw)
        return tuple(o[:8] for o in outs), cnt
    return g

for name, fn in [("v3", wrap(compact_v3)),
                 ("v4_r8", wrap(compact_v4, rows=8)),
                 ("v4_r16", wrap(compact_v4, rows=16)),
                 ("v4_r32", wrap(compact_v4, rows=32)),
                 ("v4_r64", wrap(compact_v4, rows=64))]:
    try:
        t = timeit(fn, mN, aN, bN, fN)
        net = (t - floor)
        log(f"{name}: {t*1e3:.2f} ms total, {net*1e3:.2f} ms net -> {n/net/1e6:.0f} M rows/s")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
log("=== done", time.strftime("%H:%M:%S"))
