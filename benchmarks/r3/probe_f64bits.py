"""Probe which f64->orderable-bits formulations the axon X64-rewrite
pass can compile (radix.py float sort-key path). Small shapes."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

x = jnp.asarray(np.random.default_rng(0).standard_normal(65536))


def try_(name, fn):
    try:
        out = jax.jit(fn)(x)
        s = float(jax.device_get(out if out.ndim == 0 else out.sum()))
        print("OK  ", name, s, flush=True)
    except Exception as e:
        print("FAIL", name, repr(e)[:300], flush=True)


def v_direct(x):
    b = jax.lax.bitcast_convert_type(x, jnp.uint64)
    sign = jnp.uint64(1 << 63)
    o = jnp.where((b & sign) != 0, ~b, b | sign)
    return jnp.sort(o).astype(jnp.float64).sum()


def v_halves_u64(x):
    h = jax.lax.bitcast_convert_type(x, jnp.uint32)
    b = (h[..., 1].astype(jnp.uint64) << jnp.uint64(32)) | \
        h[..., 0].astype(jnp.uint64)
    sign = jnp.uint64(1 << 63)
    o = jnp.where((b & sign) != 0, ~b, b | sign)
    return jnp.sort(o).astype(jnp.float64).sum()


def v_u32pair_sort(x):
    h = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi, lo = h[..., 1], h[..., 0]
    neg = (hi & jnp.uint32(1 << 31)) != 0
    ohi = jnp.where(neg, ~hi, hi | jnp.uint32(1 << 31))
    olo = jnp.where(neg, ~lo, lo)
    a, b = jax.lax.sort((ohi, olo), num_keys=2, is_stable=False)
    return a.astype(jnp.float64).sum() + b.astype(jnp.float64).sum()


def v_pair_pack_u64(x):
    h = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi, lo = h[..., 1], h[..., 0]
    neg = (hi & jnp.uint32(1 << 31)) != 0
    ohi = jnp.where(neg, ~hi, hi | jnp.uint32(1 << 31))
    olo = jnp.where(neg, ~lo, lo)
    b = (ohi.astype(jnp.uint64) << jnp.uint64(32)) | olo.astype(jnp.uint64)
    return jnp.sort(b).astype(jnp.float64).sum()


def v_f64_payload(x):
    # f64 riding lax.sort as PAYLOAD with a u64 key (q1-style) — known ok?
    k = jnp.arange(x.shape[0], dtype=jnp.uint64)
    a, b = jax.lax.sort((k, x), num_keys=1, is_stable=False)
    return b.sum()


def v_f64_key(x):
    # f64 directly as the sort key
    return jnp.sort(x).sum()


for name in sys.argv[1:] or ["direct", "halves_u64", "u32pair_sort",
                             "pair_pack_u64", "f64_payload", "f64_key"]:
    try_(name, globals()["v_" + name])
