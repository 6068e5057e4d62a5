"""Minimal repro: int32 positions bitcast to f32, concat+pad+gather —
compare bit patterns TPU vs CPU. Characterizes the both-table gather
divergence found by scripts/probe_argpos.py.

Measured (v5e, round 4): the full chain and the isolated CONCAT zero
16383 of 16384 position lanes on TPU (every denormal bit pattern; bit
0x0 survives trivially), bit-exact on CPU; a plain gather of the same
bitcast values is bit-faithful.  XLA:TPU's concatenate lowering flushes
denormal f32 lanes to zero.  Consequence + fix: docs/KERNELS.md
"Denormal bit-pattern hazard"."""
import numpy as np
import jax
jax.config.update("jax_platforms", "axon,cpu")
import jax.numpy as jnp

n = 16384
x = np.arange(n, dtype=np.int32)          # all denormal f32 bit patterns
idx = np.random.default_rng(0).permutation(n).astype(np.int32)
ones = np.ones((n, 1), np.float32)

def g(xj, onesj, ij):
    f = jax.lax.bitcast_convert_type(xj, jnp.float32)
    t = jnp.concatenate([f[:, None], onesj], axis=-1)
    t = jnp.pad(t, ((0, 1), (0, 0)))
    return t[ij]

outs = {}
for backend in ("tpu", "cpu"):
    o = np.asarray(jax.jit(g, backend=backend)(
        jnp.asarray(x), jnp.asarray(ones), jnp.asarray(idx)))
    outs[backend] = o.view(np.int32)
a, c = outs["tpu"], outs["cpu"]
eq = np.array_equal(a, c)
print("gather chain bit-equal:", eq)
if not eq:
    d = a[:, 0] != c[:, 0]
    print(f"pos col: {d.sum()} of {n} differ")
    bad = np.argwhere(d).ravel()[:10]
    for r in bad:
        print(f"  row {r}: tpu {a[r,0]} cpu {c[r,0]} (expect {x[idx[r]]})")
    # also second col?
    d1 = a[:, 1] != c[:, 1]
    print(f"ones col: {d1.sum()} differ")

# isolate: plain gather of bitcast values, no concat/pad
def g2(xj, ij):
    f = jax.lax.bitcast_convert_type(xj, jnp.float32)
    return f[ij]
o2 = {b: np.asarray(jax.jit(g2, backend=b)(
    jnp.asarray(x), jnp.asarray(idx))).view(np.int32) for b in ("tpu", "cpu")}
print("plain gather bit-equal:", np.array_equal(o2["tpu"], o2["cpu"]))

# isolate: concat alone
def g3(xj, onesj):
    f = jax.lax.bitcast_convert_type(xj, jnp.float32)
    return jnp.concatenate([f[:, None], onesj], axis=-1)
o3 = {b: np.asarray(jax.jit(g3, backend=b)(
    jnp.asarray(x), jnp.asarray(ones))).view(np.int32) for b in ("tpu", "cpu")}
print("concat alone bit-equal:", np.array_equal(o3["tpu"], o3["cpu"]))
if not np.array_equal(o3["tpu"], o3["cpu"]):
    d = o3["tpu"][:, 0] != o3["cpu"][:, 0]
    print(f"  concat pos col: {d.sum()} differ; first:",
          [(int(r), int(o3['tpu'][r,0]), int(o3['cpu'][r,0]))
           for r in np.argwhere(d).ravel()[:5]])
print("EXIT 0")
