import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
import numpy as np

def try_op(name, fn):
    def kern(x_ref, o_ref):
        o_ref[:] = fn(x_ref[:])
    x = jnp.linspace(0.1, 0.9, 128*128).reshape(128, 128).astype(jnp.float32)
    try:
        out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((128,128), jnp.float32))(x)
        ok = bool(np.isfinite(np.asarray(out)).all())
        print(f"{name:8s}: lowers, finite={ok}")
    except Exception as e:
        print(f"{name:8s}: FAIL ({str(e)[:60]})")

for name, fn in [("sin", jnp.sin), ("cos", jnp.cos), ("log", jnp.log),
                 ("exp", jnp.exp), ("atan", jnp.arctan), ("acos", jnp.arccos),
                 ("sqrt", jnp.sqrt), ("pow2.5", lambda x: x**2.5)]:
    try_op(name, fn)
