import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention, SegmentIds
print("backend", jax.default_backend(), flush=True)
B,H,T,D = 2,2,256,64
k1,k2,k3 = jax.random.split(jax.random.PRNGKey(0),3)
q = jax.random.normal(k1,(B,H,T,D),jnp.bfloat16)
k = jax.random.normal(k2,(B,H,T,D),jnp.bfloat16)
v = jax.random.normal(k3,(B,H,T,D),jnp.bfloat16)
print("calling kernel (no segs)", flush=True)
o = flash_attention(q,k,v, sm_scale=0.125)
print("no-seg ok", np.asarray(o).mean(), flush=True)
seg = jnp.ones((B,T),jnp.int32).at[:,200:].set(0)
print("calling kernel (segs)", flush=True)
o2 = flash_attention(q,k,v, segment_ids=SegmentIds(q=seg,kv=seg), sm_scale=0.125)
print("seg ok", np.asarray(o2).mean(), flush=True)
print("grad", flush=True)
g = jax.grad(lambda q: flash_attention(q,k,v,segment_ids=SegmentIds(q=seg,kv=seg),sm_scale=0.125).astype(jnp.float32).sum())(q)
print("grad ok", np.asarray(g.astype(jnp.float32)).mean(), flush=True)
