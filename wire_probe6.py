import time, numpy as np, jax, jax.numpy as jnp, tempfile
from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.engine import DeviceEngine
tmp = tempfile.mkdtemp()
config = build_config(tmp, tmp, barcoding=True, device_batch_size=128)
eng = DeviceEngine(config)
B=128; rng=np.random.RandomState(0)
reads=[]
for _ in range(B):
    L=int(rng.uniform(2000,eng.seg_frames))
    reads.append((rng.normal(90,12,L).astype(np.float32), L, min(2000,L)))
wire,n = eng.pack_stage1_flat(reads)
h=eng.dispatch_stage1_flat(wire); jax.block_until_ready(h)
d = jax.devices()[0]
def med(f,k=9):
    ts=[]
    for _ in range(k):
        t0=time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return sorted(ts)[k//2]*1000
print('jnp.asarray:          %.1f ms' % med(lambda: jax.block_until_ready(jnp.asarray(wire[0]))))
print('device_put explicit:  %.1f ms' % med(lambda: jax.block_until_ready(jax.device_put(wire[0], d))))
print('jnp.asarray again:    %.1f ms' % med(lambda: jax.block_until_ready(jnp.asarray(wire[0]))))
