import time, numpy as np, jax, jax.numpy as jnp
d = jax.devices()[0]
def med(f,k=9):
    ts=[]
    for _ in range(k):
        t0=time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return sorted(ts)[k//2]*1000
fresh = np.random.randint(0,65535,(1196032,),np.uint16)
jax.block_until_ready(jax.device_put(fresh, d))
print('bare-process upload:  %.1f ms' % med(lambda: jax.block_until_ready(jax.device_put(fresh, d))))

# now build the engine and retry the SAME array
import tempfile
from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.engine import DeviceEngine
tmp = tempfile.mkdtemp()
config = build_config(tmp, tmp, barcoding=True, device_batch_size=128)
eng = DeviceEngine(config)
print('engine built (weights resident)')
print('same array now:       %.1f ms' % med(lambda: jax.block_until_ready(jax.device_put(fresh, d))))

# run one jitted program, then retry
B=128; rng=np.random.RandomState(0)
reads=[]
for _ in range(B):
    L=int(rng.uniform(2000,eng.seg_frames))
    reads.append((rng.normal(90,12,L).astype(np.float32), L, min(2000,L)))
wire,n = eng.pack_stage1_flat(reads)
jax.block_until_ready(eng.dispatch_stage1_flat(wire))
print('after one exec:       %.1f ms' % med(lambda: jax.block_until_ready(jax.device_put(fresh, d))))
