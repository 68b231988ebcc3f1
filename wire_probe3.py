import time, numpy as np, jax, jax.numpy as jnp, tempfile
from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.engine import DeviceEngine
tmp = tempfile.mkdtemp()
config = build_config(tmp, tmp, barcoding=True, device_batch_size=128)
eng = DeviceEngine(config)
B=128
rng = np.random.RandomState(0)
frames = eng.seg_frames
reads=[]
for i in range(B):
    L = int(rng.uniform(2000, frames))
    reads.append((rng.normal(90,12,L).astype(np.float32), L, min(2000,L)))
wire, n = eng.pack_stage1_flat(reads)
print('n packed', n, 'flat bytes MB: %.2f' % (wire[0].nbytes/1e6))

h = eng.dispatch_stage1_flat(wire); jax.block_until_ready(h)

t0=time.perf_counter()
for _ in range(6): jax.block_until_ready(jnp.asarray(wire[0]))
print('flat 1-D upload: %.1f ms' % ((time.perf_counter()-t0)/6*1000))

fa = jnp.asarray(wire[0]); ma = jnp.asarray(wire[1])
t0=time.perf_counter()
for _ in range(6): r = eng._stage1_flat(fa, ma)
jax.block_until_ready(r)
print('flat exec resident: %.1f ms' % ((time.perf_counter()-t0)/6*1000))

# full pipelined as analyzer does
t0=time.perf_counter()
N=10
hs=[]
for i in range(N):
    hs.append(eng.dispatch_stage1_flat(wire))
    if len(hs)>4: eng.collect_stage1(hs.pop(0))
for x in hs: eng.collect_stage1(x)
dt=(time.perf_counter()-t0)/N
print('flat pipelined(4): %.1f ms/batch -> %.0f reads/s' % (dt*1000, n/dt))
