import time, numpy as np, jax, jax.numpy as jnp, tempfile
from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.engine import DeviceEngine
tmp = tempfile.mkdtemp()
config = build_config(tmp, tmp, barcoding=True, device_batch_size=128)
eng = DeviceEngine(config)
B=128
rng = np.random.RandomState(0)
pooled = rng.normal(90,12,(B,eng.wire_frames)).astype(np.float32)
plen = np.full(B, eng.seg_frames, np.int32)
packed = eng.pack_stage1(pooled, plen)
print('payload MB: %.2f' % (packed.nbytes/1e6))
full = jax.jit(eng._stage1_packed_impl)
r = full(jnp.asarray(packed)); jax.block_until_ready(r)

# a) host pack cost
t0=time.perf_counter()
for _ in range(5): eng.pack_stage1(pooled, plen)
print('host pack: %.1f ms' % ((time.perf_counter()-t0)/5*1000))

# b) jnp.asarray upload only
t0=time.perf_counter()
for _ in range(5): jax.block_until_ready(jnp.asarray(packed))
print('upload blocking: %.1f ms' % ((time.perf_counter()-t0)/5*1000))

# c) device-resident repeat
dev = jnp.asarray(packed)
t0=time.perf_counter()
for _ in range(5): r = full(dev)
jax.block_until_ready(r)
print('exec resident: %.1f ms' % ((time.perf_counter()-t0)/5*1000))

# d) fresh upload, pipelined depth 8
t0=time.perf_counter()
hs=[full(jnp.asarray(packed)) for _ in range(8)]
jax.block_until_ready(hs)
print('pipelined x8 fresh upload: %.1f ms/call' % ((time.perf_counter()-t0)/8*1000))

# e) with result download each call (np.asarray)
t0=time.perf_counter()
for _ in range(5): np.asarray(full(jnp.asarray(packed)))
print('serial upload+exec+download: %.1f ms' % ((time.perf_counter()-t0)/5*1000))

# f) pipelined with download lag (keep 4 inflight)
hs=[]
t0=time.perf_counter()
N=12
for i in range(N):
    hs.append(full(jnp.asarray(packed)))
    if len(hs)>4: np.asarray(hs.pop(0))
for h in hs: np.asarray(h)
print('pipelined(4) incl downloads: %.1f ms/call' % ((time.perf_counter()-t0)/N*1000))
