import time, numpy as np, jax, jax.numpy as jnp, tempfile
from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.engine import DeviceEngine
tmp = tempfile.mkdtemp()
config = build_config(tmp, tmp, barcoding=True, device_batch_size=128)
eng = DeviceEngine(config)
B=128; rng=np.random.RandomState(0)
reads=[(rng.normal(90,12,int(rng.uniform(2000,eng.seg_frames))).astype(np.float32),)*1 for _ in range(B)]
reads=[(s[0], len(s[0]), min(2000,len(s[0]))) for s in reads]
wire,n = eng.pack_stage1_flat(reads)
h=eng.dispatch_stage1_flat(wire); jax.block_until_ready(h)
def med(f,k=7):
    ts=[]
    for _ in range(k):
        t0=time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return sorted(ts)[k//2]*1000
print('upload flat: %.1f ms' % med(lambda: jax.block_until_ready(jnp.asarray(wire[0]))))
fa=jnp.asarray(wire[0]); ma=jnp.asarray(wire[1])
print('exec resident: %.1f ms' % med(lambda: jax.block_until_ready(eng._stage1_flat(fa,ma))))
print('upload again: %.1f ms' % med(lambda: jax.block_until_ready(jnp.asarray(wire[0]))))
print('dispatch+collect serial: %.1f ms' % med(lambda: eng.collect_stage1(eng.dispatch_stage1_flat(wire))))
out = eng.dispatch_stage1_flat(wire)
print('download only: %.1f ms' % med(lambda: np.asarray(out)))
print('out shape/dtype:', out.shape, out.dtype, out.nbytes)
