import time, numpy as np, jax, jax.numpy as jnp, tempfile
from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.engine import DeviceEngine
from poreplex_tpu.ops import viterbi as vit_ops
d = jax.devices()[0]
def med(f,k=7):
    ts=[]
    for _ in range(k):
        t0=time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return sorted(ts)[k//2]*1000
fresh = np.random.randint(0,65535,(1196032,),np.uint16)
small = np.random.randint(0,65535,(1024,),np.uint16)
up = lambda: jax.block_until_ready(jax.device_put(fresh, d))
ups = lambda: jax.block_until_ready(jax.device_put(small, d))
up(); ups()
print('baseline big/small: %.1f / %.1f ms' % (med(up), med(ups)))

tmp = tempfile.mkdtemp()
config = build_config(tmp, tmp, barcoding=True, device_batch_size=128)
config['pallas'] = 'never'
eng = DeviceEngine(config)
rng=np.random.RandomState(0)

# 1) scaler LSTM only
heads = jax.device_put(rng.normal(0,1,(128,2000)).astype(np.float32), d)
f1 = jax.jit(eng.scaler._forward)
jax.block_until_ready(f1(heads))
print('after scaler exec:  %.1f / %.1f ms' % (med(up), med(ups)))

# 2) viterbi only
m = eng.segmodel
scaled = jax.device_put(rng.normal(90,12,(128,eng.seg_frames)).astype(np.float32), d)
plen = jax.device_put(np.full(128, eng.seg_frames, np.int32), d)
f2 = jax.jit(lambda x,l: vit_ops.viterbi(x,l,m.log_start,m.log_trans,m.mus,m.sigmas,m.logws))
jax.block_until_ready(f2(scaled, plen))
print('after viterbi exec: %.1f / %.1f ms' % (med(up), med(ups)))

# 3) demux only
win = jax.device_put(rng.normal(0,1,(128,300)).astype(np.float32), d)
f3 = jax.jit(eng.demux._forward)
jax.block_until_ready(f3(win))
print('after demux exec:   %.1f / %.1f ms' % (med(up), med(ups)))

time.sleep(3)
print('after 3s idle:      %.1f / %.1f ms' % (med(up), med(ups)))
