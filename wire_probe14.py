import time, numpy as np, jax, jax.numpy as jnp, tempfile
from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.engine import DeviceEngine
rng = np.random.RandomState(7)
def make_reads(eng, n):
    frames = eng.seg_frames
    reads=[]
    for i in range(n):
        L = int(rng.uniform(2000, frames))
        reads.append((rng.normal(90,12,L).astype(np.float32), L, min(2000,L)))
    return reads
for B in (128, 256, 512):
    tmp = tempfile.mkdtemp()
    config = build_config(tmp, tmp, barcoding=True, device_batch_size=B)
    eng = DeviceEngine(config)
    reads = make_reads(eng, B)
    wire, n = eng.pack_stage1_flat(reads)
    t0=time.perf_counter()
    eng.collect_stage1(eng.dispatch_stage1_flat(wire))
    print('B=%d compile+first: %.0f ms; payload %.2f MB; n=%d' % (B, (time.perf_counter()-t0)*1000, wire[0].nbytes/1e6, n))
    # pipelined, 4 inflight
    N=8
    t0=time.perf_counter()
    hs=[]
    for i in range(N):
        w2, n2 = eng.pack_stage1_flat(reads)
        hs.append(eng.dispatch_stage1_flat(w2))
        if len(hs)>4: eng.collect_stage1(hs.pop(0))
    for h in hs: eng.collect_stage1(h)
    dt=(time.perf_counter()-t0)/N
    print('B=%d pipelined: %.1f ms/batch -> %.0f reads/s' % (B, dt*1000, n/dt))
