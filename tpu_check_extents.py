import time, numpy as np, jax, tempfile
from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.engine import DeviceEngine
rng = np.random.RandomState(7)
def make_reads(eng, n):
    frames = eng.seg_frames
    reads=[]
    for i in range(n):
        L = int(rng.uniform(2000, frames))
        layout = [(71.5,3.7,int(L*.03)),(102.1,3.9,int(L*.02)),(112.0,4.8,int(L*.02)),
                  (80.5,7.4,int(L*.25)),(108.95,2.5,int(L*.12))]
        layout.append((96.0,11.0,L-sum(x[2] for x in layout)))
        sig = np.concatenate([rng.normal(m,s,k) for m,s,k in layout]).astype(np.float32)
        reads.append((sig, len(sig), min(2000,len(sig))))
    return reads
for B in (128, 256):
    tmp = tempfile.mkdtemp()
    config = build_config(tmp, tmp, barcoding=True, device_batch_size=B)
    eng = DeviceEngine(config)
    reads = make_reads(eng, B)
    wire, n = eng.pack_stage1_flat(reads)
    t0=time.perf_counter()
    out = eng.collect_stage1(eng.dispatch_stage1_flat(wire))
    print('B=%d compile+first %.0f ms; adapters present: %d/%d' % (
        B, (time.perf_counter()-t0)*1000, int(out['present'][:, eng.adapter_idx].sum()), n))
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
