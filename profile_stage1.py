import time, numpy as np, jax, jax.numpy as jnp
from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.engine import DeviceEngine
import tempfile
tmp = tempfile.mkdtemp()
config = build_config(tmp, tmp, barcoding=True, device_batch_size=128)
eng = DeviceEngine(config)
print('platform:', jax.devices()[0].platform, 'pallas:', eng.use_pallas)
B = 128
rng = np.random.RandomState(0)
pooled = rng.normal(90, 12, (B, eng.wire_frames)).astype(np.float32)
plen = np.full(B, eng.seg_frames, np.int32)
hlen = np.full(B, eng.scaler.pooled_length, np.int32)
hval = np.ones(B, bool)
packed = eng.pack_stage1(pooled, plen, hlen, hval)
dev = jax.device_put(jnp.asarray(packed))

def t(fn, *args, n=5):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000

full = jax.jit(eng._stage1_packed_impl)
print('full stage1 (device-resident): %.1f ms' % t(full, dev))

# components
m = eng.segmodel
heads = eng._derive_heads(jnp.asarray(pooled), jnp.asarray(hlen))
heads = jax.device_put(heads)
scaler_fn = jax.jit(eng.scaler._forward)
print('scaler LSTM T=2000: %.1f ms' % t(scaler_fn, heads))

scaled = jax.device_put(jnp.asarray(pooled[:, :eng.seg_frames]))
plen_d = jax.device_put(jnp.asarray(plen))
from poreplex_tpu.ops import pallas_viterbi, viterbi as vit_ops
vfn = jax.jit(lambda x, l: pallas_viterbi.viterbi(x, l, m.log_start, m.log_trans, m.mus, m.sigmas, m.logws))
print('pallas viterbi T=%d: %.1f ms' % (eng.seg_frames, t(vfn, scaled, plen_d)))
vfn2 = jax.jit(lambda x, l: vit_ops.viterbi(x, l, m.log_start, m.log_trans, m.mus, m.sigmas, m.logws))
print('xla viterbi: %.1f ms' % t(vfn2, scaled, plen_d))

win = jax.device_put(jnp.asarray(rng.normal(0,1,(B,300)).astype(np.float32)))
dfn = jax.jit(eng.demux._forward)
print('demux BiLSTM T=300: %.1f ms' % t(dfn, win))

# wire cost
t0 = time.perf_counter()
for _ in range(5):
    r = full(jnp.asarray(packed))
jax.block_until_ready(r)
print('full incl upload: %.1f ms' % ((time.perf_counter()-t0)/5*1000))
