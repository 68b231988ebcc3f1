import time, numpy as np, jax, jax.numpy as jnp
from concurrent.futures import ThreadPoolExecutor
import jax.lax as lax
d = jax.devices()[0]
# trigger degradation quickly with a moderately slow scan program
Wh = jnp.asarray(np.random.normal(0,.1,(48,192)).astype(np.float32))
def shortscan(x):
    def step(h, t):
        g = jnp.dot(h, Wh)[:, :48]
        return jnp.tanh(g + t), None
    h, _ = lax.scan(step, jnp.zeros((x.shape[0],48)), jnp.swapaxes(x,0,1))
    return h
g3 = jax.jit(shortscan)
x3 = jax.device_put(np.random.normal(0,1,(128,2000,48)).astype(np.float32), d)
jax.block_until_ready(g3(x3))
print('degradation triggered')
MB=1024*1024
one = np.random.randint(0,65535,(MB//2,),np.uint16)
def up(x): return jax.device_put(x, d).block_until_ready()
up(one)
t0=time.perf_counter()
for _ in range(5): up(one)
print('blocking 1MB: %.1f ms' % ((time.perf_counter()-t0)/5*1000))
big = np.random.randint(0,65535,(8*MB//2,),np.uint16)
up(big)
t0=time.perf_counter()
for _ in range(3): up(big)
print('blocking 8MB: %.1f ms (%.1f MB/s)' % ((time.perf_counter()-t0)/3*1000, 8/((time.perf_counter()-t0)/3)))
pool = ThreadPoolExecutor(4)
arrs=[np.random.randint(0,65535,(MB//2,),np.uint16) for _ in range(4)]
t0=time.perf_counter()
for _ in range(3): list(pool.map(up, arrs))
print('4x concurrent 1MB: %.1f ms round (%.1f MB/s agg)' % ((time.perf_counter()-t0)/3*1000, 12/(time.perf_counter()-t0)))
# non-blocking pipelined: issue 10 uploads, block at end
t0=time.perf_counter()
hs=[jax.device_put(a, d) for a in arrs*3]
for h in hs: h.block_until_ready()
print('pipelined 12x1MB: %.1f ms total (%.1f MB/s)' % ((time.perf_counter()-t0)*1000, 12/(time.perf_counter()-t0)))
