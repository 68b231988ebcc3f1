import time, gc, numpy as np, jax, jax.numpy as jnp
d = jax.devices()[0]
def med(f,k=7):
    ts=[]
    for _ in range(k):
        t0=time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return sorted(ts)[k//2]*1000
fresh = np.random.randint(0,65535,(1196032,),np.uint16)
up = lambda: jax.block_until_ready(jax.device_put(fresh, d))
up()
print('baseline:           %.1f ms' % med(up))
tiny = jax.jit(lambda x: x + 1)
out = tiny(jnp.ones(8)); jax.block_until_ready(out)
print('after tiny jit:     %.1f ms' % med(up))
big = jax.jit(lambda x: jnp.sort(x.astype(jnp.float32)))
out2 = big(jax.device_put(fresh, d)); jax.block_until_ready(out2)
print('after big jit:      %.1f ms' % med(up))
del out, out2; gc.collect()
print('after del outputs:  %.1f ms' % med(up))
# scan-heavy program like the LSTM/viterbi
import jax.lax as lax
def scanny(x):
    def step(c, t): return c * 0.9 + t, c
    c, ys = lax.scan(step, jnp.zeros(x.shape[0]), x.T)
    return ys
sc = jax.jit(scanny)
x2 = jax.device_put(np.random.normal(0,1,(128,6666)).astype(np.float32), d)
out3 = sc(x2); jax.block_until_ready(out3)
print('after scan jit:     %.1f ms' % med(up))
del out3, x2; gc.collect()
print('after del scan out: %.1f ms' % med(up))
