import time, numpy as np, jax, jax.numpy as jnp
import jax.lax as lax
d = jax.devices()[0]
def med(f,k=5):
    ts=[]
    for _ in range(k):
        t0=time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return sorted(ts)[k//2]*1000
fresh = np.random.randint(0,65535,(1196032,),np.uint16)
up = lambda: jax.block_until_ready(jax.device_put(fresh, d))
up(); print('baseline: %.1f ms' % med(up))

# slow non-scan program: chained big matmuls ~ tens of ms
A = jnp.asarray(np.random.normal(0,.01,(4096,4096)).astype(np.float32))
def slowmm(x):
    for _ in range(60):
        x = jnp.tanh(x @ A)
    return x
f = jax.jit(slowmm)
x = jax.device_put(np.random.normal(0,1,(4096,4096)).astype(np.float32), d)
t0=time.perf_counter(); jax.block_until_ready(f(x)); c=time.perf_counter()-t0
t0=time.perf_counter(); jax.block_until_ready(f(x)); e=time.perf_counter()-t0
print('slowmm exec: %.1f ms (first %.0f)' % (e*1000, c*1000))
print('after slowmm: %.1f ms' % med(up))

# short scan (few steps) with gemm
Wh = jnp.asarray(np.random.normal(0,.1,(48,192)).astype(np.float32))
def shortscan(x):
    def step(h, t):
        g = jnp.dot(h, Wh)[:, :48]
        return jnp.tanh(g + t), None
    h, _ = lax.scan(step, jnp.zeros((x.shape[0],48)), jnp.swapaxes(x,0,1))
    return h
g2 = jax.jit(shortscan)
x2 = jax.device_put(np.random.normal(0,1,(128,50,48)).astype(np.float32), d)
jax.block_until_ready(g2(x2))
print('after short scan (T=50): %.1f ms' % med(up))

x3 = jax.device_put(np.random.normal(0,1,(128,2000,48)).astype(np.float32), d)
g3 = jax.jit(shortscan)
t0=time.perf_counter(); jax.block_until_ready(g3(x3)); print('long scan exec+compile %.0f ms' % ((time.perf_counter()-t0)*1000))
t0=time.perf_counter(); jax.block_until_ready(g3(x3)); print('long scan exec %.1f ms' % ((time.perf_counter()-t0)*1000))
print('after long scan (T=2000): %.1f ms' % med(up))
