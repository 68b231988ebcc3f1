import time, numpy as np, jax, jax.numpy as jnp
import jax.lax as lax
d = jax.devices()[0]
def med(f,k=7):
    ts=[]
    for _ in range(k):
        t0=time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return sorted(ts)[k//2]*1000
fresh = np.random.randint(0,65535,(1196032,),np.uint16)
up = lambda: jax.block_until_ready(jax.device_put(fresh, d))
up(); print('baseline: %.1f ms' % med(up))

rng = np.random.RandomState(0)
H=48
Wx = jnp.asarray(rng.normal(0,.1,(1,4*H)).astype(np.float32))
Wh = jnp.asarray(rng.normal(0,.1,(H,4*H)).astype(np.float32))
b  = jnp.asarray(np.zeros(4*H, np.float32))
P = jax.lax.Precision.HIGHEST

def lstm(x):             # x [B,T,1]
    xg = jnp.einsum('bti,ih->bth', x, Wx, precision=P) + b
    def step(carry, g):
        h, c = carry
        g = g + jnp.dot(h, Wh, precision=P)
        i, f, z, o = jnp.split(g, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(z)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), None
    B = x.shape[0]
    init = (jnp.zeros((B,H)), jnp.zeros((B,H)))
    (h, c), _ = lax.scan(step, init, jnp.swapaxes(xg,0,1))
    return h
f = jax.jit(lstm)
x = jax.device_put(rng.normal(0,1,(128,2000,1)).astype(np.float32), d)
jax.block_until_ready(f(x))
print('after minimal LSTM exec: %.1f ms' % med(up))
