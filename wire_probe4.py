import time, numpy as np, jax, jax.numpy as jnp
d = jax.devices()[0]
def bench(label, x, n=8):
    jax.block_until_ready(jax.device_put(x, d))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter()
        jax.block_until_ready(jax.device_put(x, d))
        ts.append(time.perf_counter()-t0)
    ts=sorted(ts)
    print('%s: med %.1f ms  min %.1f ms' % (label, ts[n//2]*1000, ts[0]*1000))
MB=1024*1024
bench('1-D u16 1.14MB', np.random.randint(0,65535,(1196032,),np.uint16))
bench('1-D u16 1.00MB', np.random.randint(0,65535,(MB//2,),np.uint16))
bench('2-D u16 128x6670', np.random.randint(0,65535,(128,6670),np.uint16))
bench('1-D f32 1.14MB', np.random.normal(0,1,(299008,)).astype(np.float32))
bench('1-D u8 0.57MB', np.random.randint(0,255,(598016,),np.uint8))
