import time, numpy as np, jax, jax.numpy as jnp
from concurrent.futures import ThreadPoolExecutor
d = jax.devices()[0]
print('dev', d)
MB = 1024*1024
x1 = np.random.randint(0, 65535, (MB//2,), np.uint16)  # 1MB
def up(x):
    return jax.device_put(x, d).block_until_ready()
up(x1); up(x1)
t0=time.perf_counter()
for _ in range(6): up(x1)
seq = (time.perf_counter()-t0)/6
print('sequential 1MB: %.1f ms -> %.1f MB/s' % (seq*1000, 1/seq))
pool = ThreadPoolExecutor(4)
arrs = [np.random.randint(0,65535,(MB//2,),np.uint16) for _ in range(4)]
t0=time.perf_counter()
for _ in range(3):
    list(pool.map(up, arrs))
par = (time.perf_counter()-t0)/3
print('4x concurrent 1MB each: %.1f ms -> %.1f MB/s aggregate' % (par*1000, 4/par))
# bigger single transfer
x8 = np.random.randint(0, 65535, (4*MB,), np.uint16)  # 8MB
up(x8)
t0=time.perf_counter()
for _ in range(3): up(x8)
big = (time.perf_counter()-t0)/3
print('single 8MB: %.1f ms -> %.1f MB/s' % (big*1000, 8/big))
