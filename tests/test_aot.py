"""AOT executable cache (utils/aot.py): compile-once, load-everywhere."""

import numpy as np

from poreplex_tpu.utils.aot import AotCache


def test_aot_cache_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    cache = AotCache(cache_dir=str(tmp_path), enabled=True)
    fn = jax.jit(lambda x, k: x * k + 1.0, static_argnames=('k',))
    x = jnp.ones((8, 16))

    exe = cache.load_or_compile(fn, 'toy', x, k=3.0)
    assert exe is not None
    assert cache.misses == 1
    np.testing.assert_allclose(np.asarray(exe(x)), 4.0)

    # a fresh cache instance (simulating a new process) must LOAD the
    # serialized executable rather than recompile — unless this backend
    # cannot serialize executables, in which case no file was written
    import os
    files = [f for f in os.listdir(str(tmp_path)) if f.endswith('.aotx')]
    cache2 = AotCache(cache_dir=str(tmp_path), enabled=True)
    exe2 = cache2.load_or_compile(fn, 'toy', x, k=3.0)
    if files:
        assert cache2.hits == 1
    np.testing.assert_allclose(np.asarray(exe2(x)), 4.0)

    # different static kwarg -> different entry, correct program
    exe3 = cache2.load_or_compile(fn, 'toy', x, k=5.0)
    np.testing.assert_allclose(np.asarray(exe3(x)), 6.0)


def test_aot_cache_disabled_returns_none(tmp_path):
    import jax
    import jax.numpy as jnp
    cache = AotCache(cache_dir=str(tmp_path), enabled=False)
    fn = jax.jit(lambda x: x + 1)
    assert cache.load_or_compile(fn, 'toy', jnp.ones(4)) is None


def test_model_asset_key_tracks_weight_files(tmp_path):
    """Executables bake model weights as closure constants: swapping a
    weight bundle (e.g. a retrained checkpoint) MUST change the cache
    key, or warm sessions would silently run with stale weights."""
    import os
    import shutil
    import time
    from poreplex_tpu.config import build_config
    from poreplex_tpu.utils.aot import model_asset_key

    config = build_config(str(tmp_path), str(tmp_path))
    key1 = model_asset_key(config)

    # point the scaler at a COPY of the bundled weights: same content,
    # different file identity
    src = config['signal_processing']['scaler_model']
    alt = str(tmp_path / 'scaler-retrained.npz')
    shutil.copy(src, alt)
    config['signal_processing']['scaler_model'] = alt
    key2 = model_asset_key(config)
    assert key2 != key1

    # an in-place retrain (same path, new mtime) must also invalidate
    time.sleep(0.01)
    os.utime(alt)
    assert model_asset_key(config) != key2

    # and an edited HMM spec too
    config['segmentation_model'][0]['emission'][0][0] += 0.5
    key3 = model_asset_key(config)
    config['segmentation_model'][0]['emission'][0][0] -= 0.5
    assert key3 != key2


def test_host_cpu_fingerprint_keys_cache_paths(tmp_path, monkeypatch):
    """AOT entry paths must change with the host CPU feature baseline:
    an executable compiled on one machine must never be a cache hit on a
    host with different CPU features (XLA:CPU AOT bakes the compiling
    host's instruction-set selection; loading elsewhere is a SIGILL)."""
    from poreplex_tpu.utils import aot

    fp1 = aot.host_cpu_fingerprint()
    assert fp1 and fp1 == aot.host_cpu_fingerprint()    # stable, cached

    cache = aot.AotCache(cache_dir=str(tmp_path))
    path1 = cache._key_path('prog', 'sig')
    monkeypatch.setattr(aot, '_HOST_CPU_FINGERPRINT', 'feedfacedeadbeef')
    path2 = cache._key_path('prog', 'sig')
    assert path1 != path2
