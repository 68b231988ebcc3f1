"""Small host-side utilities."""

import os
import sys


def errprint(*args, **kwargs):
    kwargs.setdefault('file', sys.stderr)
    print(*args, **kwargs)


def errx(message):
    errprint(message)
    sys.exit(1)


def ensure_dir_exists(filepath):
    """Create the parent directory of a file path when missing
    (role of poreplex/utils.py:50-56)."""
    dirname = os.path.dirname(filepath)
    if dirname and not os.path.isdir(dirname):
        os.makedirs(dirname, exist_ok=True)


def enable_compile_cache():
    """Persist XLA compilations across runs: the per-shape kernel compiles
    (stage-1 wire sizes, poly(A) window buckets, unsplit event buckets)
    cost seconds each on TPU and are pure functions of the preset — pay
    them once per machine, not once per run. No-op when a cache directory
    is already configured (e.g. by the driver entry) or on failure."""
    import jax
    try:
        if jax.config.jax_compilation_cache_dir:
            return
        cache_dir = os.environ.get('POREPLEX_TPU_COMPILE_CACHE') or \
            os.path.join(os.path.expanduser('~'), '.cache', 'poreplex-tpu',
                         'xla-cache')
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
