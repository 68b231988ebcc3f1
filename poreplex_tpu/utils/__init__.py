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
    """Persist XLA compilations across runs ONLY when explicitly requested
    via POREPLEX_TPU_COMPILE_CACHE=<dir>. Default is OFF: on a
    tunnel-attached TPU the persistent cache makes every compile several
    times SLOWER (fresh-shape stage-1 compiles observed at 97-160s with
    the cache vs tens of seconds without; the serialization round-trips
    through the tunnel) and repeat processes were never observed to hit.
    No-op when a cache directory is already configured by the caller."""
    cache_dir = os.environ.get('POREPLEX_TPU_COMPILE_CACHE')
    if not cache_dir or cache_dir.lower() in ('off', '0', 'none'):
        return
    import jax
    try:
        if jax.config.jax_compilation_cache_dir:
            return
        # per-host-CPU subdirectory: XLA:CPU entries bake the compiling
        # host's instruction-set baseline (SIGILL when loaded elsewhere)
        from .aot import host_cpu_fingerprint
        cache_dir = os.path.join(cache_dir, host_cpu_fingerprint())
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def pack_unhandled_exception(f5filename, read_id, exc, exc_tb=None):
    """Per-read unknown_error report dict with the reference's message
    format (poreplex/signal_analyzer.py:136-153). Shared by the in-process
    analyzer and the ingest worker processes."""
    import traceback
    if exc_tb is None:
        exc_tb = sys.exc_info()[2]
    srcfilename = os.path.split(
        exc_tb.tb_frame.f_code.co_filename)[-1] if exc_tb else '?'
    errmsg = ('[{src}:{line}] ({f5}#{rid}) Unhandled exception '
              '{name}: {msg}\n{tb}'.format(
                  src=srcfilename,
                  line=exc_tb.tb_lineno if exc_tb else 0,
                  f5=f5filename, rid=read_id, name=type(exc).__name__,
                  msg=str(exc), tb=traceback.format_exc()))
    return {'filename': f5filename, 'read_id': read_id,
            'status': 'unknown_error', 'error_message': errmsg}
