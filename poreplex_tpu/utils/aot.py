"""Client-side AOT executable cache: warm start as load-not-compile.

First contact with each fused program costs seconds to minutes of XLA
compilation on a tunnel-attached TPU, and the server-side compile cache
can be cold or evicted. ``jax.experimental.serialize_executable`` can
round-trip the COMPILED executable through client-side bytes (measured
on the axon backend: serialize + deserialize_and_load in ~0ms for a
78KB executable, vs seconds per compile RPC) — so warmup serializes
every program to disk once, and later processes load executables
instead of compiling.

NOT the same mechanism as jax's persistent compilation cache
(jax_compilation_cache_dir), which round-trips through the compile
server and measured ~10x SLOWER over the tunnel (see
utils.enable_compile_cache) — this cache never talks to the server on
a hit.

Keys are conservative: jax version, platform, device kind, a source
fingerprint of the installed package (any edited .py invalidates the
whole cache), the program name, and the caller-provided shape/static
signature. Corrupt or stale entries fall back to a fresh compile.
"""

import hashlib
import os
import pickle
import tempfile

_SOURCE_FINGERPRINT = None
_HOST_CPU_FINGERPRINT = None


def host_cpu_fingerprint():
    """Fingerprint of the host CPU's feature baseline. XLA:CPU AOT
    executables bake the compiling host's instruction-set selection; a
    cache entry compiled on one machine and loaded on another without
    those features is a SIGILL at run time (observed as 'machine feature
    mismatch' warnings when a driver host loaded bench-host entries).
    Keying every cache path on the flags line of /proc/cpuinfo (plus the
    architecture) keeps same-host reuse intact and makes cross-host
    reuse impossible rather than risky."""
    global _HOST_CPU_FINGERPRINT
    if _HOST_CPU_FINGERPRINT is None:
        import platform
        material = platform.machine()
        try:
            with open('/proc/cpuinfo') as f:
                for line in f:
                    if line.startswith(('flags', 'Features')):
                        material += '\x00' + ' '.join(
                            sorted(line.split(':', 1)[1].split()))
                        break
        except OSError:
            material += '\x00' + platform.processor()
        _HOST_CPU_FINGERPRINT = hashlib.sha1(
            material.encode()).hexdigest()[:16]
    return _HOST_CPU_FINGERPRINT


def _source_fingerprint():
    """Hash of (relpath, mtime, size) for every module AND bundled asset
    in the package (presets, weight bundles — executables bake model
    weights as closure constants, so a swapped .npz must invalidate) —
    cheap (one stat per file) and safely over-invalidating."""
    global _SOURCE_FINGERPRINT
    if _SOURCE_FINGERPRINT is None:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha1()
        for dirpath, dirs, files in sorted(os.walk(pkg_root)):
            dirs[:] = sorted(d for d in dirs
                             if d not in ('__pycache__', 'native_lib'))
            for fn in sorted(files):
                if fn.endswith(('.pyc', '.pyo', '.so')):
                    continue
                path = os.path.join(dirpath, fn)
                st = os.stat(path)
                h.update('{}\x00{}\x00{}\x01'.format(
                    os.path.relpath(path, pkg_root), st.st_mtime_ns,
                    st.st_size).encode())
        _SOURCE_FINGERPRINT = h.hexdigest()
    return _SOURCE_FINGERPRINT


def model_asset_key(config):
    """Cache-key material for the model assets a session's programs bake
    in as closure constants: weight-bundle files (stat identity — they
    may live OUTSIDE the package, e.g. retrained checkpoints from the
    training workflows) and the preset-defined HMM specifications."""
    import json
    h = hashlib.sha1()
    paths = [config.get('signal_processing', {}).get('scaler_model'),
             config.get('demultiplexing', {}).get('demux_model')]
    for path in paths:
        if path and os.path.exists(path):
            st = os.stat(path)
            h.update('{}\x00{}\x00{}\x01'.format(
                path, st.st_mtime_ns, st.st_size).encode())
    for spec_name in ('segmentation_model', 'unsplit_read_detection_model'):
        h.update(json.dumps(config.get(spec_name), sort_keys=True,
                            default=str).encode())
    return h.hexdigest()


def default_cache_dir():
    env = os.environ.get('POREPLEX_TPU_AOT_CACHE')
    if env:
        return None if env.lower() in ('off', '0', 'none') else env
    base = os.environ.get('XDG_CACHE_HOME') or \
        os.path.join(os.path.expanduser('~'), '.cache')
    if not os.path.isdir(os.path.dirname(base) or '/'):
        base = tempfile.gettempdir()
    return os.path.join(base, 'poreplex-tpu', 'aot')


class AotCache:
    """load_or_compile jitted programs with on-disk executable reuse."""

    # stale-entry budget: executables are ~2-17 MB each and any source
    # edit strands the previous fingerprint's files
    MAX_BYTES = 1 << 29         # 512 MB

    def __init__(self, cache_dir=None, enabled=True):
        self.dir = cache_dir if cache_dir is not None else \
            default_cache_dir()
        self.enabled = enabled and self.dir is not None
        self.hits = 0
        self.misses = 0
        if self.enabled and os.path.isdir(self.dir):
            self._prune()

    def _prune(self):
        """Drop oldest entries beyond the size budget (stale source
        fingerprints accumulate otherwise)."""
        try:
            entries = []
            for fn in os.listdir(self.dir):
                if not fn.endswith('.aotx'):
                    continue
                path = os.path.join(self.dir, fn)
                st = os.stat(path)
                entries.append((st.st_mtime, st.st_size, path))
            entries.sort(reverse=True)
            total = 0
            for _mt, size, path in entries:
                total += size
                if total > self.MAX_BYTES:
                    os.unlink(path)
        except OSError:
            pass

    @classmethod
    def for_platform(cls, platform):
        """Default policy: AOT on TPU (compiles are tunnel-expensive);
        plain jit elsewhere (XLA:CPU compiles are ~1s and tests churn
        shapes)."""
        force = os.environ.get('POREPLEX_TPU_AOT_CACHE')
        return cls(enabled=platform == 'tpu' or bool(force))

    # extra key material appended by the owner (model_asset_key of the
    # session config — covers retrained weight files outside the package)
    extra_key = ''

    def _key_path(self, name, signature):
        import jax
        dev = jax.devices()[0]
        key = hashlib.sha1('\x00'.join([
            jax.__version__, dev.platform,
            getattr(dev, 'device_kind', ''), host_cpu_fingerprint(),
            _source_fingerprint(),
            self.extra_key, name, signature]).encode()).hexdigest()
        return os.path.join(self.dir, '{}-{}.aotx'.format(name, key))

    @staticmethod
    def _signature(args, kwargs):
        return ';'.join(
            ['{}:{}'.format(getattr(a, 'shape', None),
                            getattr(a, 'dtype', type(a).__name__))
             for a in args] +
            ['{}={!r}'.format(k, v) for k, v in sorted(kwargs.items())])

    def load_only(self, name, *args, **kwargs):
        """Deserialize a cached executable when one exists; never
        compiles. Lets un-prewarmed sessions pick up executables that an
        earlier warmup serialized."""
        if not self.enabled:
            return None
        path = self._key_path(name, self._signature(args, kwargs))
        return self._load(path)

    def _load(self, path):
        if not os.path.exists(path):
            return None
        try:
            from jax.experimental import serialize_executable as se
            with open(path, 'rb') as f:
                payload, in_tree, out_tree = pickle.load(f)
            exe = se.deserialize_and_load(payload, in_tree, out_tree)
            self.hits += 1
            return exe
        except Exception:
            try:
                os.unlink(path)
            except OSError:
                pass
            return None

    def load_or_compile(self, jitfn, name, *args, **kwargs):
        """Returns a callable over the ARRAY args (statics baked), or
        None when disabled (callers keep using the plain jit). The cache
        signature covers every arg's shape/dtype plus the static kwargs."""
        if not self.enabled:
            return None
        path = self._key_path(name, self._signature(args, kwargs))
        exe = self._load(path)
        if exe is not None:
            return exe
        compiled = jitfn.lower(*args, **kwargs).compile()
        self.misses += 1
        try:
            from jax.experimental import serialize_executable as se
            blob = pickle.dumps(se.serialize(compiled))
            # validate the round-trip BEFORE persisting: some plugins
            # serialize but cannot deserialize (observed: the axon TPU
            # plugin intercepts deserialization of CPU executables and
            # rejects them), and a cache entry that cannot load is a
            # silent recompile on every future process
            payload, in_tree, out_tree = pickle.loads(blob)
            se.deserialize_and_load(payload, in_tree, out_tree)
            os.makedirs(self.dir, exist_ok=True)
            tmp = '{}.tmp.{}'.format(path, os.getpid())
            with open(tmp, 'wb') as f:
                f.write(blob)
            os.replace(tmp, path)
        except Exception:
            pass
        return compiled
