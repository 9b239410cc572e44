"""sadvio_tpu: a TPU-native visual-inertial odometry / SLAM engine.

Brand-new JAX/XLA/Pallas re-design with the capability set of the SaDVIO
reference (see SURVEY.md): multi-camera point/line front end, IMU
preintegration, sliding-window visual-inertial bundle adjustment with
Schur-complement landmark elimination, marginalization with Chow-Liu/KLD
factor-graph sparsification, and mesh-based densification -- built as batched
fixed-shape kernels over masked arrays, scalable over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

import jax as _jax

# The estimation stack (Lie-group retractions, Schur complements, eigh-based
# marginalization) is numerically meaningless at bf16 matmul precision, which
# is the platform default (TPU MXU semantics).  Force f32 accumulation for
# all matmuls; throughput-bound image kernels opt back into bf16 explicitly
# via precision=/preferred_element_type= at their call sites.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the pipeline's stage kernels cost 10-90 s to
# compile (XLA on 2 weak host CPUs); caching them on disk makes every later
# process (tests, bench, replay runs) start hot.
#
# The cache dir is FINGERPRINTED by the host CPU's feature flags: this repo
# persists across container hosts with different CPU types, and XLA:CPU AOT
# entries compiled for another machine's features abort on deserialization
# (observed: Fatal Python error inside
# compilation_cache.get_executable_and_time, preceded by cpu_aot_loader
# "machine feature mismatch ... SIGILL" warnings). A mismatched host simply
# starts a fresh cache instead of loading poison.
import hashlib as _hashlib
import os as _os

try:
    _flags = next((l for l in open("/proc/cpuinfo") if l.startswith("flags")),
                  "")
except Exception:  # pragma: no cover - non-Linux fallback
    import platform as _platform

    _flags = _platform.platform()
_cpu_tag = _hashlib.sha1(_flags.encode()).hexdigest()[:10]
_cache_dir = _os.environ.get(
    "SADVIO_JAX_CACHE", f"/tmp/sadvio_jax_cache-{_cpu_tag}")
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass
