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
